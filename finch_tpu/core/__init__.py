"""Core sketch containers, filtering, statistics, distance, drivers."""
