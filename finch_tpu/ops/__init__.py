"""Device ops: vectorized murmur3, batched bottom-k, set intersection."""
