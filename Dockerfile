# Container build, parity with the reference's Dockerfile
# (/root/reference/Dockerfile:1-30, a musl static build of the CLI): here a
# slim image with the native layer prebuilt and the CLI as entrypoint.
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ zlib1g-dev && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY pyproject.toml README.md ./
COPY finch_tpu ./finch_tpu
RUN pip install --no-cache-dir jax numpy && \
    pip install --no-cache-dir -e . && \
    python -c "import finch_tpu.native"  # prebuild the C++ layer
ENTRYPOINT ["python", "-m", "finch_tpu.cli"]
