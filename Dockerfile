# TPU-host image: expects a base with jax[tpu] preinstalled.
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ && \
    rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY oramacore_tpu/ oramacore_tpu/
COPY config.example.yaml /config/config.yaml
RUN pip install --no-cache-dir jax flax optax aiohttp msgpack pyyaml \
    numpy cryptography
EXPOSE 8080
CMD ["python", "-m", "oramacore_tpu.server", "--config", "/config/config.yaml"]
