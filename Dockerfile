# Container recipe for dirt_tpu (the reference's Dockerfile equivalent,
# Dockerfile:1-47 -- but no CUDA/GL stack is needed: the compute path is
# JAX/XLA/Pallas, so the image is just Python + jax with the TPU runtime).
#
# CPU-only image (runs the full hermetic test suite):
#   docker build -t dirt-tpu .
# On a TPU VM, swap the jax install for: pip install 'jax[tpu]'

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/dirt-tpu
COPY pyproject.toml README.md ./
COPY dirt_tpu ./dirt_tpu
COPY native ./native
COPY tests ./tests
COPY samples ./samples

RUN pip install --no-cache-dir jax pytest && pip install --no-cache-dir -e .

# Smoke test: the pixel-exact square test (the reference's only automated
# check, tests/square_test.py) plus the native-oracle parity suite.
RUN python -m pytest tests/test_square.py tests/test_native_oracle.py -q

CMD ["python", "-m", "pytest", "tests/", "-q"]
