# Container build for the TPU-native DVB-T2 receiver.
#
# The reference ships per-distro Dockerfiles that build its Qt GUI
# (docker_builds/*); this image builds the installable wheel (native C++
# runtime included) and exposes the CLI.  On a TPU VM swap the jax extra:
#   docker build --build-arg JAX_EXTRA=tpu -t dvbt2-rx .
FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /src
COPY pyproject.toml setup.py ./
COPY native/ native/
COPY sdr_receiver_dvb_t2_tpu/ sdr_receiver_dvb_t2_tpu/
RUN pip install --no-cache-dir build && python -m build --wheel

FROM python:3.12-slim
ARG JAX_EXTRA=cpu
COPY --from=build /src/dist/*.whl /tmp/
RUN pip install --no-cache-dir "jax[${JAX_EXTRA}]" numpy /tmp/*.whl \
    && rm /tmp/*.whl
# TS out defaults to udp://127.0.0.1:7654; publish or override --out
ENTRYPOINT ["dvbt2-rx"]
CMD ["--help"]
