# DGDM Histopath TPU — production container
# Multi-stage: builder installs the package; runtime is slim + non-root.
FROM python:3.12-slim AS builder
WORKDIR /build
COPY pyproject.toml README.md ./
COPY dgdm_histopath_tpu ./dgdm_histopath_tpu
COPY configs ./configs
RUN pip install --no-cache-dir --prefix=/install .

FROM python:3.12-slim
LABEL org.opencontainers.image.title="dgdm-histopath-tpu" \
      org.opencontainers.image.description="TPU-native DGDM whole-slide pathology"

# TPU runtime: libtpu is mounted by the node; jax[tpu] wheels installed here
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || true

COPY --from=builder /install /usr/local
COPY configs /app/configs

RUN useradd -m -u 1000 dgdm
USER dgdm
WORKDIR /app

ENV JAX_PLATFORMS=tpu \
    PYTHONUNBUFFERED=1

EXPOSE 8080
HEALTHCHECK --interval=30s --timeout=10s --start-period=120s \
  CMD python -c "from dgdm_histopath_tpu.deployment import ProductionHealthChecker; import sys; sys.exit(0 if ProductionHealthChecker().check()['healthy'] else 1)"

ENTRYPOINT ["dgdm-train"]
CMD ["--help"]
