# Engine image — reference-parity packaging (the reference ships a
# two-stage Airflow image; here the engine is pure Python on a JVM, so
# one build stage resolves wheels and the runtime stage carries only
# the JRE + site-packages + the package itself).
FROM python:3.11-slim AS build

COPY requirements.txt .
RUN pip install --no-cache-dir --prefix=/install -r requirements.txt

FROM python:3.11-slim

# Spark driver needs a JVM; headless JRE keeps the image small. The
# package's install dir is arch-suffixed (…-amd64 / …-arm64), so pin a
# stable symlink for JAVA_HOME instead of hardcoding one architecture.
RUN apt-get update -y \
    && apt-get install --no-install-recommends -y openjdk-17-jre-headless \
    && ln -s /usr/lib/jvm/java-17-openjdk-* /usr/lib/jvm/engine-java \
    && rm -rf /var/lib/apt/lists/*

COPY --from=build /install /usr/local
COPY airflow_spark /opt/engine/airflow_spark
COPY scripts/healthcheck.sh /opt/engine/healthcheck.sh
COPY scripts/lint.sh scripts/lint_fallback.py /opt/engine/scripts/

ENV JAVA_HOME=/usr/lib/jvm/engine-java \
    PYTHONPATH=/opt/engine \
    SPARK_GRAFT_API_HOST=0.0.0.0 \
    SPARK_GRAFT_API_PORT=8080 \
    SPARK_GRAFT_STATE_DIR=/opt/engine/state \
    SPARK_GRAFT_DRIVER_MEM=4g

WORKDIR /opt/engine
RUN useradd --create-home engine && mkdir -p /opt/engine/state \
    && chown -R engine /opt/engine
USER engine

HEALTHCHECK --interval=30s --timeout=15s --start-period=60s --retries=3 \
    CMD ["/bin/sh", "/opt/engine/healthcheck.sh"]

EXPOSE 8080
CMD ["python3", "-m", "airflow_spark.serve"]
