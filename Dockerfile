# Container recipe mirroring /root/reference/Dockerfile:1 (alpine +
# static binary + ENTRYPOINT). Spark needs a JVM, so the base is a JRE
# image with Python instead of alpine; the entrypoint contract is the
# same: `docker run ... -f /data/demo.xlsx -s Sheet1` drops into the
# [SQL] >> REPL (see run_docker.sh).
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY excel_to_db_spark ./excel_to_db_spark
RUN pip3 install --no-cache-dir .

# local[*] inside the container; on a cluster, submit the installed
# package with spark-submit instead (see run.sh).
ENTRYPOINT ["excel-to-db-spark"]
