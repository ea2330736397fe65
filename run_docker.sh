#!/bin/sh
# Twin of /root/reference/run_docker.sh:1 — mount the CWD at /data and
# open the REPL on a spreadsheet inside it.
docker run --rm -v "$(pwd)":/data/ -it excel-to-db-spark:latest \
    -f "/data/${1:-demo.xlsx}" -s "${2:-Sheet1}"
