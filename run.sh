#!/bin/bash
# Twin of /root/reference/run.sh:1 (`RUST_LOG=info cargo run -- -f
# demo.xlsx -s Sheet1`): run the REPL from a source checkout without
# installing. Extra args pass through (e.g. --sqlite-compat).
exec python3 -m excel_to_db_spark -f "${1:-demo.xlsx}" -s "${2:-Sheet1}" "${@:3}"
