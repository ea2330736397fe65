"""``python -m excel_to_db_spark -f demo.xlsx [-s Sheet1]`` — the CLI
entry point, mirroring the reference's clap CLI (src/main.rs:25-34)."""

import sys

from .repl import main

sys.exit(main())
