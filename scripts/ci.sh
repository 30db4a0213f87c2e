#!/usr/bin/env bash
# Local/CI test entry point: build the C++ parity oracle, then run the full
# pytest suite on the forced 8-device virtual CPU platform. Equivalent in
# spirit to the reference's CTest registration (GameEngine + environment
# tests + `python -m tests`).
set -euo pipefail
cd "$(dirname "$0")/.."

make -C oracle
# -n 2: worker processes keep per-process XLA state small — one process
# running all 119 tests accumulates until a late CPU compile aborts
AGARCL_PLATFORM=cpu python -m pytest tests/ -q -n 2 "$@"
