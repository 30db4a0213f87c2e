#!/usr/bin/env bash
# Local/CI test entry point: build the C++ parity oracle, then run the full
# pytest suite on the forced 8-device virtual CPU platform. Equivalent in
# spirit to the reference's CTest registration (GameEngine + environment
# tests + `python -m tests`).
set -euo pipefail
cd "$(dirname "$0")/.."

make -C oracle
AGARCL_PLATFORM=cpu python -m pytest tests/ -q "$@"
