#!/usr/bin/env bash
# Local/CI test entry point: build the C++ parity oracle, then run the full
# pytest suite on the forced 8-device virtual CPU platform. Equivalent in
# spirit to the reference's CTest registration (GameEngine + environment
# tests + `python -m tests`).
set -euo pipefail
cd "$(dirname "$0")/.."

make -C oracle
# -n 3: worker processes keep per-process XLA state small — one process
# running all the tests accumulates until a late CPU compile aborts, and
# at -n 2 the per-worker share (~73 tests) still crossed the abort
# threshold intermittently (round 5: three crashed runs at -n 2, three
# consecutive green at -n 3).
# --max-worker-restart=0: a worker crash FAILS the run (it eats the test
# that crashed it; silently restarting hid a flake in round 4).
# -u PALLAS_AXON_POOL_IPS: never load the axon TPU plugin in the CPU
# suite (hygiene: the plugin has aborted with its tunnel dead; the
# round-5 worker crashes themselves reproduced with and without it at
# -n 2 and vanished at -n 3, so the accumulation threshold is the cause).
env -u PALLAS_AXON_POOL_IPS AGARCL_PLATFORM=cpu python -m pytest tests/ \
    -q -n 3 -p no:cacheprovider --max-worker-restart=0 "$@"
