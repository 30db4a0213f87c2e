#!/bin/bash
# round-4 TPU sequence 1: validate refactored obs kernels on hardware + bench rows
set -x
cd /root/repo
timeout 1200 python bench/screen_grid_tpu_check.py 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -20
timeout 1200 python bench.py --obs screen --envs 2048 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --obs screen --envs 2048 --mode 7 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1800 python bench.py --obs screen --envs 2048 --agents 2 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --obs grid --grid-dtype int16 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --obs grid --steps 5 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --mode 7 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
echo SEQ1 DONE
