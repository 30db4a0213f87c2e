#!/bin/bash
set -x
cd /root/repo
timeout 1800 python bench.py --obs screen --envs 2048 --poly 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -3
timeout 1200 python bench.py --obs screen --envs 2048 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --mode 0 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
timeout 1200 python bench.py --obs screen --size 128 --envs 1024 2>&1 | grep -v -E "WARNING|cpu_aot" | tail -2
echo SEQ2 DONE
