"""Does the fused tick kernel's per-tick cost stay constant as the
program grows? The in-kernel multi-step (k=10 -> 40 unrolled ticks)
measures ~1.9 ms/step while slope/intercept from n_ticks {1,4} predicts
~1.0 — this probe times fused_engine_tick at n_ticks {4, 8, 16} (chained
programs, trusted methodology) to see whether the slope itself grows
with program size (pipelining/VMEM degradation) or the gap lives in the
multi-step kernel's per-step blocks.

Run FOREGROUND: python bench/ntick_scale_probe.py [envs] [nt1 nt2 ...]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from agarcl_tpu import EnvConfig
from agarcl_tpu.ops.fused_tick import fused_engine_tick
from agarcl_tpu.vec import VecEnv


def main():
    envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    nts = [int(x) for x in sys.argv[2:]] or [4, 8, 16]
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10, num_bots=0,
                    reward_type=True, mode=4)
    env = VecEnv(cfg, envs, obs_type="none", backend="fused", donate=False)
    states, _ = env.reset(0)
    jax.block_until_ready(states.ticks)
    CHAIN, CALLS, REPS = 6, 3, 5

    for nt in nts:
        def run_once(s, nt=nt):
            return fused_engine_tick(cfg, s, 128, False, 99, nt, 99, None)

        @jax.jit
        def chain(s):
            for _ in range(CHAIN):
                s = run_once(s)
            return s

        s = chain(states)
        jax.block_until_ready(s.ticks)
        best = []
        for _ in range(REPS):
            s = states
            t0 = time.perf_counter()
            for _ in range(CALLS):
                s = chain(s)
            jax.block_until_ready(s.ticks)
            best.append((time.perf_counter() - t0) / (CALLS * CHAIN))
        t = statistics.median(best)
        print(f"n_ticks={nt:3d}: {t*1e3:8.3f} ms/call "
              f"({t*1e3/nt:6.3f} ms/tick)", flush=True)


if __name__ == "__main__":
    main()
