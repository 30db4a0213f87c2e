"""Bisect the in-kernel multi-step's per-step overhead: time
fused_multi_step_call (k steps in one kernel) with its per-step blocks
individually skipped (timing-only loo knobs):

  loo=0   full
  loo=20  skip the per-step action application
  loo=21  skip the per-step emission (RAM frame + mass/alive info rows)

bench.py-style pipelined timing (block once per group of calls).
Run: python bench/ms_block_probe.py [envs] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agarcl_tpu import EnvConfig
from agarcl_tpu.obs.ram import RamObsConfig
from agarcl_tpu.ops.fused_tick import fused_multi_step_call
from agarcl_tpu.vec import VecEnv


def main():
    envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10, num_bots=0,
                    reward_type=True, mode=4)
    env = VecEnv(cfg, envs, obs_type="none", backend="fused", donate=False)
    states, _ = env.reset(0)
    acts = jnp.zeros((envs, 1, 3), jnp.float32).at[..., :2].set(0.3)
    ocfg = RamObsConfig()

    for loo, name in ((0, "full"), (20, "no-action-block"),
                      (21, "no-emission")):
        def call(s, loo=loo):
            out = fused_multi_step_call(cfg, s, acts, k, ocfg, 128, False,
                                        loo)
            return out[0]

        s = call(states)
        jax.block_until_ready(s.ticks)
        best = []
        for _ in range(4):
            s2 = states
            t0 = time.perf_counter()
            for _ in range(4):
                s2 = call(s2)
            jax.block_until_ready(s2.ticks)
            best.append((time.perf_counter() - t0) / (4 * k))
        t = min(best)
        print(f"loo={loo:2d} {name:16s}: {t*1e3:7.3f} ms/step "
              f"({envs/t:,.0f}/s)", flush=True)


if __name__ == "__main__":
    main()
