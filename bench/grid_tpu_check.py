"""On-TPU check of the fused grid kernel: bin-exactness vs the XLA einsum
rasterizer on hardware, plus standalone frame timing.

Run on the tunneled TPU (one process only):
    python -m bench.grid_tpu_check [num_envs]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
from agarcl_tpu.ops.fused_grid import fused_grid_frame
from agarcl_tpu.ops.fused_tick import fused_engine_tick


def run(cfg, ocfg, N, n_check=128, label=""):
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, cfg)))
    s = reset_b(jnp.arange(N, dtype=jnp.uint32))
    # advance a few ticks so pellets are eaten / cells move off spawn
    for _ in range(8):
        s = fused_engine_tick(cfg, s, 128)

    sc = jax.tree.map(lambda x: x[:n_check], s)
    ref = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, ocfg)))(sc)
    got = fused_grid_frame(cfg, ocfg, sc, block_envs=8)
    eq = np.array_equal(np.asarray(got), np.asarray(ref))
    print(f"{label}: match={eq}")

    f = jax.jit(lambda s: fused_grid_frame(cfg, ocfg, s, block_envs=8))
    o = f(s)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(4):
        o = f(s)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 4
    print(f"{label}: {dt * 1e3:.2f} ms/frame ({N / dt:,.0f} frames/s)")
    return eq


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("platform:", jax.default_backend())
    ocfg = GridObsConfig(grid_size=64)
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10, num_bots=0, mode=4)
    run(cfg, ocfg, N, label=f"mode4 G=64 N={N}")
    cfg7 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                     num_pellets=500, num_viruses=10, num_bots=1, mode=7)
    run(cfg7, ocfg, N, label=f"mode7 G=64 N={N}")
