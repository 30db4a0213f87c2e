"""On-TPU check of the multi-player fused tick: compile, exactness vs the
XLA tick on hardware, and ticks/s timing for a mode-7 duel config.

Run on the tunneled TPU (one process only):
    python bench/mp_tick_tpu_check.py [num_envs]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.engine.tick import engine_tick
from agarcl_tpu.ops.fused_tick import fused_engine_tick


def check_mode(cfg, n_ticks=8, N=128, label=""):
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, cfg)))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s = reset_b(jnp.arange(N, dtype=jnp.uint32))
    rng = np.random.default_rng(0)
    sr = so = s
    ok = True
    for t in range(n_ticks):
        tgt = np.array(sr.target)
        act = np.array(sr.action)
        c = np.asarray(sr.player_centroid())[:, 0]
        tgt[:, 0] = c + rng.uniform(-20, 20, c.shape)
        act[:, 0] = rng.integers(0, 3, c.shape[0])
        tgt = jnp.asarray(tgt, jnp.float32)
        act = jnp.asarray(act, jnp.int32)
        sr = tick_b(sr.replace(target=tgt, action=act))
        so = fused_engine_tick(cfg, so.replace(target=tgt, action=act), 128)
        for f in ("cell_mass", "cell_alive", "cell_id", "cells_eaten",
                  "food_eaten", "action", "pellet_alive", "virus_alive"):
            a = np.asarray(getattr(sr, f))
            b = np.asarray(getattr(so, f))
            if not np.array_equal(a, b):
                print(f"  {label} t={t} {f}: {np.sum(a != b)} mismatches")
                ok = False
        for f in ("cell_pos", "target"):
            a = np.asarray(getattr(sr, f))
            b = np.asarray(getattr(so, f))
            d = np.abs(a - b).max()
            if d > 2e-3:
                print(f"  {label} t={t} {f}: maxdiff {d:.5f}")
                ok = False
        if not ok:
            break
    print(f"{label}: match={ok}")
    return ok


def time_tick(cfg, N, label=""):
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, cfg)))
    s = reset_b(jnp.arange(N, dtype=jnp.uint32))

    @jax.jit
    def ticks10(s):
        def body(c, _):
            return fused_engine_tick(cfg, c, 128), None
        s, _ = jax.lax.scan(body, s, None, length=10)
        return s

    s = ticks10(s)
    jax.block_until_ready(s.ticks)
    t0 = time.perf_counter()
    for _ in range(4):
        s = ticks10(s)
    jax.block_until_ready(s.ticks)
    dt = time.perf_counter() - t0
    tps = N * 10 * 4 / dt
    print(f"{label}: {dt / 40 * 1e3:.2f} ms/tick ({tps:,.0f} ticks/s, "
          f"{tps / 4:,.0f} env-steps/s at 4 ticks/step)")


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("platform:", jax.default_backend())
    cfg7 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                     num_pellets=500, num_viruses=10, num_bots=1, mode=7)
    check_mode(cfg7, label="mode7(hungry bot)")
    cfg10 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                      num_pellets=500, num_viruses=10, num_bots=1, mode=10)
    check_mode(cfg10, label="mode10(aggressive-shy bot)")
    time_tick(cfg7, N, label=f"mode7 N={N}")
    cfg1 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                     num_pellets=500, num_viruses=10, num_bots=0, mode=4)
    time_tick(cfg1, N, label=f"mode4 single-player N={N} (regression check)")
