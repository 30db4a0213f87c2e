"""On-hardware check + chained timing for tick-emitted obs sections.

Parity: one step through (tick + XLA table build + kernel) vs
(tick(grid_tab/screen_tab) + kernel-from-secs) must produce identical
frames AND identical post-tick states on real hardware (exercises the
Mosaic lowering of the in-kernel (F, E) -> (E, F) section transposes).

Timing: CHAIN steps inside one jit program (CLAUDE.md measurement rules),
old path vs new path.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.ops import fused_grid, fused_screen
from agarcl_tpu.ops.fused_tick import fused_engine_tick

CHAIN = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", default="grid", choices=("grid", "screen"))
    ap.add_argument("--envs", type=int, default=0)
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    N = args.envs or (8192 if args.obs == "grid" else 2048)
    mode = args.mode or (4 if args.obs == "grid" else 1)
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10,
                    num_bots=1 if mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=mode)

    seeds = jnp.arange(N, dtype=jnp.uint32)
    states = jax.jit(jax.vmap(lambda s: env_reset(cfg, s)))(seeds)
    jax.block_until_ready(states.ticks)

    if args.obs == "grid":
        from agarcl_tpu.obs.grid import GridObsConfig
        ocfg = GridObsConfig(grid_size=64, out_dtype="int16")
        tab_kw = dict(grid_tab=True)
        obs_old = lambda s: fused_grid.fused_grid_frame(cfg, ocfg, s,
                                                        block_envs=32)
        obs_new = lambda secs: fused_grid.fused_grid_frame_from_secs(
            cfg, ocfg, secs, block_envs=32)
    else:
        from agarcl_tpu.obs.screen import ScreenObsConfig
        ocfg = ScreenObsConfig(screen_len=84, agent_view=True)
        tab_kw = dict(screen_tab=True)
        obs_old = lambda s: fused_screen.fused_screen_frame(cfg, ocfg, s,
                                                            block_envs=8)
        obs_new = lambda secs: fused_screen.fused_screen_frame_from_secs(
            cfg, ocfg, secs, block_envs=8)

    # ---- hardware parity: one step both ways -------------------------
    s_old = fused_engine_tick(cfg, states, 128, False,
                              n_ticks=cfg.ticks_per_step)
    f_old = obs_old(s_old)
    s_new, secs = fused_engine_tick(cfg, states, 128, False,
                                    n_ticks=cfg.ticks_per_step, **tab_kw)
    f_new = obs_new(secs)
    for name in vars(s_old):
        a = np.asarray(getattr(s_old, name))
        b = np.asarray(getattr(s_new, name))
        assert np.array_equal(a, b), f"state field {name} diverged"
    fa, fb = np.asarray(f_old), np.asarray(f_new)
    match = np.array_equal(fa, fb)
    print(f"parity ({args.obs}, mode {mode}, {N} envs): "
          f"states exact, frames {'EXACT' if match else 'MISMATCH'}",
          flush=True)
    if not match:
        bad = np.argwhere(fa != fb)
        print(f"  {len(bad)} mismatched px, first {bad[0]}: "
              f"{fa[tuple(bad[0])]} vs {fb[tuple(bad[0])]}", flush=True)
        raise SystemExit(1)

    # ---- chained timing ----------------------------------------------
    def timed(name, run, arg):
        out = run(arg)
        jax.block_until_ready(out)
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = run(arg)
            jax.block_until_ready(out)
            best.append((time.perf_counter() - t0) / (args.calls * CHAIN))
        dt = statistics.median(best)
        print(f"{name:28s}: {dt*1e3:8.3f} ms/step  ({N/dt:,.0f}/s)",
              flush=True)
        return dt

    @jax.jit
    def run_old(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s = s.replace(seed=s.seed + c.astype(jnp.uint32))
            s = fused_engine_tick(cfg, s, 128, False,
                                  n_ticks=cfg.ticks_per_step)
            out = obs_old(s)
            c = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32) * 0.0
        return c

    @jax.jit
    def run_new(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s = s.replace(seed=s.seed + c.astype(jnp.uint32))
            s, secs = fused_engine_tick(cfg, s, 128, False,
                                        n_ticks=cfg.ticks_per_step, **tab_kw)
            out = obs_new(secs)
            c = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32) * 0.0
        return c

    t_old = timed("old (tick+build+kernel)", run_old, states)
    t_new = timed("new (tab-emit tick+kernel)", run_new, states)
    print(f"saved: {(t_old - t_new)*1e3:+.3f} ms/step "
          f"({(t_old/t_new - 1)*100:+.1f}% throughput)", flush=True)


if __name__ == "__main__":
    main()
