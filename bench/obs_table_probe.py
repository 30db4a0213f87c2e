"""Marginal cost of the obs TABLE BUILD inside a real chained step.

The floor probes (screen_floor_probe / grid_floor_probe) time the table
build from env-major states already materialized in HBM — but in the real
step the states come out of the tick kernel in (feature, N) layout and the
build consumes the `_from_kernel_arrays` transposes, which XLA can only
cancel when nothing env-major reads them. This probe chains, inside ONE
jit program (CLAUDE.md measurement rules), 10 iterations of:

  tick        : fused_engine_tick(n_ticks=4) alone
  tick+kernel : tick -> obs kernel on a CONSTANT prebuilt table (carry-
                serialized) — the step minus the live table build
  full        : tick -> table build -> obs kernel (the real step's obs path)

full - (tick+kernel) = the marginal build cost including the transposes
the real step pays. Run for grid (8192 envs) and screen (2048 envs).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.ops.fused_tick import fused_engine_tick

CHAIN = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", default="grid", choices=("grid", "screen"))
    ap.add_argument("--envs", type=int, default=0)
    ap.add_argument("--mode", type=int, default=4)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    N = args.envs or (8192 if args.obs == "grid" else 2048)
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10,
                    num_bots=1 if args.mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=args.mode)

    seeds = jnp.arange(N, dtype=jnp.uint32)
    states = jax.jit(jax.vmap(lambda s: env_reset(cfg, s)))(seeds)
    jax.block_until_ready(states.ticks)

    if args.obs == "grid":
        from agarcl_tpu.obs.grid import GridObsConfig
        from agarcl_tpu.ops.fused_grid import (_build_grid_table,
                                               fused_grid_frame)
        ocfg = GridObsConfig(grid_size=64, out_dtype="int16")
        G = ocfg.grid_size
        secs0, offs, n_other = _build_grid_table(cfg, G, states,
                                                 sections=True)
        secs0 = {k: jax.block_until_ready(v) for k, v in secs0.items()}

        def obs_live(s):
            return fused_grid_frame(cfg, ocfg, s, block_envs=32)

        def obs_const(secs):
            import functools
            from agarcl_tpu.ops.fused_grid import _make_kernel
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            names = tuple(secs.keys())
            arrs = [secs[n] for n in names]
            BE = 32
            ROWS = G * G // 128
            kernel = _make_kernel(cfg, G, BE, n_other, offs, None,
                                  jnp.int16, multi=names, _vmax='block')
            return pl.pallas_call(
                kernel,
                grid=(N // BE,),
                in_specs=[pl.BlockSpec((BE, a.shape[1]), lambda i: (i, 0))
                          for a in arrs],
                out_specs=pl.BlockSpec((BE, 8, ROWS, 128),
                                       lambda i: (i, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((N, 8, ROWS, 128), jnp.int16),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*arrs)
    else:
        from agarcl_tpu.obs.screen import ScreenObsConfig
        from agarcl_tpu.ops.fused_screen import (_build_table,
                                                 _packed_palette,
                                                 _rasterize_sections,
                                                 fused_screen_frame)
        ocfg = ScreenObsConfig(screen_len=84, agent_view=True)
        S = ocfg.screen_len
        secs0, offs, n_other, Ks = _build_table(cfg, S, states,
                                                _ablate='sections')
        secs0 = {k: jax.block_until_ready(v) for k, v in secs0.items()}
        pal = _packed_palette(True)

        def obs_live(s):
            return fused_screen_frame(cfg, ocfg, s, block_envs=8)

        def obs_const(secs):
            return _rasterize_sections(cfg, S, secs, offs, n_other, Ks,
                                       block_envs=8, interpret=False,
                                       packed_table=pal)

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
    def run_tick(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s = s.replace(seed=s.seed + c.astype(jnp.uint32))
            s = fused_engine_tick(cfg, s, 128, False,
                                  n_ticks=cfg.ticks_per_step)
            c = s.ticks[0].astype(jnp.float32) * 0.0
        return c

    @jax.jit
    def run_full(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s = s.replace(seed=s.seed + c.astype(jnp.uint32))
            s = fused_engine_tick(cfg, s, 128, False,
                                  n_ticks=cfg.ticks_per_step)
            out = obs_live(s)
            c = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32) * 0.0
        return c

    @jax.jit
    def run_const(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s = s.replace(seed=s.seed + c.astype(jnp.uint32))
            s = fused_engine_tick(cfg, s, 128, False,
                                  n_ticks=cfg.ticks_per_step)
            ct = s.ticks[0].astype(jnp.float32) * 0.0 + c
            secs = dict(secs0)
            k0 = next(iter(secs))
            secs[k0] = secs[k0].at[0, 0].add(ct)
            out = obs_const(secs)
            c = jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32) * 0.0
        return c

    t_tick = timed("tick only", run_tick, states)
    t_const = timed("tick + const-table kernel", run_const, states)
    t_full = timed("tick + build + kernel", run_full, states)
    print(f"marginal table build (incl. transposes): "
          f"{(t_full - t_const)*1e3:+.3f} ms/step", flush=True)
    print(f"marginal obs kernel: {(t_const - t_tick)*1e3:+.3f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
