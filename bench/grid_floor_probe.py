"""Chained-program ablation of the fused grid kernel (64x64, 8192 envs):
e2e (build+kernel) per dtype, channel-group marginals, tick chain — the
screen_floor_probe methodology (per-call timing is dispatch-polluted)."""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.ops.fused_grid import fused_grid_channels
from agarcl_tpu.ops.fused_tick import fused_engine_tick

CHAIN = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--mode", type=int, default=4)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="only the block-variant + BE32 lines")
    args = ap.parse_args()
    N, G = args.envs, args.size
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10,
                    num_bots=1 if args.mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=args.mode)

    seeds = jnp.arange(N, dtype=jnp.uint32)
    states = jax.jit(jax.vmap(lambda s: env_reset(cfg, s)))(seeds)
    jax.block_until_ready(states.ticks)
    print("reset done", flush=True)

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
        print(f"{name:28s}: {dt*1e3:8.3f} ms/frame  ({N/dt:,.0f}/s)",
              flush=True)
        return dt

    def grid_chain(only, dtype, layout="table", vmax="cond", be=8):
        @jax.jit
        def run(s):
            c = jnp.float32(0.0)
            for _ in range(CHAIN):
                s2 = s.replace(cell_pos=s.cell_pos + c)
                out = fused_grid_channels(cfg, G, s2, be, False, only, dtype,
                                          layout, vmax)
                c = out[0, 0, 0, 0].astype(jnp.float32) * 0.0
            return c
        return run

    @jax.jit
    def tick_chain(s):
        for _ in range(CHAIN):
            s = fused_engine_tick(cfg, s, 128, False)
        return s

    from agarcl_tpu.ops.fused_grid import _build_grid_table

    @jax.jit
    def build_chain(s):
        c = jnp.float32(0.0)
        for _ in range(CHAIN):
            s2 = s.replace(cell_pos=s.cell_pos + c)
            tab = _build_grid_table(cfg, G, s2)[0]
            c = tab[0, 0] * 0.0
        return c

    if args.quick:
        timed("full int16 sections block",
              grid_chain(None, "int16", "sections", "block"), states)
        timed("virus/sections block",
              grid_chain("virus", "int16", "sections", "block"), states)
        timed("full int32 sections block",
              grid_chain(None, "int32", "sections", "block"), states)
        timed("none/sections BE32",
              grid_chain("none", "int16", "sections", be=32), states)
        timed("full int16 sections block BE32",
              grid_chain(None, "int16", "sections", "block", 32), states)
        return

    timed("tick x1 (chained)", tick_chain, states)
    timed("table build (XLA)", build_chain, states)
    timed("none/table", grid_chain("none", "int16"), states)
    timed("none/sections", grid_chain("none", "int16", "sections"), states)
    timed("virus/table cond", grid_chain("virus", "int16"), states)
    timed("virus/sections cond",
          grid_chain("virus", "int16", "sections"), states)
    timed("virus/sections nocond",
          grid_chain("virus", "int16", "sections", "nocond"), states)
    timed("virus/sections fast",
          grid_chain("virus", "int16", "sections", "fast"), states)
    timed("full int16 table", grid_chain(None, "int16"), states)
    timed("full int16 sections",
          grid_chain(None, "int16", "sections"), states)
    timed("full int16 sections nocond",
          grid_chain(None, "int16", "sections", "nocond"), states)
    timed("full int16 sections block",
          grid_chain(None, "int16", "sections", "block"), states)
    timed("virus/sections block",
          grid_chain("virus", "int16", "sections", "block"), states)
    timed("full int32 sections",
          grid_chain(None, "int32", "sections"), states)
    timed("full int32 sections block",
          grid_chain(None, "int32", "sections", "block"), states)


if __name__ == "__main__":
    main()
