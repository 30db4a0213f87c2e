"""Bisect the screen kernel's per-frame cost with CHAINED in-jit timing.

Per-call dispatch through the tunnel is unreliable (CLAUDE.md): this chains
CHAIN pallas calls inside ONE program (a scalar carry forces serialization)
so per-iteration numbers carry no dispatch/transpose constants — the same
methodology as bench/tick_ablate.py.

Sweeps the _only ablation knobs (write_block/write/none/full) and the env
block size to attribute the '_only=none' floor: per-grid-step overhead
(BE sweep) vs store DMA (write vs write_block) vs per-env setup compute
(none vs write). Also times the XLA-side table build alone.
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
from agarcl_tpu.ops.fused_screen import (_build_table, _packed_palette,
                                         _rasterize_table)

S = 84
CHAIN = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--mode", type=int, default=1)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="only the e2e layout comparison (fewest compiles)")
    args = ap.parse_args()
    N = args.envs
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10,
                    num_bots=1 if args.mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=args.mode)

    seeds = jnp.arange(N, dtype=jnp.uint32)
    states = jax.jit(jax.vmap(lambda s: env_reset(cfg, s)))(seeds)
    jax.block_until_ready(states.ticks)
    # eager call (one-time, slow through the tunnel) to get the static
    # metadata; the timed build below re-runs it under jit
    tab0, offs, n_other, Ks = _build_table(cfg, S, states)
    jax.block_until_ready(tab0)
    print(f"table: {tab0.shape} ({tab0.nbytes/1e6:.1f} MB)", flush=True)

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
        print(f"{name:32s}: {dt*1e3:8.3f} ms/frame  ({N/dt:,.0f}/s)",
              flush=True)
        return dt

    def chained_raster(be, only, packed=None, ladder=True, sdt=None):
        @jax.jit
        def run(tab):
            c = jnp.float32(0.0)
            for _ in range(CHAIN):
                t = tab.at[0, 0].add(c)
                out = _rasterize_table(cfg, S, t, offs, n_other, Ks,
                                       block_envs=be, interpret=False,
                                       packed_table=packed, _only=only,
                                       _ladder=ladder, _strip_dtype=sdt)
                c = out[0, 0, 0].astype(jnp.float32) * 0.0
            return c
        return run

    def build_chain(ablate):
        @jax.jit
        def run(s):
            c = jnp.float32(0.0)
            for _ in range(CHAIN):
                s2 = s.replace(cell_pos=s.cell_pos + c)
                tab = _build_table(cfg, S, s2, _ablate=ablate)[0]
                c = tab[0, 0] * 0.0
            return c
        return run
    timed("table build (XLA)", build_chain(None), states)
    timed("table build nocompact", build_chain('nocompact'), states)

    # e2e (build + kernel) chained from states, both input layouts
    from agarcl_tpu.ops.fused_screen import _rasterize_sections

    def e2e_chain(layout):
        @jax.jit
        def run(s):
            c = jnp.float32(0.0)
            for _ in range(CHAIN):
                s2 = s.replace(cell_pos=s.cell_pos + c)
                if layout == "table":
                    tab, o2, no2, ks2 = _build_table(cfg, S, s2)
                    out = _rasterize_table(
                        cfg, S, tab, o2, no2, ks2, block_envs=8,
                        interpret=False, packed_table=_packed_palette(True))
                else:
                    secs, o2, no2, ks2 = _build_table(cfg, S, s2,
                                                      _ablate='sections')
                    out = _rasterize_sections(
                        cfg, S, secs, o2, no2, ks2, block_envs=8,
                        interpret=False, packed_table=_packed_palette(True))
                c = out[0, 0, 0].astype(jnp.float32) * 0.0
            return c
        return run
    timed("e2e table layout", e2e_chain("table"), states)
    timed("e2e sections layout", e2e_chain("sections"), states)
    if args.quick:
        return

    bf16 = jnp.bfloat16
    for name, kw in (
            ("floor (write_block)", dict(only="write_block")),
            ("lines only", dict(only="lines")),
            ("strips only", dict(only="strips")),
            ("strips only bf16", dict(only="strips", sdt=bf16)),
            ("circles only", dict(only="circles")),
            ("circles only bf16", dict(only="circles", sdt=bf16)),
            ("circles only no-ladder", dict(only="circles", ladder=False)),
            ("full class map", dict(only=None)),
            ("full bf16", dict(only=None, sdt=bf16)),
            ("full bf16 packed frame",
             dict(only=None, sdt=bf16, packed=_packed_palette(True))),
            ("full packed frame", dict(only=None,
                                       packed=_packed_palette(True))),
    ):
        timed(f"BE=8 {name}", chained_raster(8, **kw), tab0)


if __name__ == "__main__":
    main()
