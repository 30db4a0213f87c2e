"""Isolated hardware probe of the pellet eat-test's kernel floor.

The tick ablation attributes ~0.48 ms/tick (8192 envs) to the pellet phase
— ~6 elementwise VPU ops over a (512, E) f32 pair per env block plus a
count reduction, which naive op-counting says should cost far less. This
probe times JUST that computation as a standalone Pallas kernel (chained
inside one program per CLAUDE.md measurement rules) under several codegen
variants, to find whether the cost is op-dispatch, VMEM streaming, the
reduction, or the surrounding cond/carry structure.

Variants:
  base     6-op elementwise test + sublane sum reduction (the tick's shape)
  nosum    elementwise test only (no count reduction)
  nopark   test + sum, no park-update writes
  dotsum   test + MXU (1, Np) @ (Np, E) count reduction
  chunked  the round-2 shape: 4 x (128, E) chunks
  f8       the test on (64, E) rows only (1/8 of the data): linearity check

Usage: python bench/pellet_probe.py [--envs 8192] [--block 128]
"""

import argparse
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP_ = 512
CHAIN = 10


def make_fn(variant: str, E: int, N: int, n_ticks: int = 4):
    def kernel(px_ref, py_ref, sx_ref, sy_ref, o_px, o_py, o_eat,
               *refs_scratch):
        pxw = px_ref[...]                      # (NP_, E)
        pyw = py_ref[...]
        sx = sx_ref[...]                       # (1, E)
        sy = sy_ref[...]
        eat = jnp.zeros((1, E), jnp.float32)
        if variant.endswith("_live"):
            # two extra (NP_, E) arrays held LIVE across all ticks and
            # branches (mutated per tick so they can't fold): probes
            # whether the untaken-branch tax scales with live SSA state
            lx = pxw * 0.5
            ly = pyw * 0.5
        for _t in range(n_ticks):
            sr2 = sx * sx + sy * sy + jnp.float32(_t)   # fake, (1, E)
            if variant.endswith("_live"):
                lx = lx + jnp.float32(1.0)
                ly = ly + jnp.float32(1.0)
            if variant.split("_live")[0] in ("cond_fat", "cond_thin",
                                             "cond_fat_exec", "when_fat",
                                             "cond_fat_loop",
                                             "cond_fat_loop_exec",
                                             "cond_fat_once",
                                             "cond_fat_once_exec"):
                # mirrors the tick's cond(multi_blk, full, single): the
                # single branch always runs; the untaken full branch is
                # either the real (16, Np, E) pairwise pass (fat) or a
                # zeros stub (thin). Isolates carry-copy vs big-branch
                # presence effects.
                PC = 16
                # true at runtime (single taken) except cond_fat_exec
                pred = jnp.max(sx) < jnp.float32(1e8)
                if variant.endswith("_exec"):
                    pred = jnp.max(sx) > jnp.float32(1e8)

                def single():
                    pdx = sx - pxw
                    pdy = sy - pyw
                    g = jnp.where(pdx * pdx + pdy * pdy <= sr2, 1.0, 0.0)
                    e = jnp.sum(g, axis=0, keepdims=True)
                    return jnp.broadcast_to(e, (PC, E)) * 0.0 + e, g

                def full():
                    if variant == "cond_thin":
                        return (jnp.zeros((PC, E), jnp.float32),
                                jnp.zeros((NP_, E), jnp.float32))
                    cx = sx + jax.lax.broadcasted_iota(
                        jnp.int32, (PC, 1), 0).astype(jnp.float32)
                    if variant.startswith("cond_fat_loop"):
                        # same work, but rolled into an scf.for body: probes
                        # whether the untaken-branch tax follows STATIC
                        # instruction count (loop body stays small) rather
                        # than executed work
                        def body(k, carry):
                            # Mosaic has no dynamic_slice on VALUES; chunk
                            # loads go through the ref with a dynamic ds,
                            # and the gone rows land via a static one-hot
                            # row mask (timing-structure probe; the parked
                            # updates are not reflected, which only changes
                            # values, not work)
                            e, g = carry
                            cpx = px_ref[pl.ds(k * 128, 128), :]
                            cpy = py_ref[pl.ds(k * 128, 128), :]
                            pdx = cx[:, None, :] - cpx[None, :, :]
                            pdy = sy[:, None, :] - cpy[None, :, :]
                            el = jnp.where(
                                pdx * pdx + pdy * pdy <= sr2[:, None, :],
                                1.0, 0.0)          # (PC, 128, E)
                            e = e + jnp.sum(el, axis=1)
                            gm = jnp.max(el, axis=0)          # (128, E)
                            riota = jax.lax.broadcasted_iota(
                                jnp.int32, (NP_, 1), 0)
                            inrow = ((riota >= k * 128)
                                     & (riota < (k + 1) * 128))
                            gfull = jnp.concatenate(
                                [gm] * (NP_ // 128), axis=0)
                            g = jnp.where(inrow, gfull, g)
                            return e, g
                        e0 = jnp.zeros((PC, E), jnp.float32)
                        g0 = jnp.zeros((NP_, E), jnp.float32)
                        return jax.lax.fori_loop(0, NP_ // 128, body,
                                                 (e0, g0))
                    def whole(_k, _carry):
                        pdx = cx[:, None, :] - pxw[None, :, :]  # (PC,NP_,E)
                        pdy = sy[:, None, :] - pyw[None, :, :]
                        el = jnp.where(
                            pdx * pdx + pdy * pdy <= sr2[:, None, :],
                            1.0, 0.0)
                        return (jnp.sum(el, axis=1), jnp.max(el, axis=0))
                    if variant.startswith("cond_fat_once"):
                        # length-1 scf.for around the identical unrolled
                        # body: if the untaken tax is about code OUTSIDE
                        # loops, this wrapper alone cloaks it
                        return jax.lax.fori_loop(
                            0, 1, whole,
                            (jnp.zeros((PC, E), jnp.float32),
                             jnp.zeros((NP_, E), jnp.float32)))
                    return whole(0, None)

                if variant == "cond_thin_live":
                    eatpc, gone = jax.lax.cond(
                        pred, single,
                        lambda: (jnp.zeros((PC, E), jnp.float32),
                                 jnp.zeros((NP_, E), jnp.float32)))
                elif variant == "when_fat":
                    # pl.when + VMEM scratch instead of lax.cond results:
                    # does Mosaic actually skip the untaken fat region?
                    s_eat, s_gone = refs_scratch

                    @pl.when(pred)
                    def _single():
                        e, g = single()
                        s_eat[...] = e
                        s_gone[...] = g

                    @pl.when(jnp.logical_not(pred))
                    def _full():
                        e, g = full()
                        s_eat[...] = e
                        s_gone[...] = g

                    eatpc = s_eat[...]
                    gone = s_gone[...]
                else:
                    eatpc, gone = jax.lax.cond(pred, single, full)
                eat = eat + eatpc[0:1]
            elif variant == "chunked":
                gones = []
                for k in range(NP_ // 128):
                    cpx = jax.lax.slice_in_dim(pxw, k * 128, (k + 1) * 128,
                                               axis=0)
                    cpy = jax.lax.slice_in_dim(pyw, k * 128, (k + 1) * 128,
                                               axis=0)
                    pdx = sx - cpx
                    pdy = sy - cpy
                    g = jnp.where(pdx * pdx + pdy * pdy <= sr2, 1.0, 0.0)
                    eat = eat + jnp.sum(g, axis=0, keepdims=True)
                    gones.append(g)
                gone = jnp.concatenate(gones, axis=0)
            else:
                rows = 64 if variant == "f8" else NP_
                pxv = (jax.lax.slice_in_dim(pxw, 0, rows, axis=0)
                       if rows != NP_ else pxw)
                pyv = (jax.lax.slice_in_dim(pyw, 0, rows, axis=0)
                       if rows != NP_ else pyw)
                pdx = sx - pxv
                pdy = sy - pyv
                gone = jnp.where(pdx * pdx + pdy * pdy <= sr2, 1.0, 0.0)
                if variant == "dotsum":
                    ones = jnp.ones((8, rows), jnp.float32)
                    s = jax.lax.dot_general(
                        ones, gone, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (8, E)
                    eat = eat + s[0:1]
                elif variant != "nosum":
                    eat = eat + jnp.sum(gone, axis=0, keepdims=True)
            if variant != "nopark" and variant != "f8":
                pxw = jnp.where(gone != 0.0, np.float32(1e9), pxw)
                pyw = jnp.where(gone != 0.0, np.float32(1e9), pyw)
            else:
                pxw = pxw + jnp.float32(1.0)
                pyw = pyw + jnp.float32(1.0)
        if variant.endswith("_live"):
            o_px[...] = pxw + lx * jnp.float32(1e-20)
            o_py[...] = pyw + ly * jnp.float32(1e-20)
        else:
            o_px[...] = pxw
            o_py[...] = pyw
        o_eat[...] = eat

    @jax.jit
    def run(px, py, sx, sy):
        for _ in range(CHAIN):
            px, py, sx = step(px, py, sx, sy)
        return px, py, sx

    @functools.partial(jax.jit)
    def step(px, py, sx, sy):
        blk = lambda r: pl.BlockSpec((r, E), lambda i: (0, i))
        outs = pl.pallas_call(
            kernel,
            grid=(N // E,),
            in_specs=[blk(NP_), blk(NP_), blk(1), blk(1)],
            out_specs=[blk(NP_), blk(NP_), blk(1)],
            out_shape=[jax.ShapeDtypeStruct((NP_, N), jnp.float32),
                       jax.ShapeDtypeStruct((NP_, N), jnp.float32),
                       jax.ShapeDtypeStruct((1, N), jnp.float32)],
            input_output_aliases={0: 0, 1: 1},
            scratch_shapes=([pltpu.VMEM((16, E), jnp.float32),
                             pltpu.VMEM((NP_, E), jnp.float32)]
                            if variant == "when_fat" else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(px, py, sx, sy)
        px, py, eat = outs
        return px, py, eat  # eat feeds next sx: serializes the chain

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--calls", type=int, default=4)
    args = ap.parse_args()
    N, E = args.envs, args.block

    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (NP_, N), jnp.float32, 1.0, 349.0)
    py = jax.random.uniform(key, (NP_, N), jnp.float32, 1.0, 349.0)
    sx = jnp.full((1, N), 175.0, jnp.float32)
    sy = jnp.full((1, N), 175.0, jnp.float32)

    # tick sweep isolates true compute: per-call DMA (the strided (512, N)
    # state round trip, ~0.8 ms at 8192 envs) cancels in the hi-lo marginal
    for variant, n_ticks in (("cond_fat_once", 4), ("cond_fat_once", 16),
                             ("cond_fat_once_exec", 16)):
        run = make_fn(variant, E, N, n_ticks)
        out = run(px, py, sx, sy)
        jax.block_until_ready(out[0])
        # sanity: the kernel really ran (parks move px; eat counts land)
        touched = float(jnp.sum(jnp.where(out[0] != px, 1, 0)))
        eatsum = float(jnp.sum(out[2]))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            o = None
            for _ in range(args.calls):
                o = run(px, py, sx, sy)
            jax.block_until_ready(o[0])
            ts.append((time.perf_counter() - t0) / (args.calls * CHAIN))
        t = statistics.median(ts)
        print(f"{variant:8s} ticks={n_ticks:2d}  {t*1e3:7.3f} ms/call  "
              f"({t*1e3/n_ticks:6.3f} ms/tick)  "
              f"touched={touched:.0f} eat={eatsum:.0f}", flush=True)


if __name__ == "__main__":
    main()
