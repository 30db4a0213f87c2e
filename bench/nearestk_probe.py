"""Formulation probe for the ram-obs nearest-k extraction (the largest
non-tick block of the fused step): variants of the per-pick loop over a
(512, E) packed-key plane, timed as chained programs on hardware.

Variants (per pick):
  v0_current   cur=min(key); eq=(key==cur); sel=sum(where(eq,pkey,0));
               key=where(eq,DEAD,key)               (~4 passes/pick)
  v1_arith     sel via pkey*eq-int-mul-sum; invalidation via key+eq*BIG
               (add instead of select — may fuse differently)
  v2_minnext   compute the NEXT pick's min in the same expression as the
               invalidation (select feeding reduce, Mosaic can fuse the
               traversals)
  v3_i16find   first locate cur on an int16 high-half plane (half the
               vregs), resolve eq on the int32 plane only once

Each variant returns the (k, E) sel rows + (k, E) alive rows so nothing
dead-codes. Run: python bench/nearestk_probe.py [envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = 0x7FFFFFFF
M = 512
K = 32


def v0_current(key, pkey):
    rows = []
    for _ in range(K):
        cur = jnp.min(key, axis=0, keepdims=True)
        eq = key == cur
        alivef = jnp.where(cur < DEAD, 1.0, 0.0)
        sel = jnp.sum(jnp.where(eq, pkey, 0), axis=0, keepdims=True)
        rows += [sel.astype(jnp.float32) * alivef, alivef]
        key = jnp.where(eq, DEAD, key)
    return rows


def v1_arith(key, pkey):
    rows = []
    for _ in range(K):
        cur = jnp.min(key, axis=0, keepdims=True)
        eq = (key == cur).astype(jnp.int32)
        alivef = jnp.where(cur < DEAD, 1.0, 0.0)
        sel = jnp.sum(pkey * eq, axis=0, keepdims=True)
        rows += [sel.astype(jnp.float32) * alivef, alivef]
        key = key + eq * jnp.int32(1 << 30)   # pushes winner past DEAD
    return rows


def v2_minnext(key, pkey):
    rows = []
    cur = jnp.min(key, axis=0, keepdims=True)
    for _ in range(K):
        eq = key == cur
        alivef = jnp.where(cur < DEAD, 1.0, 0.0)
        sel = jnp.sum(jnp.where(eq, pkey, 0), axis=0, keepdims=True)
        rows += [sel.astype(jnp.float32) * alivef, alivef]
        key = jnp.where(eq, DEAD, key)
        cur = jnp.min(key, axis=0, keepdims=True)   # fuses with the select
    return rows


def v3_i16find(key, pkey):
    rows = []
    for _ in range(K):
        hi = (key >> 16).astype(jnp.int16)           # half-width plane
        curhi = jnp.min(hi, axis=0, keepdims=True)
        cand = hi == curhi                            # narrows to ties
        curf = jnp.min(jnp.where(cand, key, DEAD), axis=0, keepdims=True)
        eq = key == curf
        alivef = jnp.where(curf < DEAD, 1.0, 0.0)
        sel = jnp.sum(jnp.where(eq, pkey, 0), axis=0, keepdims=True)
        rows += [sel.astype(jnp.float32) * alivef, alivef]
        key = jnp.where(eq, DEAD, key)
    return rows


def make_call(variant, E_blk, N):
    def kernel(key_ref, pkey_ref, o_ref):
        rows = variant(key_ref[...], pkey_ref[...])
        o_ref[...] = jnp.concatenate(rows, axis=0)

    @jax.jit
    def run(key, pkey):
        out = pl.pallas_call(
            kernel,
            grid=(N // E_blk,),
            in_specs=[pl.BlockSpec((M, E_blk), lambda i: (0, i))] * 2,
            out_specs=pl.BlockSpec((2 * K, E_blk), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((2 * K, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(key, pkey)
        return out

    @jax.jit
    def chained(key, pkey):
        acc = jnp.zeros((2 * K, N), jnp.float32)
        for i in range(10):
            # serialize: fold the previous output into the key so calls
            # can't overlap or dead-code
            k2 = key ^ jnp.broadcast_to(
                acc[:1].astype(jnp.int32) & 1, key.shape)
            acc = acc + run(k2, pkey)
        return acc

    return run, chained


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    rng = np.random.default_rng(0)
    key = jnp.asarray(
        rng.integers(0, 2**30, (M, N), dtype=np.int32))
    pkey = jnp.asarray(rng.integers(0, 2**30, (M, N), dtype=np.int32))

    ref = None
    for name in ("v0_current", "v1_arith", "v2_minnext", "v3_i16find"):
        variant = globals()[name]
        run, chained = make_call(variant, 128, N)
        out = run(key, pkey)
        jax.block_until_ready(out)
        if ref is None:
            ref = np.asarray(out)
        else:
            np.testing.assert_allclose(np.asarray(out), ref, rtol=0,
                                       atol=0, err_msg=name)
        o = chained(key, pkey)
        jax.block_until_ready(o)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = chained(key, pkey)
            jax.block_until_ready(o)
            best.append((time.perf_counter() - t0) / 10)
        t = min(best)
        print(f"{name}: {t*1e3:7.3f} ms/frame ({N} envs)", flush=True)


if __name__ == "__main__":
    main()
