"""RAM observation as a single Pallas kernel (env-in-lanes layout).

The XLA `obs.ram.ram_frame` path is layout-hostile on TPU: vmapping per-env
frames materializes (N, Np, 2) relative-position tensors whose trailing
size-2 axes pad to 128 lanes, and `lax.top_k` + gathers over the pellet
table dominate the step (measured ~10.8 ms at 8192 envs — more than the
four engine ticks combined). This kernel computes the identical feature
vector with the env axis in lanes: every tensor is (feature, E), the
k-nearest-pellet selection is an iterative min-extraction over the packed
int32 key of obs/ram.py::pack_nearest_key (distance bits with the index in
the low bits — unique keys, so one min-reduce + one compare per neighbor
yields the same stable order `top_k(-key)` produces), and the whole frame
is built in VMEM per 128-env block.

Feature layout matches obs/ram.py `ram_frame` exactly for any roster the
fused tick supports (multi-player included; one frame per agent):

  [ cx/W, cy/H, total_mass,
    per cell slot: rel_x, rel_y, mass, vel_x, vel_y, alive,
    Kp nearest pellets: rel_x, rel_y, alive,
    Kv nearest viruses: rel_x, rel_y, mass, alive,
    per player: rel_x, rel_y, total_mass, alive (self slot zeroed) ]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.obs.ram import (DEAD_KEY, RamObsConfig, pack_nearest_key,
                                ram_size)
from agarcl_tpu.state import GameState


def _block_size(n: int, want: int) -> int:
    """Largest block size <= want that divides n (the pallas grid needs
    uniform blocks; odd env counts fall back to smaller blocks rather than
    asserting out)."""
    b = min(want, n)
    while n % b:
        b -= 1
    return b


def _nearest_rows(key, k, cols, post=None):
    """Iteratively extract the k nearest entries by the packed selection
    key (obs/ram.py::pack_nearest_key — d2 bits with the low index bits
    substituted, so keys are unique and the min IS the stable
    lowest-index-tiebreak pick that top_k(-key) produces); returns
    k * (n_cols+1) rows of (1, E): per neighbor, each col masked by
    alive, then the alive flag.

    key: (M, E) i32 packed keys with dead entries at DEAD_KEY;
    cols: list of (M, E) feature planes to select from (f32 summed as
    floats, int dtypes summed exactly as ints).
    post: optional fn(selected_cols (list of (1,E)), alivef) -> list of
    output rows — lets the caller decode a packed column into several
    rows (the pellet position key) instead of extracting each coordinate
    separately.
    Per pick this is one min-reduce, one compare, one masked-sum per col,
    and one invalidation pass — ~4-5 (M, E) passes vs the previous 8 of
    the 2-min-reduce formulation (the obs extraction was the largest
    single block of the fused step at 8192 envs).
    """
    rows = []
    for _ in range(k):
        cur = jnp.min(key, axis=0, keepdims=True)                # (1, E)
        first = key == cur                  # unique unless all dead
        alivef = jnp.where(cur < DEAD_KEY, 1.0, 0.0)
        sel = []
        for c in cols:
            zero = jnp.zeros((), c.dtype)
            sel.append(jnp.sum(jnp.where(first, c, zero), axis=0,
                               keepdims=True))
        if post is None:
            rows += [s * alivef for s in sel]
        else:
            rows += post(sel, alivef)
        rows.append(alivef)
        key = jnp.where(first, DEAD_KEY, key)
    return rows


def obs_rows(cfg: EnvConfig, ocfg: RamObsConfig, inv_w, inv_h,
             cpx, cpy, cvx, cvy, cmass, calive,
             ppx, ppy, palive, vpx, vpy, vmass, valive, pkey=None):
    """The RAM frame as an (A*ram_size, E) f32 VALUE from env-in-lanes
    state tensors ((rows, E); alive masks as >0-truthy ints). Shared by
    the standalone obs kernel below and the merged tick+obs kernel
    (ops/fused_tick.py) — the tick's in-VMEM state has exactly this
    layout, so emitting the frame there saves the obs kernel's separate
    state read (~1 ms/call at 8192 envs)."""
    kp = min(ocfg.num_pellets, cfg.pellet_capacity)
    kv = min(ocfg.num_viruses, cfg.virus_capacity)
    Cc = cfg.max_cells
    P = cfg.num_players
    A = cfg.num_agents
    # per-player centroid + total mass (state.py player_centroid /
    # player_mass); cells arrive flat (P*Cc, E)
    E = cpx.shape[1]
    af_all = jnp.where(calive > 0, 1.0, 0.0)                     # (PC, E)
    w_all = cmass.astype(jnp.float32) * af_all
    if P == 1:
        tot = jnp.sum(w_all, axis=0, keepdims=True)          # (P, E)
        sx = jnp.sum(cpx * w_all, axis=0, keepdims=True)
        sy = jnp.sum(cpy * w_all, axis=0, keepdims=True)
        pal = jnp.max(af_all, axis=0, keepdims=True)
    else:
        tot = jnp.sum(w_all.reshape(P, Cc, E), axis=1)
        sx = jnp.sum((cpx * w_all).reshape(P, Cc, E), axis=1)
        sy = jnp.sum((cpy * w_all).reshape(P, Cc, E), axis=1)
        pal = jnp.max(af_all.reshape(P, Cc, E), axis=1)
    den = jnp.maximum(tot, 1.0)
    cenx = sx / den
    ceny = sy / den

    rows = []
    for a in range(A):
        sl = slice(a * Cc, (a + 1) * Cc)
        cx = cenx[a:a + 1]                                   # (1, E)
        cy = ceny[a:a + 1]
        rows += [cx * inv_w, cy * inv_h, tot[a:a + 1]]

        # own cell slots: rel_x, rel_y, mass, vel_x, vel_y, alive
        af = af_all[sl]
        relx = (cpx[sl] - cx) * af
        rely = (cpy[sl] - cy) * af
        mass = cmass[sl].astype(jnp.float32) * af
        velx = cvx[sl] * af
        vely = cvy[sl] * af
        for c in range(Cc):
            rows += [relx[c:c + 1], rely[c:c + 1], mass[c:c + 1],
                     velx[c:c + 1], vely[c:c + 1], af[c:c + 1]]

        # Kp nearest pellets: rel_x, rel_y, alive
        prx = ppx - cx
        pry = ppy - cy
        d2 = prx * prx + pry * pry
        pidx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        selkey = pack_nearest_key(d2, pidx, palive > 0, d2.shape[0])
        if pkey is None:
            rows += _nearest_rows(selkey, kp, [prx, pry])
        else:
            # one int extraction pass per pick instead of two f32 passes:
            # the position key decodes to the exact ppx/ppy values
            # (state.py decode), so (decode(ksel) - cx) == extracted prx
            # bit-for-bit
            from agarcl_tpu.state import pellet_scales
            _, _, invx, invy = pellet_scales(cfg)
            qm = np.int32((1 << 15) - 1)

            def post(sel, alivef):
                ks = sel[0]
                x = (((ks >> 15) & qm).astype(jnp.float32) + 0.5) * invx
                y = ((ks & qm).astype(jnp.float32) + 0.5) * invy
                return [(x - cx) * alivef, (y - cy) * alivef]

            rows += _nearest_rows(selkey, kp, [pkey], post=post)

        # Kv nearest viruses: rel_x, rel_y, mass, alive
        vrx = vpx - cx
        vry = vpy - cy
        vd2 = vrx * vrx + vry * vry
        vidx = jax.lax.broadcasted_iota(jnp.int32, vd2.shape, 0)
        vkey = pack_nearest_key(vd2, vidx, valive > 0, vd2.shape[0])
        rows += _nearest_rows(vkey, kv,
                              [vrx, vry, vmass.astype(jnp.float32)])

        # per-player block: rel_x, rel_y, total_mass, alive; self slot
        # zeroed (obs/ram.py:88-96 keep mask)
        zero = jnp.zeros_like(cx)
        for p in range(P):
            if p == a:
                rows += [zero, zero, zero, zero]
            else:
                keep = pal[p:p + 1]
                rows += [(cenx[p:p + 1] - cx) * keep,
                         (ceny[p:p + 1] - cy) * keep,
                         tot[p:p + 1] * keep, keep]

    return jnp.concatenate(rows, axis=0)


def _make_obs_kernel(cfg: EnvConfig, ocfg: RamObsConfig, inv_w, inv_h):
    def kernel(cpx, cpy, cvx, cvy, cmass, calive,
               ppx, ppy, palive, vpx, vpy, vmass, valive, o_ref):
        o_ref[:] = obs_rows(cfg, ocfg, inv_w, inv_h,
                            cpx[...], cpy[...], cvx[...], cvy[...],
                            cmass[...], calive[...],
                            ppx[...], ppy[...], palive[...],
                            vpx[...], vpy[...], vmass[...], valive[...])

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_ram_obs(cfg: EnvConfig, ocfg: RamObsConfig, states: GameState,
                  block_envs: int = 128, interpret: bool = False):
    """(N, A, ram_size) f32 — batched RAM observation via one pallas_call.

    Bit-for-bit the same features as jax.vmap(ram_frame) up to f32
    reduction-order noise in the centroid sums.
    """
    N = states.ticks.shape[0]
    A = cfg.num_agents
    E = _block_size(N, block_envs)
    R = ram_size(cfg, ocfg)

    b2i = lambda b: jnp.where(b, 1, 0).astype(jnp.int32)
    pellet_pos, pellet_alive = states.pellet_xy_alive(cfg)
    ins = [
        jnp.transpose(states.cell_pos[..., 0].reshape(N, -1)),   # (PC, N)
        jnp.transpose(states.cell_pos[..., 1].reshape(N, -1)),
        jnp.transpose(states.cell_vel[..., 0].reshape(N, -1)),
        jnp.transpose(states.cell_vel[..., 1].reshape(N, -1)),
        jnp.transpose(states.cell_mass.reshape(N, -1)),
        jnp.transpose(b2i(states.cell_alive).reshape(N, -1)),
        jnp.transpose(pellet_pos[:, :, 0]),              # (Np, N)
        jnp.transpose(pellet_pos[:, :, 1]),
        jnp.transpose(b2i(pellet_alive)),
        jnp.transpose(states.virus_pos[:, :, 0]),        # (Nv, N)
        jnp.transpose(states.virus_pos[:, :, 1]),
        jnp.transpose(states.virus_mass),
        jnp.transpose(b2i(states.virus_alive)),
    ]

    def spec_for(x):
        return pl.BlockSpec((x.shape[0], E), lambda i: (0, i))

    kernel = _make_obs_kernel(cfg, ocfg,
                              1.0 / cfg.arena_width,
                              1.0 / cfg.arena_height)
    out = pl.pallas_call(
        kernel,
        grid=(N // E,),
        in_specs=[spec_for(x) for x in ins],
        out_specs=pl.BlockSpec((A * R, E), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((A * R, N), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    return jnp.transpose(out).reshape(N, A, R)
