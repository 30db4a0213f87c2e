"""Grid observation as a single Pallas kernel (per-env-block MXU binning).

The XLA einsum rasterizer (obs/grid.py) is bandwidth-bound: the (Ne, G)
one-hots round-trip through HBM between ops (~19 ms per 8192-env 64x64
frame). This kernel builds the one-hots in VMEM and contracts them on the
MXU, so the only HBM traffic is the entity tables in and the (C, G, G)
frames out.

Bin semantics are identical to obs/grid.py (itself pinned to the reference
GridEnvironment.hpp:91-123,251-279): gx = trunc(G*dx/view + G/2) in f32 (the
C int-cast trunc, including the -0.0 == bin-0 quirk), view =
clamp(2*player_mass, 100, 300). Channel layout (fixed kernel order):

  0 out-of-bounds (0 / -1)      4 virus total-mass   (add matmul)
  1 pellet presence (count>0)   5 own-cells total-mass (add matmul)
  2 pellet count    (matmul)    6 other-cells min-mass (unrolled)
  3 virus max-mass  (unrolled)  7 other-cells max-mass (unrolled)

Dead / out-of-view entities need no explicit mask: add channels carry
weight 0, max carries 0, min carries +INF, and out-of-grid bins match no
one-hot lane.

Layout notes (see fused_screen.py): entity tables arrive (E, Ne) with envs
in sublanes, are sliced per env as (1, Ne) rows and transposed to (Ne, 1)
columns; one-hots come from (Ne, 1) == (1, G) broadcasts; per-channel grids
are (G, G) tiles with G in lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.obs.grid import GridObsConfig

_INF_F = 2.0**30


def supports(cfg: EnvConfig, ocfg) -> bool:
    """The fused grid kernel covers single-agent configs (any bot count)."""
    return (isinstance(ocfg, GridObsConfig) and cfg.num_agents == 1
            and ocfg.num_frames == 1)


def _make_kernel(cfg: EnvConfig, G: int, BE: int, n_other: int):
    W = cfg.arena_width
    H = cfg.arena_height
    Cc = cfg.max_cells
    Nv = cfg.virus_capacity

    def kernel(params, px, py, vx, vy, vm, mx, my, mm,
               ox, oy, om, ok_, o_ref):
        iota_lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, G), 1).astype(jnp.float32)
        iota_sub = jax.lax.broadcasted_iota(
            jnp.int32, (G, 1), 0).astype(jnp.float32)

        # bin tables for the whole env block, vectorized with entities in
        # lanes: (BE, Ne) f32 — the exact obs/grid.py _to_grid expression
        # (division, not reciprocal-multiply, so f32 rounding matches
        # bin-for-bin). cols (BE, 1) broadcast against the entity lanes.
        cxc = params[:, 0:1]
        cyc = params[:, 1:2]
        vwc = params[:, 2:3]

        def bins_blk(xref, yref):
            bx = jnp.trunc(G * (xref[...] - cxc) / vwc + G / 2.0)
            by = jnp.trunc(G * (yref[...] - cyc) / vwc + G / 2.0)
            return bx, by

        pbx, pby = bins_blk(px, py)                           # (BE, Np)
        vbx, vby = bins_blk(vx, vy)                           # (BE, Nv)
        mbx, mby = bins_blk(mx, my)                           # (BE, Cc)
        if n_other:
            obx, oby = bins_blk(ox, oy)

        for be in range(BE):
            def ohT(b_all, w=None, dtype=jnp.bfloat16):
                """Transposed one-hot (G, Ne) from block-bin row be — a
                (G, 1) == (1, Ne) broadcast, no transposes anywhere."""
                row = b_all[be:be + 1, :]                     # (1, Ne)
                eq = iota_sub == row                          # (G, Ne)
                if w is None:
                    return jnp.where(eq, 1.0, 0.0).astype(dtype)
                return jnp.where(eq, w[be:be + 1, :], 0.0)    # f32

            def cnt(ohxT, ohyT):
                """count[i, j] = sum_e ohxT[i, e] * ohyT[j, e] (MXU)."""
                return jax.lax.dot_general(
                    ohxT, ohyT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (G, G)

            # --- out-of-bounds (GridEnvironment.hpp:240-248) --------------
            cx = params[be, 0]
            cy = params[be, 1]
            view = params[be, 2]
            wx = cx + (iota_sub - G / 2.0) * view / G         # (G, 1) rows
            wy = cy + (iota_lane - G / 2.0) * view / G        # (1, G) cols
            inb = ((wx >= 0) & (wx < W) & (wy >= 0) & (wy < H))
            o_ref[be, 0] = jnp.where(inb, 0, -1)

            # --- pellets: count + presence via one bf16 matmul ------------
            counti = cnt(ohT(pbx), ohT(pby)).astype(jnp.int32)
            o_ref[be, 1] = jnp.minimum(counti, 1)
            o_ref[be, 2] = counti

            # --- viruses: unrolled max (scalar bins) + add matmul ---------
            vmax = jnp.zeros((G, G), jnp.float32)
            for e in range(Nv):
                bx = jnp.trunc(G * (vx[be, e] - cx) / view + G / 2.0)
                by = jnp.trunc(G * (vy[be, e] - cy) / view + G / 2.0)
                hit = (bx == iota_sub) & (by == iota_lane)    # (G, G)
                vmax = jnp.maximum(vmax, jnp.where(hit, vm[be, e], 0.0))
            o_ref[be, 3] = vmax.astype(jnp.int32)
            o_ref[be, 4] = cnt(ohT(vbx, vm),
                               ohT(vby, dtype=jnp.float32)).astype(jnp.int32)

            # --- own cells: add matmul ------------------------------------
            o_ref[be, 5] = cnt(ohT(mbx, mm),
                               ohT(mby, dtype=jnp.float32)).astype(jnp.int32)

            # --- other players' cells: unrolled min/max -------------------
            if n_other:
                omin = jnp.full((G, G), _INF_F, jnp.float32)
                omax = jnp.zeros((G, G), jnp.float32)
                for e in range(n_other):
                    bx = jnp.trunc(G * (ox[be, e] - cx) / view + G / 2.0)
                    by = jnp.trunc(G * (oy[be, e] - cy) / view + G / 2.0)
                    hit = (bx == iota_sub) & (by == iota_lane)
                    omin = jnp.minimum(
                        omin, jnp.where(hit, ok_[be, e], _INF_F))
                    omax = jnp.maximum(
                        omax, jnp.where(hit, om[be, e], 0.0))
                o_ref[be, 6] = jnp.where(
                    omin == _INF_F, 0.0, omin).astype(jnp.int32)
                o_ref[be, 7] = omax.astype(jnp.int32)
            else:
                zero = jnp.zeros((G, G), jnp.int32)
                o_ref[be, 6] = zero
                o_ref[be, 7] = zero

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_grid_channels(cfg: EnvConfig, G: int, states,
                        block_envs: int = 8, interpret: bool = False):
    """(N, 8, G, G) int32 — all grid channels for a batched GameState,
    bin-exact vs jax.vmap of obs/grid.py grid_frame (single-agent)."""
    N = states.ticks.shape[0]
    BE = min(block_envs, N)
    assert N % BE == 0, (N, BE)
    P, Cc = states.cell_mass.shape[1:]

    centroid = states.player_centroid()[:, 0, :]              # (N, 2)
    pmass = states.player_mass()[:, 0].astype(jnp.float32)
    view = jnp.clip(2.0 * pmass, 100.0, 300.0)
    params = jnp.zeros((N, 8), jnp.float32)
    params = params.at[:, 0].set(centroid[:, 0])
    params = params.at[:, 1].set(centroid[:, 1])
    params = params.at[:, 2].set(view)

    f32 = jnp.float32
    # dead pellets park at an out-of-grid bin via a huge coordinate
    palive = states.pellet_alive
    px = jnp.where(palive, states.pellet_pos[:, :, 0], f32(1e9))
    py = jnp.where(palive, states.pellet_pos[:, :, 1], f32(1e9))
    vx = states.virus_pos[:, :, 0]
    vy = states.virus_pos[:, :, 1]
    vm = jnp.where(states.virus_alive,
                   states.virus_mass.astype(f32), 0.0)        # max+add weight
    mx = states.cell_pos[:, 0, :, 0]
    my = states.cell_pos[:, 0, :, 1]
    mm = jnp.where(states.cell_alive[:, 0],
                   states.cell_mass[:, 0].astype(f32), 0.0)
    n_other = (P - 1) * Cc
    if n_other:
        opos = states.cell_pos[:, 1:].reshape(N, n_other, 2)
        oalive = states.cell_alive[:, 1:].reshape(N, n_other)
        omass = states.cell_mass[:, 1:].reshape(N, n_other).astype(f32)
        ox = opos[:, :, 0]
        oy = opos[:, :, 1]
        om = jnp.where(oalive, omass, 0.0)                    # max weight
        ok_ = jnp.where(oalive, omass, f32(_INF_F))           # min weight
    else:
        ox = oy = om = ok_ = jnp.zeros((N, 8), f32)

    ins = [params, px, py, vx, vy, vm, mx, my, mm, ox, oy, om, ok_]

    def spec(x):
        return pl.BlockSpec((BE, x.shape[1]), lambda i: (i, 0))

    kernel = _make_kernel(cfg, G, BE, n_other)
    return pl.pallas_call(
        kernel,
        grid=(N // BE,),
        in_specs=[spec(x) for x in ins],
        out_specs=pl.BlockSpec((BE, 8, G, G), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 8, G, G), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)


_CH_ORDER = dict(oob=0, pel_presence=1, pel_count=2, vir_max=3, vir_add=4,
                 own=5, oth_min=6, oth_max=7)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_grid_frame(cfg: EnvConfig, ocfg: GridObsConfig, states,
                     block_envs: int = 8, interpret: bool = False):
    """(N, 1, C, G, G) int32 — batched grid frames with the ocfg's channel
    selection, matching jax.vmap(grid_frame) exactly."""
    assert supports(cfg, ocfg)
    all_ch = fused_grid_channels(cfg, ocfg.grid_size, states, block_envs,
                                 interpret)
    idx = [0]
    if ocfg.observe_pellets:
        idx += [1, 2]
    if ocfg.observe_viruses:
        idx += [3, 4]
    if ocfg.observe_cells:
        idx += [5]
    if ocfg.observe_others:
        idx += [6, 7]
    if idx == list(range(8)):
        sel = all_ch
    else:
        sel = jnp.stack([all_ch[:, i] for i in idx], axis=1)
    return sel[:, None]                                       # (N, 1, C, G, G)
