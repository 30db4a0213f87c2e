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
# count weight for the combined count+mass virus matmul: per-bin virus mass
# sums stay < 2^17 (26 viruses * <=170 mass) and count*2^17 + mass < 2^24
# stays integer-exact in f32
_CNT_W = 2.0**17


def _block_size(n: int, want: int) -> int:
    """Largest block size <= want that divides n (the pallas grid needs
    uniform blocks; odd env counts fall back to smaller blocks rather than
    asserting out)."""
    b = min(want, n)
    while n % b:
        b -= 1
    return b


def supports(cfg: EnvConfig, ocfg) -> bool:
    """The fused grid kernel covers any agent count (each agent's frame is
    a virtual env row through the same kernel) and any frame count (the
    step scan calls the rasterizer once per obs tick, fused_step.py) with
    grid sizes dividing 128 (the packed-output layout)."""
    return (isinstance(ocfg, GridObsConfig)
            and 128 % ocfg.grid_size == 0)


def supports_emit(cfg: EnvConfig, ocfg) -> bool:
    """Whether the TICK kernel can emit this config's grid sections
    itself (fused_engine_tick(grid_tab=True) writes single-agent
    sections from its post-tick VMEM state); multi-agent configs build
    per-agent tables in XLA instead (_build_grid_table(agents=A))."""
    return supports(cfg, ocfg) and cfg.num_agents == 1


def section_meta(cfg: EnvConfig):
    """Static (name, width, padded width, pad fill) rows of the kernel's
    input-section contract — the single source of truth shared by
    _build_grid_table (XLA build) and the fused tick's in-kernel emission
    (fused_tick.py grid_tab), which writes the same sections straight from
    its post-tick VMEM state so the XLA build (+~2 ms/step of transposes at
    8192 envs, bench/obs_table_probe.py) never runs."""
    P, Cc = cfg.num_players, cfg.max_cells
    Np, Nv = cfg.pellet_capacity, cfg.virus_capacity
    n_other = (P - 1) * Cc
    ow = n_other if n_other else 8
    rows = [("params", 8, 0.0),
            ("px", Np, 1e9), ("py", Np, 1e9),
            ("vx", Nv, 1e9), ("vy", Nv, 1e9), ("vm", Nv, 0.0),
            ("mx", Cc, 1e9), ("my", Cc, 1e9), ("mm", Cc, 0.0),
            ("ox", ow, 1e9), ("oy", ow, 1e9), ("om", ow, 0.0),
            ("ok", ow, 0.0)]
    return [(n, w, -(-w // 128) * 128, f) for n, w, f in rows]


def _meta_offs(meta):
    """offs dict {name: (lane offset, width, padded width)} for a meta list
    (the consolidated-table addressing _make_kernel uses in non-multi
    mode; in sections mode only the widths matter)."""
    offs = {}
    off = 0
    for n, w, pw, _ in meta:
        offs[n] = (off, w, pw)
        off += pw
    return offs


def _make_kernel(cfg: EnvConfig, G: int, BE: int, n_other: int, offs,
                 _only: str | None = None, out_dtype=jnp.int32,
                 multi: tuple | None = None, _vmax: str = 'cond'):
    """offs: {section: (lane offset, real width, padded width)} into the one
    consolidated input table (one DMA per grid step instead of 13).
    _only: benchmarking knob — compute just one channel group ('pellets',
    'virus', 'own', 'oob') and store zeros elsewhere, isolating its cost.

    The kernel computes and stores every channel in the PACKED layout
    (G*G//128, 128) — the same row-major bytes as (G, G), reshaped for free
    outside. Storing (G, G) tiles directly leaves 128-G lanes of padding in
    every VMEM row, which degrades the output DMA into G*4-byte strided
    segments (measured 88 GB/s, ~12 ms per 8192-env frame — the whole kernel
    cost); dense (…, 128) tiles stream out linearly. Requires 128 % G == 0
    (see supports()).
    """
    def on(name):
        return _only is None or _only == name
    W = cfg.arena_width
    H = cfg.arena_height
    Nv = cfg.virus_capacity
    PACK = 128 // G          # grid rows packed per 128-lane output row
    ROWS = G * G // 128      # output rows per channel

    def kernel(*refs):
        o_ref = refs[-1]
        tabs = dict(zip(multi, refs[:-1])) if multi else None
        tab = None if multi else refs[0]

        def sec(name):
            if multi:
                return tabs[name][:, :]                   # (BE, padded Ne)
            o, w, pw = offs[name]
            return tab[:, o:o + pw]                       # (BE, padded Ne)

        def scal(name, be, j):
            if multi:
                return tabs[name][be, j]
            return tab[be, offs[name][0] + j]

        def st(x):
            """int32 channel -> output dtype; narrow dtypes saturate at
            their bounds (GridObsConfig.out_dtype)."""
            if out_dtype == jnp.int32:
                return x
            info = jnp.iinfo(out_dtype)
            return jnp.clip(x, info.min, info.max).astype(out_dtype)

        iota_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        # packed pixel -> (row bin r, col bin c): r = PACK*i + j//G, c = j%G
        r_i = PACK * iota_i + iota_j // G
        c_i = iota_j - (iota_j // G) * G
        rf = r_i.astype(jnp.float32)
        cfl = c_i.astype(jnp.float32)
        iota_flat = r_i * G + c_i
        iota_rows = jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, 1), 0).astype(jnp.float32)
        iota_g = jax.lax.broadcasted_iota(
            jnp.int32, (G, 1), 0).astype(jnp.float32)

        # bin tables for the whole env block, vectorized with entities in
        # lanes: (BE, Ne) f32 — the exact obs/grid.py _to_grid expression
        # (division, not reciprocal-multiply, so f32 rounding matches
        # bin-for-bin). cols (BE, 1) broadcast against the entity lanes.
        if multi:
            cxc = tabs['params'][:, 0:1]
            cyc = tabs['params'][:, 1:2]
            vwc = tabs['params'][:, 2:3]
        else:
            po = offs['params'][0]
            cxc = tab[:, po:po + 1]
            cyc = tab[:, po + 1:po + 2]
            vwc = tab[:, po + 2:po + 3]

        def bins_blk(xn, yn):
            bx = jnp.trunc(G * (sec(xn) - cxc) / vwc + G / 2.0)
            by = jnp.trunc(G * (sec(yn) - cyc) / vwc + G / 2.0)
            return bx, by

        pbx, pby = bins_blk('px', 'py')                       # (BE, Np)
        vbx, vby = bins_blk('vx', 'vy')                       # (BE, Nv)
        mbx, mby = bins_blk('mx', 'my')                       # (BE, Cc)
        if n_other:
            obx, oby = bins_blk('ox', 'oy')

        def flat_bin_at(be, x, y):
            """Scalar flat bin (see flat_bin) for the block-level slow
            rewrites, reading this env's camera scalars itself."""
            cx_ = scal('params', be, 0)
            cy_ = scal('params', be, 1)
            vw_ = scal('params', be, 2)
            bx = jnp.trunc(G * (x - cx_) / vw_ + G / 2.0)
            by = jnp.trunc(G * (y - cy_) / vw_ + G / 2.0)
            ok = (bx >= 0.0) & (bx < G) & (by >= 0.0) & (by < G)
            return jnp.where(ok, bx * G + by, -1.0).astype(jnp.int32)

        vneed = []
        oneed = []
        for be in range(BE):
            def ohyT(b_all, dtype=jnp.bfloat16):
                """Col-bin one-hot (G, Ne): (G,1) == (1,Ne) broadcast."""
                eq = iota_g == b_all[be:be + 1, :]
                return jnp.where(eq, 1.0, 0.0).astype(dtype)

            def mmul(bx_all, ohy, w=None):
                """Packed-count matmul (ROWS, 128): for each lane group p,
                count[i, p*G+c] = sum_e [bx_e == PACK*i+p][by_e == c]
                (weights ride the row one-hot)."""
                parts = []
                for pp in range(PACK):
                    tgt = PACK * iota_rows + jnp.float32(pp)  # (ROWS, 1)
                    eq = tgt == bx_all[be:be + 1, :]          # (ROWS, Ne)
                    if w is None:
                        rp = jnp.where(eq, 1.0, 0.0).astype(jnp.bfloat16)
                    else:
                        rp = jnp.where(eq, w, 0.0)            # f32
                    parts.append(jax.lax.dot_general(
                        rp, ohy, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))  # (ROWS, G)
                return parts[0] if PACK == 1 else jnp.concatenate(parts,
                                                                  axis=1)

            # --- out-of-bounds (GridEnvironment.hpp:240-248) --------------
            cx = scal('params', be, 0)
            cy = scal('params', be, 1)
            view = scal('params', be, 2)
            zero = jnp.zeros((ROWS, 128), out_dtype)
            if on('oob'):
                wx = cx + (rf - G / 2.0) * view / G           # row-bin axis
                wy = cy + (cfl - G / 2.0) * view / G          # col-bin axis
                inb = ((wx >= 0) & (wx < W) & (wy >= 0) & (wy < H))
                o_ref[be, 0] = jnp.where(inb, 0, -1).astype(out_dtype)
            else:
                o_ref[be, 0] = zero

            # --- pellets: count + presence via one bf16 matmul ------------
            if on('pellets'):
                counti = mmul(pbx, ohyT(pby)).astype(jnp.int32)
                o_ref[be, 1] = st(jnp.minimum(counti, 1))
                o_ref[be, 2] = st(counti)
            else:
                o_ref[be, 1] = zero
                o_ref[be, 2] = zero

            def flat_bin(x, y):
                """Scalar flat bin bx*G+by (x bins index the row axis,
                matching the two-axis form), or -1 when out of grid (so it
                matches no pixel of iota_flat). Dead entities arrive parked
                at 1e9 and fall out via the range check."""
                bx = jnp.trunc(G * (x - cx) / view + G / 2.0)
                by = jnp.trunc(G * (y - cy) / view + G / 2.0)
                ok = (bx >= 0.0) & (bx < G) & (by >= 0.0) & (by < G)
                return jnp.where(ok, bx * G + by, -1.0).astype(jnp.int32)

            # --- viruses: ONE f32 matmul carries both the total mass and a
            # bin count (count rides bit 17+: masses per bin < 2^17, count*
            # 2^17 + mass < 2^24 stays integer-exact in f32). When every bin
            # holds <= 1 virus (physically typical: two viruses in one bin
            # means overlapping viruses) max == sum; the unrolled flat-bin
            # loop runs only behind a single per-env branch otherwise. -----
            if on('virus'):
                vacc = mmul(vbx, ohyT(vby, dtype=jnp.float32),
                            w=sec('vm')[be:be + 1, :] + _CNT_W)      # (ROWS, 128)
                vcnt = jnp.floor(vacc * (1.0 / _CNT_W))
                vadd = vacc - vcnt * _CNT_W

                def vmax_slow():
                    m_ = jnp.zeros((ROWS, 128), jnp.float32)
                    for e in range(Nv):
                        flat = flat_bin(scal('vx', be, e), scal('vy', be, e))
                        m_ = jnp.maximum(
                            m_, jnp.where(iota_flat == flat,
                                          scal('vm', be, e), 0.0))
                    return m_

                if _vmax == 'nocond':
                    vmax = vmax_slow()
                elif _vmax in ('fast', 'block'):
                    # max == sum when every bin holds <= 1 virus; the exact
                    # unrolled fallback runs once per BLOCK behind pl.when
                    # (see below) — a per-env lax.cond costs ~1.9 ms/frame
                    # at 8192 envs in carry copies + pipeline breaks even
                    # when never taken (bench/grid_floor_probe.py), the
                    # block-level rewrite costs only the rare slow frames
                    vmax = vadd
                    if _vmax == 'block':
                        vneed.append(jnp.max(vcnt))
                else:
                    vmax = jax.lax.cond(jnp.max(vcnt) >= 2.0, vmax_slow,
                                        lambda: vadd)
                o_ref[be, 3] = st(vmax.astype(jnp.int32))
                o_ref[be, 4] = st(vadd.astype(jnp.int32))
            else:
                o_ref[be, 3] = zero
                o_ref[be, 4] = zero

            # --- own cells: add matmul ------------------------------------
            if on('own'):
                o_ref[be, 5] = st(mmul(
                    mbx, ohyT(mby, dtype=jnp.float32),
                    w=sec('mm')[be:be + 1, :]).astype(jnp.int32))
            else:
                o_ref[be, 5] = zero

            # --- other players' cells: count + mass-sum matmuls; min == max
            # == sum when every bin holds <= 1 cell, else one per-env branch
            # into the unrolled flat-bin loop (counts in bf16 are exact to
            # 256; mass sums ride a separate f32 matmul because 64 cells *
            # 22k mass overflows the packed-count trick) ------------------
            if n_other:
                oy_oh = ohyT(oby, dtype=jnp.float32)
                ocnt_ = mmul(obx, ohyT(oby))
                oadd = mmul(obx, oy_oh, w=sec('om')[be:be + 1, :])

                def oth_slow():
                    mn = jnp.full((ROWS, 128), _INF_F, jnp.float32)
                    mx_ = jnp.zeros((ROWS, 128), jnp.float32)
                    for e in range(n_other):
                        flat = flat_bin(scal('ox', be, e), scal('oy', be, e))
                        hit = iota_flat == flat
                        mn = jnp.minimum(mn, jnp.where(
                            hit, scal('ok', be, e), _INF_F))
                        mx_ = jnp.maximum(mx_, jnp.where(
                            hit, scal('om', be, e), 0.0))
                    return jnp.where(mn == _INF_F, 0.0, mn), mx_

                if _vmax in ('fast', 'block'):
                    omin = omax = oadd       # exact when <=1 cell per bin;
                    #                          'block' rewrites below
                    if _vmax == 'block':
                        oneed.append(jnp.max(ocnt_))
                else:
                    omin, omax = jax.lax.cond(
                        jnp.max(ocnt_) >= 2.0, oth_slow, lambda: (oadd, oadd))
                o_ref[be, 6] = st(omin.astype(jnp.int32))
                o_ref[be, 7] = st(omax.astype(jnp.int32))
            else:
                o_ref[be, 6] = zero
                o_ref[be, 7] = zero

        # --- block-level exact rewrites (_vmax='block'): the fast values
        # above are exact unless some bin in some env of this block holds
        # two entities; then ONE pl.when redoes the unrolled exact min/max
        # for the whole block, writing o_ref directly (no carries — a
        # per-env lax.cond costs ~1.9 ms/frame at 8192 envs even when the
        # branch is never taken, bench/grid_floor_probe.py) ---------------
        if vneed:
            need = vneed[0]
            for f in vneed[1:]:
                need = jnp.maximum(need, f)

            @pl.when(need >= 2.0)
            def _vrewrite():
                for be in range(BE):
                    m_ = jnp.zeros((ROWS, 128), jnp.float32)
                    for e in range(Nv):
                        flat = flat_bin_at(be, scal('vx', be, e),
                                           scal('vy', be, e))
                        m_ = jnp.maximum(
                            m_, jnp.where(iota_flat == flat,
                                          scal('vm', be, e), 0.0))
                    o_ref[be, 3] = st(m_.astype(jnp.int32))

        if oneed:
            needo = oneed[0]
            for f in oneed[1:]:
                needo = jnp.maximum(needo, f)

            @pl.when(needo >= 2.0)
            def _orewrite():
                for be in range(BE):
                    mn = jnp.full((ROWS, 128), _INF_F, jnp.float32)
                    mx_ = jnp.zeros((ROWS, 128), jnp.float32)
                    for e in range(n_other):
                        flat = flat_bin_at(be, scal('ox', be, e),
                                           scal('oy', be, e))
                        hit = iota_flat == flat
                        mn = jnp.minimum(mn, jnp.where(
                            hit, scal('ok', be, e), _INF_F))
                        mx_ = jnp.maximum(mx_, jnp.where(
                            hit, scal('om', be, e), 0.0))
                    o_ref[be, 6] = st(
                        jnp.where(mn == _INF_F, 0.0, mn).astype(jnp.int32))
                    o_ref[be, 7] = st(mx_.astype(jnp.int32))

    return kernel


def _build_grid_table(cfg: EnvConfig, G: int, states, sections: bool = False,
                      agents: int = 1):
    """Entity input tables + offsets + n_other for the grid kernel.
    sections=True returns the padded sections as a dict (the separate-
    inputs layout) instead of concatenating into one table.
    agents>1 builds one virtual env row per (env, agent) pair — row
    n*agents + a carries agent a's camera params, its cells as the "own"
    section and every other player's cells as "others" (obs/grid.py
    owner-mask semantics) — so the same single-agent kernel rasterizes
    multi-agent frames; the caller reshapes (N*A, ...) -> (N, A, ...)."""
    N = states.ticks.shape[0]
    P, Cc = states.cell_mass.shape[1:]
    A = agents

    centroid = states.player_centroid()[:, :A, :]             # (N, A, 2)
    pmass = states.player_mass()[:, :A].astype(jnp.float32)
    view = jnp.clip(2.0 * pmass, 100.0, 300.0)                # (N, A)
    NA = N * A
    params = jnp.zeros((NA, 8), jnp.float32)
    params = params.at[:, 0].set(centroid[..., 0].reshape(NA))
    params = params.at[:, 1].set(centroid[..., 1].reshape(NA))
    params = params.at[:, 2].set(view.reshape(NA))

    f32 = jnp.float32

    def rep(x):
        """(N, Ne) -> (N*A, Ne): shared entity tables repeated per agent
        (free for A == 1)."""
        if A == 1:
            return x
        return jnp.broadcast_to(x[:, None], (N, A) + x.shape[1:]).reshape(
            (NA,) + x.shape[1:])

    # dead pellets park at an out-of-grid bin via a huge coordinate
    pellet_pos, palive = states.pellet_xy_alive(cfg)
    px = rep(jnp.where(palive, pellet_pos[:, :, 0], f32(1e9)))
    py = rep(jnp.where(palive, pellet_pos[:, :, 1], f32(1e9)))
    # dead viruses park at an out-of-grid bin so the in-kernel bin counts
    # see live entities only
    vx = rep(jnp.where(states.virus_alive, states.virus_pos[:, :, 0],
                       f32(1e9)))
    vy = rep(jnp.where(states.virus_alive, states.virus_pos[:, :, 1],
                       f32(1e9)))
    vm = rep(jnp.where(states.virus_alive,
                       states.virus_mass.astype(f32), 0.0))   # max+add weight

    def own_other(a):
        """Own/other sections for agent a (owner == a vs owner != a)."""
        mx_ = states.cell_pos[:, a, :, 0]
        my_ = states.cell_pos[:, a, :, 1]
        mm_ = jnp.where(states.cell_alive[:, a],
                        states.cell_mass[:, a].astype(f32), 0.0)
        oth = [p for p in range(P) if p != a]
        if oth:
            opos = states.cell_pos[:, oth].reshape(N, len(oth) * Cc, 2)
            oalive = states.cell_alive[:, oth].reshape(N, len(oth) * Cc)
            omass = states.cell_mass[:, oth].reshape(
                N, len(oth) * Cc).astype(f32)
            ox_ = jnp.where(oalive, opos[:, :, 0], f32(1e9))
            oy_ = jnp.where(oalive, opos[:, :, 1], f32(1e9))
            om_ = jnp.where(oalive, omass, 0.0)               # max weight
            okk = jnp.where(oalive, omass, f32(_INF_F))       # min weight
        else:
            ox_ = oy_ = om_ = okk = jnp.zeros((N, 8), f32)
        return mx_, my_, mm_, ox_, oy_, om_, okk

    if A == 1:
        mx, my, mm, ox, oy, om, ok_ = own_other(0)
    else:
        cols = [own_other(a) for a in range(A)]
        mx, my, mm, ox, oy, om, ok_ = (
            jnp.stack([c[i] for c in cols], axis=1).reshape(
                (NA,) + cols[0][i].shape[1:])
            for i in range(7))
    n_other = (P - 1) * Cc
    if not n_other:
        ox = oy = om = ok_ = jnp.zeros((NA, 8), f32)

    # consolidate: pad every section to a 128-lane multiple (tile-aligned
    # in-kernel slices) and concatenate — one input DMA per grid step.
    # Coordinate pads park at 1e9 (out-of-grid bins) and weight pads at 0.
    named = [("params", params, 0.0),
             ("px", px, 1e9), ("py", py, 1e9),
             ("vx", vx, 1e9), ("vy", vy, 1e9), ("vm", vm, 0.0),
             ("mx", mx, 1e9), ("my", my, 1e9), ("mm", mm, 0.0),
             ("ox", ox, 1e9), ("oy", oy, 1e9), ("om", om, 0.0),
             ("ok", ok_, 0.0)]
    offs = {}
    parts = []
    off = 0
    for name, arr, fill in named:
        w = arr.shape[1]
        pw = -(-w // 128) * 128
        if pw != w:
            arr = jnp.pad(arr, ((0, 0), (0, pw - w)), constant_values=fill)
        offs[name] = (off, w, pw)
        parts.append(arr)
        off += pw
    if sections:
        return dict(zip([n for n, _, _ in named], parts)), offs, n_other
    tab = jnp.concatenate(parts, axis=1)                       # (N, off)
    return tab, offs, n_other


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7, 8, 9))
def fused_grid_channels(cfg: EnvConfig, G: int, states,
                        block_envs: int = 8, interpret: bool = False,
                        _only: str | None = None,
                        out_dtype: str = "int32",
                        layout: str = "sections",
                        _vmax: str = "block",
                        agents: int = 1):
    """(N*agents, 8, G, G) int32 (or saturating int16 when
    out_dtype="int16") — all grid channels for a batched GameState,
    bin-exact vs jax.vmap of obs/grid.py grid_frame; with agents > 1 the
    rows interleave per-agent frames ((N, A) row-major, see
    _build_grid_table).
    _only / layout / _vmax: see _make_kernel (benchmark ablations; the
    separate-inputs 'sections' layout is the production default — same
    finding as fused_screen, the concat copies cost more than the extra
    per-grid-step DMA setups)."""
    N = states.ticks.shape[0] * agents
    BE = _block_size(N, block_envs)
    secs_or_tab, offs, n_other = _build_grid_table(
        cfg, G, states, sections=(layout == "sections"), agents=agents)
    odt = dict(int32=jnp.int32, int16=jnp.int16, int8=jnp.int8)[out_dtype]
    ROWS = G * G // 128
    if layout == "sections":
        names = tuple(secs_or_tab.keys())
        arrs = [secs_or_tab[n] for n in names]
        kernel = _make_kernel(cfg, G, BE, n_other, offs, _only, odt,
                              multi=names, _vmax=_vmax)
        in_specs = [pl.BlockSpec((BE, a.shape[1]), lambda i: (i, 0))
                    for a in arrs]
    else:
        arrs = [secs_or_tab]
        kernel = _make_kernel(cfg, G, BE, n_other, offs, _only, odt,
                              _vmax=_vmax)
        in_specs = [pl.BlockSpec((BE, secs_or_tab.shape[1]),
                                 lambda i: (i, 0))]
    out = pl.pallas_call(
        kernel,
        grid=(N // BE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BE, 8, ROWS, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 8, ROWS, 128), odt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*arrs)
    # (ROWS, 128) is the same row-major bytes as (G, G): free reshape
    return out.reshape(N, 8, G, G)


_CH_ORDER = dict(oob=0, pel_presence=1, pel_count=2, vir_max=3, vir_add=4,
                 own=5, oth_min=6, oth_max=7)


def _select_channels(ocfg: GridObsConfig, all_ch, agents: int = 1):
    """(N*A, 8, G, G) -> (N, A, C, G, G) with the ocfg's channel
    selection."""
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
    na = sel.shape[0]
    return sel.reshape((na // agents, agents) + sel.shape[1:])


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_grid_frame(cfg: EnvConfig, ocfg: GridObsConfig, states,
                     block_envs: int = 8, interpret: bool = False):
    """(N, A, C, G, G) int32 — batched grid frames with the ocfg's channel
    selection, matching jax.vmap(grid_frame) exactly (one frame per
    agent; multi-agent configs rasterize as virtual env rows)."""
    assert supports(cfg, ocfg)
    A = cfg.num_agents
    all_ch = fused_grid_channels(cfg, ocfg.grid_size, states, block_envs,
                                 interpret, None, ocfg.out_dtype,
                                 "sections", "block", A)
    return _select_channels(ocfg, all_ch, A)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_grid_frame_from_secs(cfg: EnvConfig, ocfg: GridObsConfig, secs,
                               block_envs: int = 32,
                               interpret: bool = False):
    """(N, 1, C, G, G) — grid frames from TICK-EMITTED sections
    (fused_engine_tick(grid_tab=True)): the identical rasterizer kernel,
    but the XLA table build (and its ~2 ms/step of state transposes at
    8192 envs) never runs — the tick kernel wrote the sections from its
    post-tick VMEM state. Bin-exact vs fused_grid_frame on the same
    post-tick state (tests/test_fused_tick.py)."""
    assert supports_emit(cfg, ocfg)
    G = ocfg.grid_size
    meta = section_meta(cfg)
    offs = _meta_offs(meta)
    n_other = (cfg.num_players - 1) * cfg.max_cells
    N = secs["params"].shape[0]
    BE = _block_size(N, block_envs)
    odt = dict(int32=jnp.int32, int16=jnp.int16,
               int8=jnp.int8)[ocfg.out_dtype]
    ROWS = G * G // 128
    names = tuple(n for n, _, _, _ in meta)
    arrs = [secs[n] for n in names]
    kernel = _make_kernel(cfg, G, BE, n_other, offs, None, odt,
                          multi=names, _vmax='block')
    out = pl.pallas_call(
        kernel,
        grid=(N // BE,),
        in_specs=[pl.BlockSpec((BE, a.shape[1]), lambda i: (i, 0))
                  for a in arrs],
        out_specs=pl.BlockSpec((BE, 8, ROWS, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 8, ROWS, 128), odt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*arrs)
    return _select_channels(ocfg, out.reshape(N, 8, G, G))
