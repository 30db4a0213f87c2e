"""Screen observation as a single Pallas kernel (per-env-block MXU strips).

The XLA rasterizer (obs/screen.py) is pixel-exact but bandwidth-bound: the
strip tensors (row one-hots, per-strip column masks) round-trip through HBM
between ops — measured 32 GB accessed per 2048-env 84x84 frame (~60 ms).
This kernel builds the same strips in VMEM and feeds them straight into the
MXU, so the only HBM traffic is the entity tables in and the class map out.

Geometry/semantics are identical to obs/screen.py `_class_map` (itself pinned
to the reference GL path: camera z law renderer.hpp:91-93, draw order
grid < pellets < foods < main < others < viruses, inclusive f32 circle test;
verified against the scalar numpy oracle in tests/test_screen_oracle.py):

- numerous fixed-radius classes (pellets, foods) rasterize by row-strip
  decomposition: each circle intersects at most K consecutive pixel rows,
  strip (n, k) carries `dx^2 + dy^2 <= r^2` restricted to row base_n + k, and
  coverage = (row one-hot)^T @ (strip column mask) on the MXU. Pellet strips
  carry weight 1 and food strips 4096 so one f32 accumulator holds both
  classes exactly (counts < 2^12 each, sums < 2^24).
- few-entity classes (own cells, other cells, viruses) unroll a direct
  per-entity (S, S) coverage test on the VPU.

Mosaic layout notes: entity tables arrive (E, N) (envs in sublanes — block
sublane dims may be any multiple of 8, while block lane dims must be 128-wide
or full) and are sliced per env as (1, N) rows, then transposed to (N, 1)
columns (f32 transposes lower fine; only i1 transposes don't); all row
one-hots come from (N,1)==(1,S) broadcasts.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.obs.screen import (ScreenObsConfig, _AGENT_VIEW_COLORS,
                                   _NATURAL_COLORS, _RAD_FOOD, _RAD_PELLET,
                                   _SIDES_CELL, _SIDES_FOOD, _SIDES_PELLET,
                                   _TAN_HALF_FOV, _strip_K)

_FOOD_W = 4096.0  # class weight separating food strips from pellet strips


def _block_size(n: int, want: int) -> int:
    """Largest block size <= want that divides n (the pallas grid needs
    uniform blocks; odd env counts fall back to smaller blocks rather than
    asserting out)."""
    b = min(want, n)
    while n % b:
        b -= 1
    return b


def supports(cfg: EnvConfig) -> bool:
    """The fused screen kernel covers any agent count: each agent's frame
    rasterizes as a virtual env row through the same single-camera kernel
    (_build_table(agents=A))."""
    return True


def supports_emit(cfg: EnvConfig) -> bool:
    """Whether the TICK kernel can emit this config's screen sections
    itself (fused_engine_tick(screen_tab=True) writes single-agent
    sections from its post-tick VMEM state)."""
    return cfg.num_agents == 1


def supports_polygon(ocfg) -> bool:
    """Whether polygon_edges frames can ride this kernel: the reference's
    regular fans (5-gon pellets / 7-gon foods / 50-gon cells,
    Entities.hpp:13-16) rasterize exactly via per-row half-plane
    intervals, but the wavy 150-gon virus rim (Entities.hpp:66-75) is
    CONCAVE — its row intersections are multi-interval — so fused polygon
    mode requires polygon_virus="circle" (the XLA rasterizer keeps full
    wavy fidelity). Pixel rows ride in lanes, so S <= 128.

    Round-5 note on why wavy stays XLA-only: three exact convex-cover
    decompositions were prototyped (numpy-verified against the f64 fan
    oracle) and none fit the kernel budget — (a) greedy convex
    center-fan grouping needs 31 groups (the sine rim has two curvature
    inflections per scallop), i.e. 26 virus slots x 31 = 806 strip lanes
    with near-full-height windows; (b) hull-minus-sliver needs the 15
    valley slivers split 3-ways at their inflections AND the sub-pieces
    closed against the hull chord (own-chord closures leave covered
    gaps, measured 0.8%-of-area mismatch), landing at 45-60 sub-pieces =
    1170+ lanes; (c) ray-cast parity over the 150 static segments is
    one-lane-per-(virus, segment) = 3900 lanes. All three cost more VPU
    work than the entire current kernel. Two future levers: (d) the
    150-gon rim deviates from the SMOOTH polar curve 1 + sin(15*theta)/15
    by only ~2.2e-4 relative (chord sag), far inside the 1e-3 fan-oracle
    sandwich band, so per-(env, virus, strip-row) interval tables can be
    solved on the smooth curve in XLA (asin/sin available there; ~11 MB
    of tables at 2048 envs) and fed to the kernel as sections — the open
    problem is robustly enumerating multi-interval grazing rows without
    a 30-bracket bisection per row; and (e) per-lane window clamping
    with a two-pass tall/short convex-piece split (~1300 vregs/env,
    ~75-85% of circle mode) — measured estimates, not yet built."""
    return (ocfg.polygon_edges and ocfg.polygon_virus == "circle"
            and ocfg.screen_len <= 128)


def _poly_edges(n_sides: int):
    """Static half-plane constants of the reference's regular n-gon fan
    (circumradius 1, first rim vertex at angle delta = 2*pi/n,
    renderables.hpp:191-200): edge t connects vertices at angles
    (t+1)*delta and (t+2)*delta, outward normal at (t+1.5)*delta, support
    cos(pi/n). Returns (rights, lefts, flats): rights/lefts are
    (inv_a, b) with a = cos(normal) > 0 / < 0 (x <= / >= (c2*r - b*dy)/a);
    flats are (b,) pure-row conditions (b*dy <= c2*r)."""
    import math as m
    d = 2.0 * m.pi / n_sides
    rights, lefts, flats = [], [], []
    for t in range(n_sides):
        phi = (t + 1.5) * d
        a = m.cos(phi)
        b = m.sin(phi)
        if abs(a) < 1e-9:
            flats.append(b)
        elif a > 0:
            rights.append((1.0 / a, b))
        else:
            lefts.append((1.0 / a, b))
    return rights, lefts, flats


def section_meta(cfg: EnvConfig):
    """Static (name, width, padded width, pad fill) rows of the kernel's
    input-section contract — shared by _build_table (XLA build) and the
    fused tick's in-kernel emission (fused_tick.py screen_tab), which
    writes the same sections from its post-tick VMEM state so the XLA
    build (+1.5 ms/step of transposes/compaction at 2048 envs,
    bench/obs_table_probe.py) never runs. NOTE: tick-emitted sections are
    NOT alive-compacted, so they are only valid with the default
    no-ladder kernel (_ladder=False draws every lane; coverage is an OR
    over entities, so lane order is semantics-free)."""
    P, Cc = cfg.num_players, cfg.max_cells
    Np, Nv = cfg.pellet_capacity, cfg.virus_capacity
    Nf = cfg.food_capacity
    n_other = (P - 1) * Cc
    ow = n_other if n_other else 1
    rows = [("params", 8, 0.0),
            ("px", Np, 1e9), ("py", Np, 1e9), ("pr2", Np, -1.0),
            ("fx", Nf, 1e9), ("fy", Nf, 1e9), ("fr2", Nf, -1.0),
            ("mx", Cc, 1e9), ("my", Cc, 1e9), ("mr2", Cc, -1.0),
            ("ox", ow, 1e9), ("oy", ow, 1e9), ("or2", ow, -1.0),
            ("vx", Nv, 1e9), ("vy", Nv, 1e9), ("vr2", Nv, -1.0)]
    return [(n, w, -(-w // 128) * 128, f) for n, w, f in rows]


def _meta_offs(meta):
    """offs dict {name: (lane offset, width, padded width)} for a meta
    list (sections mode only reads the widths)."""
    offs = {}
    off = 0
    for n, w, pw, _ in meta:
        offs[n] = (off, w, pw)
        off += pw
    return offs


def _section_Ks(cfg: EnvConfig, S: int):
    """Static strip budgets (Kp, Kf, Kv) — the _build_table expressions."""
    import math as _math
    from agarcl_tpu import constants as _C
    rv_max = _math.sqrt((_C.VIRUS_INITIAL_MASS + _C.NUMBER_OF_FOOD_HITS
                         * _C.FOOD_MASS) / _math.pi)
    return (_strip_K(_RAD_PELLET, S), _strip_K(_RAD_FOOD, S),
            _strip_K(rv_max, S))


def _packed_palette(agent_view: bool):
    """Per-class colors packed little-endian into one int32 (byte c = channel
    c), so the kernel can emit final pixels and the frame needs no gather —
    the (7, C) table lookup `_AGENT_VIEW_COLORS[cls]` lowers to a per-element
    dynamic gather on TPU (~30 ms per 2048-env 84x84 frame, 5x the rasterizer
    kernel itself). Natural mode pre-applies the RGB565 quantization (it is a
    fixed per-class mapping)."""
    import numpy as np
    if agent_view:
        tab = np.asarray(jax.device_get(_AGENT_VIEW_COLORS), np.uint32)
    else:
        rgb = np.asarray(jax.device_get(_NATURAL_COLORS), np.uint32)
        r, g, b = rgb[:, 0] >> 3, rgb[:, 1] >> 2, rgb[:, 2] >> 3
        tab = np.stack([(r << 3) | (r >> 2), (g << 2) | (g >> 4),
                        (b << 3) | (b >> 2), np.zeros_like(r)], axis=1)
    packed = (tab[:, 0] | (tab[:, 1] << 8) | (tab[:, 2] << 16)
              | (tab[:, 3] << 24)).astype(np.uint32)
    return tuple(int(x) for x in packed.view(np.int32))


def _make_kernel(cfg: EnvConfig, S: int, BE: int, Kp: int, Kf: int, Kv: int,
                 n_other: int, offs, packed_table=None,
                 _only: str | None = None, _ladder: bool = False,
                 _strip_dtype=None, multi: tuple | None = None,
                 poly: bool = False, dyn_cells: bool = False):
    """offs: {section: (lane offset, real width, padded width)} into the one
    consolidated input table (see _rasterize). _only: benchmarking knob —
    compute just one work group ('strips', 'circles', 'lines') and leave the
    rest empty. multi: section-name order for the separate-inputs layout
    (one ref per section instead of the consolidated table) — the round-1
    'one table beats 16 inputs' reading came from dispatch-polluted per-call
    timing; both layouts are kept so the chained probe can compare."""
    def on(name):
        return _only is None or _only == name
    W = cfg.arena_width
    H = cfg.arena_height
    Cc = cfg.max_cells
    Nv = cfg.virus_capacity

    def strip_count(count, x_row, y_row, r2_row, K, weight, wxT, cy, half,
                    iota_subf, delta, wy0, n_sides=None):
        """Accumulate strip-matmul coverage counts for one entity class.
        The strip predicate is the pinned f32 `dx*dx <= r*r - dy*dy` with wy
        rebuilt from the row index by the identical pixel-grid expression.
        n_sides: rasterize the reference's regular n-gon fan instead of the
        circle — the per-row covered set of a CONVEX fan is one interval
        [xlo(dy), xhi(dy)] whose bounds are maxes/mins of the <= n
        half-plane lines (_poly_edges), so the (S, Ne) work per strip row
        stays two compares; the bound arithmetic is (1, Ne) scalar rows.

        Both dot operands live in the (S, Ne) orientation — the lanes-lanes
        contraction is native on the MXU path, while the "natural" (Ne, S)
        rhs orientation pads S lanes to 128 on every operand (measured 45%
        slower). wxT is the pixel-x coordinate as an (S, 1) column (the
        bit-identical expression to the pixel-x row wx). Padding lanes carry
        x/y = 1e9 and r2 = -1, so they can never cover a pixel.
        """
        dxT = wxT - x_row                                # (S, Ne)
        dx2T = None if n_sides is not None else dxT * dxT
        r_row = jnp.sqrt(jnp.maximum(r2_row, 0.0))       # (1, Ne)
        if n_sides is not None:
            rights, lefts, flats = _poly_edges(n_sides)
            c2 = math.cos(math.pi / n_sides)
            alive_w = jnp.where(r2_row >= 0.0, weight, 0.0)  # (1, Ne)
        u = (y_row - wy0) / delta
        base = jnp.floor(u - r_row / delta) - 1.0        # (1, Ne) f32 whole
        # Clamp the strip window into [0, S-K]: every tested row is then a
        # real screen row, so the row one-hot can be ROLLED down one sublane
        # per k (1 op) instead of rebuilt (2 ops), with no wraparound. The
        # clamped window still covers all on-screen covered rows: true rows
        # lie in [ceil(u-x), floor(u+x)] (x = r/delta) and the window keeps
        # >= 1 row of slack at both ends (K = ceil(2x)+2); per-(row, entity)
        # predicates are unchanged, so masks and counts stay exact.
        base = jnp.clip(base, 0.0, jnp.float32(S - K))
        # f32 one-hots/masks throughout: Mosaic's rotate only handles 32-bit
        # data, and skipping the bf16 casts saves an op per operand (the
        # matmuls' FLOPs are negligible either way)
        R2 = jnp.where(base == iota_subf, 1.0, 0.0)      # (S, Ne) rows i
        for k in range(K):
            rows_k = base + jnp.float32(k)               # (1, Ne)
            idx = (rows_k + 0.5) * 2.0 / S - 1.0
            wyk = cy + idx * half
            dyk = wyk - y_row
            if n_sides is None:
                lim = r2_row - dyk * dyk                 # (1, Ne); pinned
                X2 = jnp.where(dx2T <= lim, weight, 0.0)  # form dx2<=r2-dy2
            else:
                c2r = c2 * r_row                         # (1, Ne)
                xhi = jnp.full_like(dyk, 3.0e38)
                xlo = jnp.full_like(dyk, -3.0e38)
                for inv_a, b in rights:
                    xhi = jnp.minimum(xhi, (c2r - b * dyk) * inv_a)
                for inv_a, b in lefts:
                    xlo = jnp.maximum(xlo, (c2r - b * dyk) * inv_a)
                for b in flats:
                    bad = b * dyk > c2r
                    xlo = jnp.where(bad, jnp.float32(3.0e38), xlo)
                X2 = jnp.where((dxT >= xlo) & (dxT <= xhi), alive_w, 0.0)
            lhs, rhs = R2, X2
            if _strip_dtype is not None:
                # one-hot rows and 0/1/4096 weights are exact in bf16;
                # accumulation stays f32 (counts < 2^24), so the packed
                # pellet/food arithmetic is unchanged bit-for-bit
                lhs = lhs.astype(_strip_dtype)
                rhs = rhs.astype(_strip_dtype)
            count = count + jax.lax.dot_general(
                lhs, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (S, S)
            if k + 1 < K:
                R2 = pltpu.roll(R2, 1, 0)
        return count

    def kernel(*refs):
        s_cols = refs[-1]                    # VMEM scratch (class columns)
        o_ref = refs[-2]
        tabs = dict(zip(multi, refs[:-2])) if multi else None
        tab = None if multi else refs[0]
        iota_lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, S), 1).astype(jnp.float32)
        iota_sub = jax.lax.broadcasted_iota(
            jnp.int32, (S, 1), 0).astype(jnp.float32)

        if _only == 'write_block':
            # floor ablation: one whole-block store, no per-env work at all
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
            return
        for be in range(BE):
            if _only == 'write':
                # floor ablation: per-env zero store, skip even the
                # param scalar reads and the class/palette select chain
                o_ref[be] = jnp.zeros((S, S), o_ref.dtype)
                continue
            def sec(name):
                if multi:
                    return tabs[name][be:be + 1, :]      # (1, padded Ne)
                o, w, pw = offs[name]
                return tab[be:be + 1, o:o + pw]          # (1, padded Ne)

            def scal(name, j):
                if multi:
                    return tabs[name][be, j]
                return tab[be, offs[name][0] + j]

            def circles_f(xn, yn, rn, n, wx, wy):
                """Direct unrolled coverage for a few-entity class: (S, S)
                f32 — two (S, S) ops per entity (broadcast compare +
                select). Unconditional per ENTITY on purpose: guarding each
                entity with a scalar lax.cond measured 2.5x SLOWER (the
                untaken branch still copies the (S, S) carry through the
                scf.if). Dead slots fall out via r2 = -1."""
                cov = jnp.zeros((S, S), jnp.float32)
                for c in range(n):
                    x = scal(xn, c)
                    y = scal(yn, c)
                    r2 = scal(rn, c)
                    dx2 = (wx - x) * (wx - x)            # (1, S) cheap
                    dy = wy - y                          # (S, 1)
                    lim = r2 - dy * dy                   # (S, 1); pinned
                    cov = jnp.where(dx2 <= lim, 1.0, cov)  # dx2<=r2-dy2
                return cov

            def circles_dyn(xn, yn, rn, n, wx, wy, cnt):
                """Coverage via a DYNAMIC fori over the class's live
                count (round 5): sections are compacted alive-first, so
                only the first `cnt` lanes can cover. The unrolled path
                pays 2 (S, S) ops for every CAPACITY slot (32 for the
                16-cell own class) on every env; this loop pays ~3 per
                LIVE cell (compare+select+carry) — the common 1-2-cell
                regime skips ~90% of the class's work. MEASURED OFF by
                default (round 5): on hardware the dynamic-bound scf.while
                serializes the block's software pipeline — screen 84/2048
                regressed 620k -> 540k despite the op savings (the same
                mechanism that killed the scf.if count ladder); kept as a
                knob for shapes with much larger capacity/live ratios.
                Bit-identical to the unroll: same select chain, same
                order, dead slots beyond cnt cannot cover (r2 = -1)."""
                xcol = jnp.transpose(sec(xn))          # (padded, 1)
                ycol = jnp.transpose(sec(yn))
                rcol = jnp.transpose(sec(rn))
                s_cols[0:n, 0:1] = xcol[:n]
                s_cols[0:n, 1:2] = ycol[:n]
                s_cols[0:n, 2:3] = rcol[:n]

                def body(c, cov):
                    x = s_cols[pl.ds(c, 1), 0:1]       # (1, 1)
                    y = s_cols[pl.ds(c, 1), 1:2]
                    r2 = s_cols[pl.ds(c, 1), 2:3]
                    dx2 = (wx - x) * (wx - x)          # (1, S)
                    lim = r2 - (wy - y) * (wy - y)     # (S, 1)
                    return jnp.where(dx2 <= lim, 1.0, cov)

                cov = jax.lax.fori_loop(
                    0, cnt.astype(jnp.int32), body,
                    jnp.zeros((S, S), jnp.float32))
                return cov >= 0.5

            def circles(xn, yn, rn, n, wx, wy, cnt=None):
                """Coverage for a cell class. cnt (f32 scalar, params[3]/
                [4]): "1 + highest live slot" — equals the live count for
                the XLA build's compacted-alive-first sections, and bounds
                the live region for the tick-emitted UNCOMPACTED sections.
                Default path: circles_dyn (dynamic fori to cnt). The
                legacy cnt ladder ladders the unroll per ENV — one scf.if pair per
                class copies two (S, S) carries but skips 2*(n-k) ops in
                the common 1-2 live-cell regime.

                Default OFF: chained-program ablation (screen_floor_probe,
                2048 envs mode 1) measured the ladder 0.29 ms/frame SLOWER
                than unconditional draws (1.98 vs 1.69 ms circles-only) —
                the scf.if carry copies outweigh the skipped draws, same
                mechanism as the per-entity conds. It also regressed the
                duel-screen bench (295k -> 267k, two laddered classes)."""
                if dyn_cells and cnt is not None and not _ladder and n > 4:
                    return circles_dyn(xn, yn, rn, n, wx, wy, cnt)
                if not _ladder:
                    cnt = None
                if cnt is None or n <= 4:
                    return circles_f(xn, yn, rn, n, wx, wy) >= 0.5
                cov = jax.lax.cond(
                    cnt <= 2.0,
                    lambda: circles_f(xn, yn, rn, 2, wx, wy),
                    lambda: jax.lax.cond(
                        cnt <= 6.0,
                        lambda: circles_f(xn, yn, rn, 6, wx, wy),
                        lambda: circles_f(xn, yn, rn, n, wx, wy)))
                return cov >= 0.5

            def cells_poly(xn, yn, rn, n, wxT_, wyL, n_sides):
                """(S, S) bool n-gon fan coverage for a cell class, built
                TRANSPOSED (covT[j, i] = pixel col j, row i): the per-row
                interval bounds [xlo(dy), xhi(dy)] (maxes/mins of the
                _poly_edges half-plane lines) ride (n, S) tiles with cells
                in sublanes and pixel ROWS in lanes (2 vregs at S <= 128),
                each cell then costs two (S, S) compares like the circle
                path; one f32 transpose per class flips covT back."""
                rights, lefts, flats = _poly_edges(n_sides)
                c2 = math.cos(math.pi / n_sides)
                # (n, 1) columns of the class's x / y / r via one 32-bit
                # transpose each (sec rows are (1, padded Ne))
                xcol = jnp.transpose(sec(xn))[:n]
                ycol = jnp.transpose(sec(yn))[:n]
                r2col = jnp.transpose(sec(rn))[:n]
                rcol = jnp.sqrt(jnp.maximum(r2col, 0.0))
                dy = wyL - ycol                          # (n, S)
                c2r = c2 * rcol
                xhi = jnp.full(dy.shape, 3.0e38, jnp.float32)
                xlo = jnp.full(dy.shape, -3.0e38, jnp.float32)
                for inv_a, b in rights:
                    xhi = jnp.minimum(xhi, (c2r - b * dy) * inv_a)
                for inv_a, b in lefts:
                    xlo = jnp.maximum(xlo, (c2r - b * dy) * inv_a)
                for b in flats:
                    xlo = jnp.where(b * dy > c2r, jnp.float32(3.0e38), xlo)
                # dead slots (r2 = -1) and padding lanes can never cover
                xlo = jnp.where(r2col >= 0.0, xlo, jnp.float32(3.0e38))
                xloa = xlo + xcol                        # absolute wx bounds
                xhia = xhi + xcol
                covT = jnp.zeros((S, S), jnp.float32)
                for c in range(n):
                    pred = ((wxT_ >= xloa[c:c + 1]) & (wxT_ <= xhia[c:c + 1]))
                    covT = jnp.where(pred, 1.0, covT)    # (S,1)x(1,S)->(S,S)
                return jnp.transpose(covT) >= 0.5

            cx = scal('params', 0)
            cy = scal('params', 1)
            half = scal('params', 2)
            wx = cx + ((iota_lane + 0.5) * 2.0 / S - 1.0) * half   # (1, S)
            wy = cy + ((iota_sub + 0.5) * 2.0 / S - 1.0) * half    # (S, 1)
            # pixel-x coords as a column — bit-identical expression to wx
            wxT = cx + ((iota_sub + 0.5) * 2.0 / S - 1.0) * half   # (S, 1)
            # pixel-y coords as a ROW (cells_poly bound tables)
            wyL = cy + ((iota_lane + 0.5) * 2.0 / S - 1.0) * half  # (1, S)
            ph = half / S
            delta = 2.0 * half / S
            wy0 = cy + (0.5 * 2.0 / S - 1.0) * half

            false2d = jnp.zeros((S, S), bool)
            if on('lines'):
                # 8x8 arena grid lines (renderables.hpp:245-340)
                on_v = jnp.zeros((1, S), jnp.float32)
                on_h = jnp.zeros((S, 1), jnp.float32)
                for k in range(8):
                    t = jnp.float32(k) / 7.0
                    on_v = jnp.maximum(
                        on_v, jnp.where(jnp.abs(wx - t * W) <= ph, 1.0, 0.0))
                    on_h = jnp.maximum(
                        on_h, jnp.where(jnp.abs(wy - t * H) <= ph, 1.0, 0.0))
                in_x = jnp.where((wx >= -1e-3) & (wx <= W + 1e-3), 1.0, 0.0)
                in_y = jnp.where((wy >= -1e-3) & (wy <= H + 1e-3), 1.0, 0.0)
                gridm = (jnp.maximum(on_v, on_h) * in_x * in_y) >= 0.5
            else:
                gridm = false2d

            # pellet + food strips share one f32 accumulator
            if on('strips'):
                count = jnp.zeros((S, S), jnp.float32)
                count = strip_count(count, sec('px'), sec('py'), sec('pr2'),
                                    Kp, 1.0, wxT, cy, half, iota_sub, delta,
                                    wy0,
                                    n_sides=_SIDES_PELLET if poly else None)
                count = strip_count(count, sec('fx'), sec('fy'), sec('fr2'),
                                    Kf, _FOOD_W, wxT, cy, half, iota_sub,
                                    delta, wy0,
                                    n_sides=_SIDES_FOOD if poly else None)
                foods_c = jnp.floor(count * (1.0 / _FOOD_W))
                pel = (count - foods_c * _FOOD_W) >= 0.5
                foo = foods_c >= 0.5
            else:
                pel = foo = false2d

            if on('circles'):
                if poly:
                    mine = cells_poly('mx', 'my', 'mr2', Cc, wxT, wyL,
                                      _SIDES_CELL)
                else:
                    mine = circles('mx', 'my', 'mr2', Cc, wx, wy,
                                   cnt=scal('params', 3))
                # viruses: strip pass (constant in the 26-slot capacity —
                # the direct unroll paid 2 (S, S) ops per SLOT, alive or
                # not) on a separate accumulator (a third weight class in
                # the pellet/food accumulator would overflow f32's 24
                # integer bits)
                vacc = strip_count(jnp.zeros((S, S), jnp.float32),
                                   sec('vx'), sec('vy'), sec('vr2'),
                                   Kv, 1.0, wxT, cy, half, iota_sub,
                                   delta, wy0)
                vir = vacc >= 0.5
            else:
                mine = vir = false2d

            cls = jnp.where(gridm, 1, 0)
            cls = jnp.where(pel, 2, cls)
            cls = jnp.where(foo, 3, cls)
            cls = jnp.where(mine, 4, cls)
            if n_other and on('circles'):
                if poly:
                    oth = cells_poly('ox', 'oy', 'or2', n_other, wxT, wyL,
                                     _SIDES_CELL)
                else:
                    oth = circles('ox', 'oy', 'or2', n_other, wx, wy,
                                  cnt=scal('params', 4))
                cls = jnp.where(oth, 5, cls)
            cls = jnp.where(vir, 6, cls)
            if packed_table is not None:
                px_out = jnp.full((S, S), packed_table[0], jnp.int32)
                for k in range(1, 7):
                    px_out = jnp.where(cls == k, jnp.int32(packed_table[k]),
                                       px_out)
                o_ref[be] = px_out
            else:
                o_ref[be] = cls

    return kernel


def _build_table(cfg: EnvConfig, S: int, states, _ablate=None,
                 agents: int = 1):
    """Entity input tables + section offsets + n_other (see _rasterize).
    _ablate='sections' (the production layout) returns the padded sections
    as a dict for _rasterize_sections instead of concatenating them;
    _ablate='nocompact' skips the alive-first cell sort (timing only —
    the count ladder then draws wrong lanes).
    agents>1 builds one virtual env row per (env, agent) pair — row
    n*agents + a carries agent a's camera, its cells as "main" and every
    other player's cells as "others" (obs/screen.py _class_map owner-mask
    semantics) — so the same single-agent kernel rasterizes multi-agent
    frames; the caller reshapes (N*A, ...) -> (N, A, ...)."""
    N = states.ticks.shape[0]
    P, Cc = states.cell_mass.shape[1:]
    A = agents
    NA = N * A

    centroid = states.player_centroid()[:, :A, :].reshape(NA, 2)
    pmass = states.player_mass()[:, :A].astype(jnp.float32).reshape(NA)
    z = jnp.clip(100.0 + pmass / 10.0, 100.0, 900.0)
    half = z * jnp.float32(_TAN_HALF_FOV)

    def rep(x):
        """(N, Ne) -> (N*A, Ne): shared entity tables repeated per agent
        (free for A == 1)."""
        if A == 1:
            return x
        return jnp.broadcast_to(x[:, None], (N, A) + x.shape[1:]).reshape(
            (NA,) + x.shape[1:])

    def cols(pos, alive, r):
        """(N, Ne) x/y plus alive-masked squared radius (dead -> -1)."""
        r2 = jnp.where(alive, r * r, -1.0)
        return pos[:, :, 0], pos[:, :, 1], r2

    def compact(x, y, r2, alive):
        """Alive-first lane order + live count: the kernel's per-env count
        ladder then draws only the first k lanes (coverage is an OR over
        entities, so the reorder is semantics-free)."""
        if _ablate == 'nocompact':
            return x, y, r2, jnp.sum(alive, axis=1).astype(jnp.float32)
        order = jnp.argsort(~alive, axis=1, stable=True)
        take = functools.partial(jnp.take_along_axis, indices=order, axis=1)
        return (take(x), take(y), take(r2),
                jnp.sum(alive, axis=1).astype(jnp.float32))

    rp = jnp.float32(_RAD_PELLET)
    rf = jnp.float32(_RAD_FOOD)
    pellet_pos, pellet_alive = states.pellet_xy_alive(cfg)
    px, py, pr2 = (rep(c) for c in cols(pellet_pos, pellet_alive, rp))
    fx, fy, fr2 = (rep(c) for c in cols(states.food_pos, states.food_alive,
                                        rf))
    crad = jnp.sqrt(states.cell_mass.astype(jnp.float32) / jnp.pi)
    n_other = (P - 1) * Cc

    def main_other(a):
        mx_, my_, mr2_ = cols(states.cell_pos[:, a],
                              states.cell_alive[:, a], crad[:, a])
        mx_, my_, mr2_, mcnt_ = compact(mx_, my_, mr2_,
                                        states.cell_alive[:, a])
        oth = [p for p in range(P) if p != a]
        if oth:
            opos = states.cell_pos[:, oth].reshape(N, n_other, 2)
            oalive = states.cell_alive[:, oth].reshape(N, n_other)
            orad = crad[:, oth].reshape(N, n_other)
            ox_, oy_, or2_ = cols(opos, oalive, orad)
            ox_, oy_, or2_, ocnt_ = compact(ox_, oy_, or2_, oalive)
        else:
            ox_ = oy_ = or2_ = jnp.zeros((N, 1), jnp.float32)
            ocnt_ = jnp.zeros((N,), jnp.float32)
        return mx_, my_, mr2_, mcnt_, ox_, oy_, or2_, ocnt_

    if A == 1:
        mx, my, mr2, mcnt, ox, oy, or2, ocnt = main_other(0)
    else:
        colsA = [main_other(a) for a in range(A)]
        mx, my, mr2, mcnt, ox, oy, or2, ocnt = (
            jnp.stack([c[i] for c in colsA], axis=1).reshape(
                (NA,) + colsA[0][i].shape[1:])
            for i in range(8))
    vrad = jnp.sqrt(states.virus_mass.astype(jnp.float32) / jnp.pi)
    vx, vy, vr2 = (rep(c)
                   for c in cols(states.virus_pos, states.virus_alive,
                                 vrad))

    params = jnp.zeros((NA, 8), jnp.float32)
    params = params.at[:, 0].set(centroid[:, 0])
    params = params.at[:, 1].set(centroid[:, 1])
    params = params.at[:, 2].set(half)
    params = params.at[:, 3].set(mcnt)
    params = params.at[:, 4].set(ocnt)

    Kp = _strip_K(_RAD_PELLET, S)
    Kf = _strip_K(_RAD_FOOD, S)
    # virus strip budget: masses peak at VIRUS_INITIAL_MASS + 7 hits * 10
    # (the 8th hit bursts back to 100), radius law sqrt(m/pi)
    import math as _math
    from agarcl_tpu import constants as _C
    rv_max = _math.sqrt((_C.VIRUS_INITIAL_MASS + _C.NUMBER_OF_FOOD_HITS
                         * _C.FOOD_MASS) / _math.pi)
    Kv = _strip_K(rv_max, S)

    # consolidate: pad every section to a 128-lane multiple (slices inside
    # the kernel stay tile-aligned) and concatenate. Coordinate pads park at
    # 1e9 and radius pads at -1 so padding lanes never rasterize.
    named = [("params", params, 0.0),
             ("px", px, 1e9), ("py", py, 1e9), ("pr2", pr2, -1.0),
             ("fx", fx, 1e9), ("fy", fy, 1e9), ("fr2", fr2, -1.0),
             ("mx", mx, 1e9), ("my", my, 1e9), ("mr2", mr2, -1.0),
             ("ox", ox, 1e9), ("oy", oy, 1e9), ("or2", or2, -1.0),
             ("vx", vx, 1e9), ("vy", vy, 1e9), ("vr2", vr2, -1.0)]
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
    if _ablate == 'sections':
        # separate-inputs layout: skip the concat, hand each padded
        # section to the kernel as its own ref (padding fills still
        # guarantee dead lanes can't rasterize)
        return dict(zip([n for n, _, _ in named], parts)), offs, n_other, \
            (Kp, Kf, Kv)
    tab = jnp.concatenate(parts, axis=1)                       # (N, off)
    return tab, offs, n_other, (Kp, Kf, Kv)


def _rasterize_sections(cfg: EnvConfig, S: int, secs, offs, n_other, Ks,
                        block_envs: int, interpret: bool,
                        packed_table=None, _only=None, _ladder=False,
                        _strip_dtype=None, poly: bool = False):
    """pallas_call with one input ref per section (vs the consolidated
    table of _rasterize_table); see _make_kernel's `multi` note."""
    names = tuple(secs.keys())
    arrs = [secs[n] for n in names]
    N = arrs[0].shape[0]
    BE = _block_size(N, block_envs)
    Kp, Kf, Kv = Ks
    kernel = _make_kernel(cfg, S, BE, Kp, Kf, Kv, n_other,
                          {k: v for k, v in offs.items()}, packed_table,
                          _only, _ladder, _strip_dtype, multi=names,
                          poly=poly)
    rows = -(-max(cfg.max_cells, n_other, 8) // 8) * 8
    return pl.pallas_call(
        kernel,
        grid=(N // BE,),
        in_specs=[pl.BlockSpec((BE, a.shape[1]), lambda i: (i, 0))
                  for a in arrs],
        out_specs=pl.BlockSpec((BE, S, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*arrs)


def _rasterize_table(cfg: EnvConfig, S: int, tab, offs, n_other, Ks,
                     block_envs: int, interpret: bool,
                     packed_table=None, _only=None, _ladder=False,
                     _strip_dtype=None):
    """pallas_call on a prebuilt table (see _build_table)."""
    N, off = tab.shape
    BE = _block_size(N, block_envs)
    Kp, Kf, Kv = Ks
    kernel = _make_kernel(cfg, S, BE, Kp, Kf, Kv, n_other,
                          {k: v for k, v in offs.items()}, packed_table,
                          _only, _ladder, _strip_dtype)
    rows = -(-max(cfg.max_cells, n_other, 8) // 8) * 8
    return pl.pallas_call(
        kernel,
        grid=(N // BE,),
        in_specs=[pl.BlockSpec((BE, off), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BE, S, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab)


def _rasterize(cfg: EnvConfig, S: int, states, block_envs: int,
               interpret: bool, packed_table=None, _only=None,
               agents: int = 1, poly: bool = False):
    """(N*agents, S, S) int32: class ids, or final packed pixels when
    packed_table is given (see _packed_palette). Entity sections ride as
    SEPARATE kernel inputs (128-lane-padded each): the chained e2e probe
    measured this 0.39 ms/frame cheaper than the consolidated-table layout
    at 2048 envs (the concat copies cost more than the extra per-grid-step
    DMAs — the round-1 'one table beats 16 inputs' reading was
    dispatch-polluted). agents>1: one row per (env, agent), row-major."""
    assert supports(cfg)
    secs, offs, n_other, Ks = _build_table(cfg, S, states,
                                           _ablate='sections',
                                           agents=agents)
    return _rasterize_sections(cfg, S, secs, offs, n_other, Ks, block_envs,
                               interpret, packed_table, _only, poly=poly)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4, 5))
def fused_screen_class_map(cfg: EnvConfig, S: int, states,
                           block_envs: int = 8, interpret: bool = False,
                           poly: bool = False):
    """(N, A, S, S) int32 class map for a batched GameState (one map per
    agent). Circle mode: pixel-exact vs jax.vmap of obs/screen.py
    `_class_map`. poly: regular-fan silhouettes (see supports_polygon) —
    ORACLE-exact rather than bit-identical to the XLA path: the fused
    rasterizer tests f32 half-plane row intervals while the XLA path uses
    the polar cos-form radius factor, so borderline pixels can legitimately
    differ; both rasterizers sit inside the float64 fan-oracle sandwich
    (tests/test_polygon_screen.py)."""
    A = cfg.num_agents
    out = _rasterize(cfg, S, states, block_envs, interpret, agents=A,
                     poly=poly)
    return out.reshape((out.shape[0] // A, A) + out.shape[1:])


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_screen_frame_from_secs(cfg: EnvConfig, ocfg: ScreenObsConfig,
                                 secs, block_envs: int = 8,
                                 interpret: bool = False):
    """(N, 1, S, S, 3|4) uint8 — screen frames from TICK-EMITTED sections
    (fused_engine_tick(screen_tab=True)): the identical no-ladder
    rasterizer, no XLA table build. Pixel-exact vs fused_screen_frame on
    the same post-tick state (tests/test_fused_tick.py; tick sections are
    uncompacted, which only the OFF-by-default count ladder would
    notice)."""
    S = ocfg.screen_len
    meta = section_meta(cfg)
    offs = _meta_offs(meta)
    n_other = (cfg.num_players - 1) * cfg.max_cells
    Ks = _section_Ks(cfg, S)
    poly = ocfg.polygon_edges
    if poly:
        assert supports_polygon(ocfg)
    ordered = {n: secs[n] for n, _, _, _ in meta}
    packed = _rasterize_sections(cfg, S, ordered, offs, n_other, Ks,
                                 block_envs, interpret,
                                 packed_table=_packed_palette(
                                     ocfg.agent_view), poly=poly)
    out = jax.lax.bitcast_convert_type(packed, jnp.uint8)     # (N, S, S, 4)
    if not ocfg.agent_view:
        out = out[..., :3]
    return out[:, None]                                       # (N,1,S,S,3|4)


@functools.partial(jax.jit, static_argnums=(0, 1, 3, 4))
def fused_screen_frame(cfg: EnvConfig, ocfg: ScreenObsConfig, states,
                       block_envs: int = 8, interpret: bool = False):
    """(N, A, S, S, 3|4) uint8 — batched screen frames (one per agent;
    multi-agent configs rasterize as virtual env rows). The kernel emits
    final packed pixels (one int32 per pixel, byte c = channel c); a bitcast
    unpacks them, so no palette gather ever touches HBM."""
    A = cfg.num_agents
    poly = ocfg.polygon_edges
    if poly:
        assert supports_polygon(ocfg), (
            "fused polygon mode needs polygon_virus='circle' and "
            "screen_len <= 128 (wavy rims are XLA-only)")
    packed = _rasterize(cfg, ocfg.screen_len, states, block_envs, interpret,
                        _packed_palette(ocfg.agent_view), agents=A,
                        poly=poly)
    out = jax.lax.bitcast_convert_type(packed, jnp.uint8)    # (N*A, S, S, 4)
    if not ocfg.agent_view:
        out = out[..., :3]
    return out.reshape((out.shape[0] // A, A) + out.shape[1:])
