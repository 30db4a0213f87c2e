"""Fused tick: the whole engine tick as ONE Pallas kernel.

Why: the XLA op-graph tick materializes dozens of padded intermediates per
tick — cost analysis shows ~45 GB of HBM traffic per 8192-env step (vs ~70 MB
of true state), capping throughput near 75k env-steps/s/chip. This kernel
keeps each env block's entire state in VMEM across all phases of a tick and
touches HBM exactly twice per block (read state, write state).

Layout — env-in-lanes: every array inside the kernel is (feature..., E) with
the env-block axis E LAST, so the 128-wide vector lanes are always fully
packed by envs (E a multiple of 128). Feature axes (P*Cc cells, pellet
chunks, virus slots) live in sublanes; pairwise tensors are (Ci, Cj, E).
The wrapper feeds transposed (feature, N) arrays so the kernel needs no
relayouts. The earlier (env, feature) orientation padded every 16-wide cell
axis to 128 lanes — an 8x VPU/VMEM waste.

Mosaic lowering rules baked in (each was a discovered blocker):
no dynamic_slice (static chunk slices), no cumsum (log-shift prefix sums),
no atan (algebraic cos/sin), no i1 minor-dim inserts / transposes / bitcasts
/ concats (bool work routes through int32 selects; env-last keeps bool
broadcasts on leading dims, which are legal), no uint32->f32 casts (via
int32), and scf.for cannot carry i1 (loop carries are int32).

Scope: num_players <= 9 (supports()). Cells are flat (P*Cc, E) with
per-player phases running on static per-player slices; the four scripted
bot policies (engine/bots.py, /root/reference/agario/bots/*.hpp) and
cross-player eating (Engine.hpp:150-200) run in-kernel, so the duel modes
7-10 and small mode-0 rosters stay on the fused fast path. Semantics
identical to the XLA tick (same SPEC.md pins); tests/test_fused_tick.py
checks field-exact agreement, and the C++ oracle transitively covers it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState
from agarcl_tpu.state import pellet_scales as _pellet_scales

_BIG = np.float32(3.4e38)
_BIG_I = np.int32(2**30)
_GOLDEN = np.uint32(0x9E3779B9)
# dead pellets park at this coordinate in the kernel's WORKING copies
# (pxw/pyw): eligibility then needs no alive-mask ops — (1e9)^2 ~ 1e18
# overflows no f32 and can never satisfy d2 <= r2 (radii < 1e4). Aliveness
# derives back as pxw < _DEAD_MIN at writeback.
_DEAD = np.float32(1e9)
_DEAD_MIN = np.float32(1e8)


# ------------------------------------------------------------------ helpers
def _mix(h):
    h = h ^ (h >> 16)
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _block_size(n: int, want: int) -> int:
    """Largest block size <= want that divides n (the pallas grid needs
    uniform blocks; odd env counts fall back to smaller blocks rather than
    asserting out)."""
    b = min(want, n)
    while n % b:
        b -= 1
    return b


def _hash_u32(seed, stream, tick, slot, axis):
    h = seed.astype(jnp.uint32) * _GOLDEN
    for v in (stream, tick, slot, axis):
        h = _mix(h ^ (jnp.asarray(v).astype(jnp.uint32) * _GOLDEN))
    return h


def _uniform(lo, hi, seed, stream, tick, slot, axis):
    bits = _hash_u32(seed, stream, tick, slot, axis) >> jnp.uint32(8)
    # Mosaic lacks uint32->float32; bits fit in int32 after the shift
    u = bits.astype(jnp.int32).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    return lo + (hi - lo) * u


def _uniform_q(nq, seed, stream, tick, slot, axis):
    """int32 in [0, nq) — the exact-integer draw (prng.uniform_q) for the
    quantized pellet spawn; must stay op-for-op identical to prng.py."""
    u24 = (_hash_u32(seed, stream, tick, slot, axis)
           >> jnp.uint32(8)).astype(jnp.int32)
    hi = u24 >> 12
    lo = u24 & 0xFFF
    return (hi * np.int32(nq) + ((lo * np.int32(nq)) >> 12)) >> 12


def _radius(mass):
    return jnp.sqrt(mass.astype(jnp.float32) / jnp.pi)


def _max_speed(mass):
    # negative-exponent product, matching engine/geometry.py::max_speed's
    # pinned formulation (round 5)
    m = jnp.maximum(mass.astype(jnp.float32), 1.0)
    return C.CELL_MAX_SPEED * jnp.power(m, -0.439)


def _split_speed(mass):
    return jnp.clip(3.0 * jnp.power(_max_speed(mass), 1.2), 20.0, 130.0)


def _dir_cos_sin(dx, dy):
    """cos/sin of the reference's quirky direction() = atan(dx/dy) with
    +-pi corrections for dx<0 — computed algebraically (no atan in Mosaic)."""
    both_zero = (dx == 0.0) & (dy == 0.0)
    dy_safe = jnp.where(dy == 0.0, 1.0, dy)
    t = dx / dy_safe
    inv = jax.lax.rsqrt(1.0 + t * t)
    c = jnp.where(dy == 0.0, 0.0, inv)
    s = jnp.where(dy == 0.0, jnp.sign(dx), t * inv)
    flip = dx < 0
    c = jnp.where(flip, -c, c)
    s = jnp.where(flip, -s, s)
    c = jnp.where(both_zero, 1.0, c)
    s = jnp.where(both_zero, 0.0, s)
    return c, s


def _decel(vx, vy, decel, dt):
    mag = jnp.sqrt(vx * vx + vy * vy)
    inv = 1.0 / jnp.maximum(mag, 1e-12)
    ddx = vx * inv * (decel * dt)
    ddy = vy * inv * (decel * dt)
    nx = jnp.where(jnp.abs(ddx) <= jnp.abs(vx), vx - ddx, 0.0)
    ny = jnp.where(jnp.abs(ddy) <= jnp.abs(vy), vy - ddy, 0.0)
    return nx, ny


def _cumsum0(x):
    """Inclusive prefix sum along axis 0 via log-shift adds. x: (F, E)."""
    F, E = x.shape
    acc = x
    d = 1
    while d < F:
        shifted = jnp.concatenate(
            [jnp.zeros((d, E), acc.dtype), acc[:F - d]], axis=0)
        acc = acc + shifted
        d *= 2
    return acc


def _bint(b):
    return jnp.where(b, 1, 0)


# ------------------------------------------------------------------ kernel
def _make_kernel(cfg: EnvConfig, phases: int = 99,
                 n_ticks: int = 1, sub: int = 99, ram_obs=None,
                 grid_tab: bool = False, screen_tab: bool = False,
                 loo: int = 0, n_steps: int = 0):
    # n_steps >= 1 turns the kernel into a MULTI-ENV-STEP kernel: per step
    # it applies the (shared) agent actions (env.py::apply_actions
    # semantics), runs n_ticks engine ticks, emits that step's RAM frame
    # into its slice of the obs output, and records per-step per-player
    # (mass, alive) rows into a trailing step-info output — the XLA rim
    # (ops/fused_step.py::fused_env_multi_step) reconstructs rewards and
    # dones from those. This amortizes the per-CALL state HBM round trip
    # (~0.76 ms at 8192 envs, bench/tick_ablate.py phases=0) across
    # n_steps env steps — the dominant term once the obs extraction was
    # keyed (bench/step_attrib.py: kernel 1.76 ms, obs +0.06, tail ~0).
    # loo ("leave one out") skips ONE block for hardware attribution
    # (bench/tick_ablate.py --loo; timing-only, semantics break):
    #   1 relax, 2 virus events, 4 food-eat, 5 feed, 6 split-sord,
    #   7 foods-move, 8 regen, 9 placement, 10 recombine, 11 decay,
    #   12 cross-player eat,
    #   13 rank
    # `sub` bisects the phase-UNGATED per-tick code for hardware ablation
    # (bench/tick_ablate.py). Only meaningful at phases=0; production runs
    # (phases >= 1) force sub=99 so every downstream dependency exists.
    #   sub >= 1: per-tick pre-compute (palive_p reduce, pexpand of targets/
    #             elapsed, rank/gkey, n_start, end-of-tick dead-cell masking)
    #   sub >= 2: + movement integration
    #   sub >= 3: + action bookkeeping (split_fields x2, sord rank loop,
    #             cooldown updates)
    if phases >= 1:
        sub = 99
    P = cfg.num_players
    Cc = cfg.max_cells
    PC = P * Cc
    Np = cfg.pellet_capacity
    Nv = cfg.virus_capacity
    Nf = cfg.food_capacity
    W, H = cfg.arena_width, cfg.arena_height
    dt = np.float32(cfg.dt)
    ms = cfg.mode_spec
    bt_list = cfg.bot_types()
    # pellet key quantization constants (state.py::pellet_scales) + the
    # integer spawn-draw grid parameters (spawn.py::pellet_qparams)
    _P_SCX, _P_SCY, _P_INVX, _P_INVY = _pellet_scales(cfg)
    from agarcl_tpu.engine.spawn import pellet_qparams as _pqp
    _P_QLX, _P_NQX, _P_QLY, _P_NQY = _pqp(cfg)

    def _pellet_encode(xw, yw):
        """Parked working coords -> i32 keys (dead/_DEAD rows -> -1).
        The float clip before the int cast keeps the 1e9 park out of
        f32->i32 overflow territory."""
        qmaxf = np.float32((1 << 15) - 1)
        qx = jnp.clip(jnp.floor(xw * _P_SCX), 0.0, qmaxf).astype(jnp.int32)
        qy = jnp.clip(jnp.floor(yw * _P_SCY), 0.0, qmaxf).astype(jnp.int32)
        return jnp.where(xw < _DEAD_MIN, (qx << 15) | qy, np.int32(-1))

    def clampb(x, y, rad):
        cx_ = jnp.maximum(0.0, jnp.maximum(jnp.minimum(x, W - rad), rad))
        cy_ = jnp.maximum(0.0, jnp.maximum(jnp.minimum(y, H - rad), rad))
        return cx_, cy_

    # ---- per-player plumbing over the flat (P*Cc, E) cell axis ----------
    # Mosaic cannot slice / concat / reshape i1 vectors (it lowers them to
    # vreg bitcasts that fail to compile), so every helper routes bools
    # through int32 and compares back at the end.
    def pslice(x, p):
        if x.dtype == jnp.bool_:
            return _bint(x)[p * Cc:(p + 1) * Cc] > 0
        return x[p * Cc:(p + 1) * Cc]

    def prow(x, p):
        """Row p of a (P, E) per-player array (bool-safe)."""
        if x.dtype == jnp.bool_:
            return _bint(x)[p:p + 1] > 0
        return x[p:p + 1]

    def pcat(parts):
        if len(parts) == 1:
            return parts[0]
        if parts[0].dtype == jnp.bool_:
            return jnp.concatenate([_bint(x) for x in parts], axis=0) > 0
        return jnp.concatenate(parts, axis=0)

    def pexpand(y):
        """(P, E) per-player row -> (PC, E)-broadcastable."""
        if P == 1:
            return y
        if y.dtype == jnp.bool_:
            return pexpand(_bint(y)) > 0
        E = y.shape[-1]
        return jnp.broadcast_to(y[:, None, :], (P, Cc, E)).reshape(PC, E)

    def preduce(x, op):
        """(PC, E) -> (P, E) per-player reduction."""
        if P == 1:
            return op(x, axis=0, keepdims=True)
        E = x.shape[-1]
        return op(x.reshape(P, Cc, E), axis=1)

    def fexpand(y, F):
        """(P, E) -> (P*F, E) broadcast over a per-player F-sized axis."""
        if P == 1:
            return y
        if y.dtype == jnp.bool_:
            return fexpand(_bint(y), F) > 0
        E = y.shape[-1]
        return jnp.broadcast_to(y[:, None, :], (P, F, E)).reshape(P * F, E)

    def freduce(x, F, op):
        """(P*F, E) -> (P, E)."""
        if P == 1:
            return op(x, axis=0, keepdims=True)
        E = x.shape[-1]
        return op(x.reshape(P, F, E), axis=1)

    def rank_of(cid, calive):
        """(PC, E) per-player counting rank by id among live cells."""
        outs = []
        for p in range(P):
            key = jnp.where(pslice(calive, p), pslice(cid, p), _BIG_I)
            lt = key[None, :, :] < key[:, None, :]
            outs.append(jnp.sum(_bint(lt), axis=1))
        return pcat(outs)

    def split_fields(cx, cy, cmass, txc, tyc):
        """cell_split fields for every cell, (PC, E) arrays."""
        split_mass = cmass // 2
        remaining = jnp.maximum(cmass - split_mass, C.CELL_MIN_SIZE)
        radr = _radius(remaining)
        dx = txc - cx
        dy = tyc - cy
        n = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-12)
        dx = dx / n
        dy = dy / n
        lx = cx + dx * radr
        ly = cy + dy * radr
        lx, ly = clampb(lx, ly, radr)
        spd = _split_speed(split_mass)
        return remaining, dict(x=lx, y=ly, vx=dx * spd, vy=dy * spd,
                               mass=split_mass)

    def kernel(tx_ref, ty_ref, action_ref, split_cd_ref, feed_cd_ref,
               elapsed_ref, last_decay_ref, anti_team_ref,
               vticks_ref, vptr_ref,
               food_eaten_ref, highest_ref, viruses_eaten_ref,
               cells_eaten_ref,
               cx_ref, cy_ref, cvx_ref, cvy_ref, svx_ref, svy_ref,
               cmass_ref, calive_ref, cid_ref, crecomb_ref, next_id_ref,
               pkey_ref,
               vx_ref, vy_ref, vvx_ref, vvy_ref, vmass_ref, vhits_ref,
               valive_ref,
               fx_ref, fy_ref, fvx_ref, fvy_ref, falive_ref, fnext_ref,
               ticks_ref, seed_ref,
               ax_ref, ay_ref, aact_ref,
               o_tx, o_ty, o_action, o_split_cd, o_feed_cd, o_elapsed,
               o_last_decay, o_anti_team, o_vticks, o_vptr,
               o_food_eaten, o_highest, o_viruses_eaten, o_cells_eaten,
               o_cx, o_cy, o_cvx, o_cvy, o_svx, o_svy,
               o_cmass, o_calive, o_cid, o_crecomb, o_next_id,
               o_pkey,
               o_vx, o_vy, o_vvx, o_vvy, o_vmass, o_vhits, o_valive,
               o_fx, o_fy, o_fvx, o_fvy, o_falive, o_fnext,
               o_ticks, o_seed, *o_extra):
        # trailing refs are VMEM scratch, used by the fori_loop'd fat
        # branches (pellet/food/feed/regen passes): Mosaic cannot
        # dynamic-slice VALUES, so chunk loads/stores go through refs.
        # Ownership rotates within a tick (pellets -> foods -> feed ->
        # viruses -> regen); each phase re-stages what it needs.
        s_pxw, s_pyw, s_aux1, s_aux2, s_pmin = o_extra[-5:]
        o_extra = o_extra[:-5]
        np_pad_scratch = s_pxw.shape[0]
        E = tx_ref.shape[1]
        tx = tx_ref[...]                     # (P, E)
        ty = ty_ref[...]
        action = action_ref[...]
        split_cd = split_cd_ref[...]
        feed_cd = feed_cd_ref[...]
        elapsed = elapsed_ref[...]
        last_decay = last_decay_ref[...]
        anti_team = anti_team_ref[...]
        food_eaten = food_eaten_ref[...]
        highest = highest_ref[...]
        viruses_eaten = viruses_eaten_ref[...]
        cells_eaten = cells_eaten_ref[...]
        ticks = ticks_ref[...]               # (1, E)
        seed = seed_ref[...]
        vticks = vticks_ref[...]             # (P*K, E)
        vptr = vptr_ref[...]                 # (P, E)

        cx = cx_ref[...]                     # (PC, E)
        cy = cy_ref[...]
        cvx = cvx_ref[...]
        cvy = cvy_ref[...]
        svx = svx_ref[...]
        svy = svy_ref[...]
        cmass = cmass_ref[...]
        calive = calive_ref[...]
        cid = cid_ref[...]
        crecomb = crecomb_ref[...]
        next_id = next_id_ref[...]           # (1, E)

        pkey = pkey_ref[...]                 # (Np, E) i32 quantized keys
        vx_ = vx_ref[...]                    # (Nv, E)
        vy_ = vy_ref[...]
        vvx = vvx_ref[...]
        vvy = vvy_ref[...]
        vmass = vmass_ref[...]
        vhits = vhits_ref[...]
        valive = valive_ref[...]
        fx = fx_ref[...]                     # (Nf, E)
        fy = fy_ref[...]
        fvx = fvx_ref[...]
        fvy = fvy_ref[...]
        falive = falive_ref[...]
        fnext = fnext_ref[...]

        # pellet WORKING coords decoded from the quantized key
        # (state.py pellet quantization: x = (qx + 0.5) * W/32768, the same
        # f32 ops as decode_pellet_xy so the values are bit-identical to the
        # XLA tick's), dead slots parked at _DEAD: the eat passes drop their
        # per-chunk alive-mask ops (a parked pellet can never pass d2 <= r2),
        # the obs sections reuse the parked arrays as-is, and o_pkey
        # re-encodes at writeback (encode(decode(q)) == q exactly).
        palive = pkey >= 0
        qmaskp = np.int32((1 << 15) - 1)
        pxw = jnp.where(
            palive,
            (((pkey >> 15) & qmaskp).astype(jnp.float32) + 0.5) * _P_INVX,
            _DEAD)
        pyw = jnp.where(
            palive,
            ((pkey & qmaskp).astype(jnp.float32) + 0.5) * _P_INVY,
            _DEAD)
        if ms.pellet_regen and phases >= 9:
            # regen is a no-op unless something is dead when it fires (the
            # fill masks are all-false at zero deficit); track a
            # conservative block-level "maybe deficit" flag so quiescent
            # blocks never pay the regen branch's carry copies. Pellets and
            # viruses only die via eating, which raises the flag below.
            maybe_deficit = jnp.maximum(jnp.max(_bint(~palive)),
                                        jnp.max(_bint(~valive)))
        else:
            maybe_deficit = np.int32(1)

        if n_steps:
            ax = ax_ref[...]                 # (A, E) action dx
            ay = ay_ref[...]
            aact = aact_ref[...]             # (A, E) i32 act enum
            A_n = cfg.num_agents
            if A_n < P:
                zpad = jnp.zeros((P - A_n, E), jnp.float32)
                axp = jnp.concatenate([ax, zpad], axis=0)
                ayp = jnp.concatenate([ay, zpad], axis=0)
                aactp = jnp.concatenate(
                    [aact, jnp.zeros((P - A_n, E), jnp.int32)], axis=0)
            else:
                axp, ayp, aactp = ax, ay, aact
            agent_row = (jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                         < A_n)

        for _t in range(max(n_steps, 1) * n_ticks):
            if n_steps and _t % n_ticks == 0 and loo != 20:
                # apply the (shared) step actions exactly like
                # env.py::apply_actions: live agents get
                # target = centroid + 10*(dx, dy), action = act
                w0a = jnp.where(calive, cmass, 0).astype(jnp.float32)
                pma = preduce(w0a, jnp.sum)
                dena = jnp.maximum(pma, 1.0)
                cenxa = preduce(w0a * cx, jnp.sum) / dena
                cenya = preduce(w0a * cy, jnp.sum) / dena
                pala = preduce(_bint(calive), jnp.max) > 0
                seta = agent_row & pala
                tx = jnp.where(seta, cenxa + C.TARGET_ACTION_SCALE * axp,
                               tx)
                ty = jnp.where(seta, cenya + C.TARGET_ACTION_SCALE * ayp,
                               ty)
                action = jnp.where(seta, aactp, action)

            # the *_in aliases carry this iteration's starting state
            split_cd_in = split_cd
            feed_cd_in = feed_cd
            elapsed_in = elapsed
            last_decay_in = last_decay
            anti_team_in = anti_team
            food_eaten_in = food_eaten
            highest_in = highest
            viruses_eaten_in = viruses_eaten
            cells_eaten_in = cells_eaten
            cells_eaten = cells_eaten_in

            # --- bot decisions (SPEC Q12: every BOT_ACTION_PERIOD ticks from
            # the start-of-tick snapshot; XLA twin engine/bots.py) -------------
            if any(b > 0 for b in bt_list) and phases >= 1:
                do_bot = (ticks % C.BOT_ACTION_PERIOD) == 0       # (1, E)

                def bots_run(tx=tx, ty=ty, action=action):
                    w0 = jnp.where(calive, cmass, 0).astype(jnp.float32)
                    pm0 = preduce(w0, jnp.sum)                    # (P, E)
                    den0 = jnp.maximum(pm0, 1.0)
                    cenx = preduce(w0 * cx, jnp.sum) / den0
                    ceny = preduce(w0 * cy, jnp.sum) / den0
                    palive0 = preduce(_bint(calive), jnp.max) > 0

                    # nearest pellet (Bot.hpp:92-129): rolled chunk loop
                    # over scratch-staged parked coords (chunked first-min;
                    # strict < across chunks preserves argmin's first-index
                    # tie pick). The whole bot pass sits behind one
                    # block-level branch: decisions fire only every
                    # BOT_ACTION_PERIOD ticks (SPEC Q12), so 9/10 ticks pay
                    # only the (P, E) carries.
                    BCH = 128
                    nb = s_pxw.shape[0] // BCH
                    if s_pxw.shape[0] != Np:
                        zf = jnp.full((s_pxw.shape[0] - Np, E), _DEAD)
                        s_pxw[...] = jnp.concatenate([pxw, zf], axis=0)
                        s_pyw[...] = jnp.concatenate([pyw, zf], axis=0)
                    else:
                        s_pxw[...] = pxw
                        s_pyw[...] = pyw
                    ciota = jax.lax.broadcasted_iota(jnp.int32, (1, BCH, 1),
                                                     1)

                    def bchunk(k, carry):
                        bd, bpx, bpy = carry
                        cpx = s_pxw[pl.ds(k * BCH, BCH), :]
                        cpy = s_pyw[pl.ds(k * BCH, BCH), :]
                        ddx = cenx[:, None, :] - cpx[None, :, :]  # (P,BCH,E)
                        ddy = ceny[:, None, :] - cpy[None, :, :]
                        d = jnp.sqrt(ddx * ddx + ddy * ddy)
                        # parked pellets sit ~1e9 away: excluded by
                        # d < _DEAD_MIN exactly as an alive mask would
                        okk = (d > 0.01) & (d < _DEAD_MIN)
                        dm = jnp.where(okk, d, _BIG)
                        m = jnp.min(dm, axis=1)                   # (P, E)
                        ismin = okk & (dm == m[:, None, :])
                        isel = jnp.min(jnp.where(ismin, ciota, _BIG_I),
                                       axis=1)
                        ohf = jnp.where(ismin & (ciota == isel[:, None, :]),
                                        1.0, 0.0)
                        sx = jnp.sum(cpx[None, :, :] * ohf, axis=1)
                        sy = jnp.sum(cpy[None, :, :] * ohf, axis=1)
                        take = m < bd
                        return (jnp.where(take, m, bd),
                                jnp.where(take, sx, bpx),
                                jnp.where(take, sy, bpy))

                    bd, bpx, bpy = jax.lax.fori_loop(
                        0, nb, bchunk,
                        (jnp.full((P, E), _BIG, jnp.float32),
                         jnp.zeros((P, E), jnp.float32),
                         jnp.zeros((P, E), jnp.float32)))
                    has_pel = bd < _BIG
                    any_pel = (jnp.min(pxw, axis=0, keepdims=True)
                               < _DEAD_MIN)                           # (1, E)
                    piot = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                    rndx = jnp.floor(_uniform(np.float32(0.0), np.float32(W),
                                              seed, 4, ticks, piot, 0))
                    rndy = jnp.floor(_uniform(np.float32(0.0), np.float32(H),
                                              seed, 4, ticks, piot, 1))
                    ptx = jnp.where(has_pel, bpx, jnp.where(any_pel, 0.0, rndx))
                    pty = jnp.where(has_pel, bpy, jnp.where(any_pel, 0.0, rndy))

                    # Flee/hunt pair terms unroll over the tiny static opponent
                    # axis j: Mosaic cannot relayout reductions over a small (<8)
                    # middle dim of a (P, P, E) vector ("Invalid relayout:
                    # non-singleton logical dimension is replicated"), so every
                    # pairwise quantity is accumulated j-by-j on (P, E) tiles.
                    need_flee = any(b in (2, 4) for b in bt_list)
                    need_hunt = any(b in (3, 4) for b in bt_list)
                    if need_flee or need_hunt:
                        piv = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
                    if need_flee:
                        # HungryShyBot.hpp:24-49 — the mass test is vacuous (SPEC Q1)
                        fj = jnp.full((P, E), _BIG_I, jnp.int32)
                        for j in range(P):
                            dxj = cenx - prow(cenx, j)
                            dyj = ceny - prow(ceny, j)
                            dj = jnp.sqrt(dxj * dxj + dyj * dyj)
                            scaryj = ((piv != j) & prow(palive0, j)
                                      & (dj < np.float32(C.SHY_RADIUS))
                                      & (prow(pm0, j) > 0))           # (P, E)
                            fj = jnp.minimum(fj, jnp.where(scaryj, j, _BIG_I))
                        has_flee = fj < _BIG_I                        # (P, E)
                        fcx = jnp.zeros((P, E), jnp.float32)
                        fcy = jnp.zeros((P, E), jnp.float32)
                        for j in range(P):
                            selj = fj == j
                            fcx = jnp.where(selj, prow(cenx, j), fcx)
                            fcy = jnp.where(selj, prow(ceny, j), fcy)
                        fltx = 2.0 * cenx - fcx
                        flty = 2.0 * ceny - fcy
                    if need_hunt:
                        # AggressiveBot.hpp:27-55 + Bot.hpp:56-67
                        lm = jnp.where(calive, cmass, -1)
                        bigm = jnp.maximum(preduce(lm, jnp.max), 0)   # (P, E)
                        bigf = bigm.astype(jnp.float32)
                        hj = jnp.full((P, E), _BIG_I, jnp.int32)
                        hunt_j = []   # per-j (edm_j, w_j) for the prey-centroid pass
                        for j in range(P):
                            cmj = pslice(cmass, j).astype(jnp.float32)  # (Cc, E)
                            caj = pslice(calive, j)
                            canj = ((bigm[:, None, :] > C.CELL_EAT_REQUIREMENT)
                                    & (bigf[:, None, :]
                                       > cmj[None] * np.float32(C.CELL_EAT_MARGIN))
                                    & caj[None])                      # (P, Cc, E)
                            wj = jnp.where(canj, cmj[None], 0.0)
                            edmj = jnp.sum(wj, axis=1)                # (P, E)
                            hunt_j.append((edmj, wj))
                            dxj = cenx - prow(cenx, j)
                            dyj = ceny - prow(ceny, j)
                            dj = jnp.sqrt(dxj * dxj + dyj * dyj)
                            nearj = ((piv != j) & prow(palive0, j)
                                     & (dj <= np.float32(C.AGGRESSIVE_RADIUS))
                                     & (edmj > 0))
                            hj = jnp.minimum(hj, jnp.where(nearj, j, _BIG_I))
                        has_hunt = hj < _BIG_I
                        hj0 = jnp.where(has_hunt, hj, 0)
                        wsum = jnp.zeros((P, E), jnp.float32)
                        pnx = jnp.zeros((P, E), jnp.float32)
                        pny = jnp.zeros((P, E), jnp.float32)
                        for j in range(P):
                            selj = hj0 == j
                            edmj, wj = hunt_j[j]
                            cxj = pslice(cx, j)
                            cyj = pslice(cy, j)
                            wsum = jnp.where(selj, edmj, wsum)
                            pnx = jnp.where(selj,
                                            jnp.sum(cxj[None] * wj, axis=1), pnx)
                            pny = jnp.where(selj,
                                            jnp.sum(cyj[None] * wj, axis=1), pny)
                        wsum = jnp.maximum(wsum, 1.0)
                        preyx = pnx / wsum
                        preyy = pny / wsum
                        hntx = cenx + 3.0 * (preyx - cenx)
                        hnty = ceny + 3.0 * (preyy - ceny)

                    ntx, nty, nact = [], [], []
                    for p, b in enumerate(bt_list):
                        rtx, rty, rac = tx[p:p + 1], ty[p:p + 1], action[p:p + 1]
                        if b > 0:
                            btx, bty = ptx[p:p + 1], pty[p:p + 1]
                            if b in (3, 4):
                                btx = jnp.where(prow(has_hunt, p), hntx[p:p + 1],
                                                btx)
                                bty = jnp.where(prow(has_hunt, p), hnty[p:p + 1],
                                                bty)
                            if b in (2, 4):
                                btx = jnp.where(prow(has_flee, p), fltx[p:p + 1],
                                                btx)
                                bty = jnp.where(prow(has_flee, p), flty[p:p + 1],
                                                bty)
                            do = do_bot & prow(palive0, p)
                            rtx = jnp.where(do, btx, rtx)
                            rty = jnp.where(do, bty, rty)
                            rac = jnp.where(do, 0, rac)
                        ntx.append(rtx)
                        nty.append(rty)
                        nact.append(rac)
                    return pcat(ntx), pcat(nty), pcat(nact)

                def bots_skip():
                    return tx, ty, action

                tx, ty, action = jax.lax.cond(
                    jnp.max(_bint(do_bot)) > 0, bots_run, bots_skip)

            if sub >= 1:
                palive_p = preduce(_bint(calive), jnp.max) > 0    # (P, E)
                action_eff = jnp.where(palive_p, action, 0)
                elapsed = elapsed_in + _bint(palive_p)            # (P, E)

                txc = pexpand(tx)                                 # vs (PC, E)
                tyc = pexpand(ty)
                elc = pexpand(elapsed)

            # --- movement (Engine.hpp:609-630) --------------------------------
            if sub >= 2:
                nvx = 3.0 * (txc - cx)
                nvy = 3.0 * (tyc - cy)
                sp = jnp.sqrt(nvx * nvx + nvy * nvy)
                lim = _max_speed(cmass)
                scale = jnp.where(sp > lim, lim / jnp.maximum(sp, 1e-12), 1.0)
                nvx = nvx * scale
                nvy = nvy * scale
                cx = cx + (nvx + svx) * dt
                cy = cy + (nvy + svy) * dt
                svx, svy = _decel(svx, svy, C.SPLIT_DECELERATION, dt)
                rad = _radius(cmass)
                cx, cy = clampb(cx, cy, rad)
                cvx, cvy = nvx, nvy
                cx = jnp.where(calive, cx, 0.0)
                cy = jnp.where(calive, cy, 0.0)
                cvx = jnp.where(calive, cvx, 0.0)
                cvy = jnp.where(calive, cvy, 0.0)
                svx = jnp.where(calive, svx, 0.0)
                svy = jnp.where(calive, svy, 0.0)

            if sub >= 1:
                rank = (rank_of(cid, calive)
                        if phases >= 2 and loo != 13
                        else jnp.zeros((PC, E), jnp.int32))
                if P > 1:
                    pidc = jax.lax.broadcasted_iota(jnp.int32, (PC, 1), 0) // Cc
                    gkey = pidc * Cc + rank                       # (PC, E)
                else:
                    gkey = rank

            # --- self-collision relaxation (SPEC M6), per player --------------
            def avoid_static(pax, pay, vax, vay, pbx, pby, vbx, vby, ra, rb):
                dx = pbx - pax
                dy = pby - pay
                d = jnp.sqrt(dx * dx + dy * dy)
                td = ra + rb
                ov = d <= td
                denom = jnp.maximum(jnp.abs(dx) + jnp.abs(dy), 1e-12)
                rx = dx / denom
                ry = dy / denom
                depth = td - d
                at_ax = (pax == ra) | (pax == W - ra)
                at_ay = (pay == ra) | (pay == H - ra)
                at_bx = (pbx == rb) | (pbx == W - rb)
                at_by = (pby == rb) | (pby == H - rb)
                sax_ = jnp.where(at_ax, 1.0, 0.5)
                say_ = jnp.where(at_ay, 1.0, 0.5)
                sbx_ = jnp.where(at_bx, 1.0, 0.5)
                sby_ = jnp.where(at_by, 1.0, 0.5)
                nvax = jnp.where(ov & at_ax, 0.0, vax)
                nvay = jnp.where(ov & at_ay, 0.0, vay)
                nvbx = jnp.where(ov & at_bx, 0.0, vbx)
                nvby = jnp.where(ov & at_by, 0.0, vby)
                nax = pax - rx * depth * sax_
                nay = pay - ry * depth * say_
                nbx = pbx + rx * depth * sbx_
                nby = pby + ry * depth * sby_
                nax, nay = clampb(nax, nay, ra)
                nbx, nby = clampb(nbx, nby, rb)
                nax = jnp.where(ov, nax, pax)
                nay = jnp.where(ov, nay, pay)
                nbx = jnp.where(ov, nbx, pbx)
                nby = jnp.where(ov, nby, pby)
                return nax, nvax, nay, nvay, nbx, nvbx, nby, nvby

            def separate(pax, pay, pbx, pby, ma, mb, ra, rb, mass_p, txp, typ):
                dx = pbx - pax
                dy = pby - pay
                d = jnp.sqrt(dx * dx + dy * dy)
                td = ra + rb
                ov = d <= td
                denom = jnp.maximum(jnp.abs(dx) + jnp.abs(dy), 1e-12)
                rx = dx / denom
                ry = dy / denom
                depth = td - d
                txx = txp[None]                     # (1, 1, E)
                tyy = typ[None]
                da = (txx - pax) ** 2 + (tyy - pay) ** 2
                db = (txx - pbx) ** 2 + (tyy - pby) ** 2
                s1 = jnp.where(ma < mb, 1, -1)
                s2 = jnp.where(da >= db, 1, -1)
                sign = jnp.where(s1 == s2, s2, 0).astype(jnp.float32)
                mx = jnp.where(dx >= 0, -1.0, 1.0) * rx * depth * sign
                my = jnp.where(dy >= 0, -1.0, 1.0) * ry * depth * sign
                a_small = ma < mb
                nax = jnp.where(ov & a_small, pax + mx, pax)
                nay = jnp.where(ov & a_small, pay + my, pay)
                nbx = jnp.where(ov & ~a_small, pbx + mx, pbx)
                nby = jnp.where(ov & ~a_small, pby + my, pby)
                return nax, nay, nbx, nby

            def pair_pass(cx, cy, cvx, cvy, cmass_p, calive_p, rank_p,
                          svx_p, svy_p, txp, typ, static_only):
                # [i, j, E] pairwise within one player's (Cc, E) block
                dx = cx[None, :, :] - cx[:, None, :]
                dy = cy[None, :, :] - cy[:, None, :]
                d2 = dx * dx + dy * dy
                radc = _radius(cmass_p)
                rs = radc[:, None, :] + radc[None, :, :]
                eye = (jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc, 1), 0)
                       == jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc, 1), 1))
                both = calive_p[:, None, :] & calive_p[None, :, :] & ~eye
                touch = both & (rs * rs >= d2)
                key = jnp.where(touch, rank_p[None, :, :], _BIG_I)
                minkey = jnp.min(key, axis=1, keepdims=True)
                chose = touch & (key == minkey)
                # mutual: chose[i,j] & chose[j,i] — transpose via int32
                chose_t = jnp.swapaxes(_bint(chose), 0, 1) > 0
                M = chose & chose_t
                Mlow = M & (rank_p[:, None, :] < rank_p[None, :, :])

                pax, pay = cx[:, None, :], cy[:, None, :]
                pbx, pby = cx[None, :, :], cy[None, :, :]
                vax, vay = cvx[:, None, :], cvy[:, None, :]
                vbx, vby = cvx[None, :, :], cvy[None, :, :]
                sax, say = svx_p[:, None, :], svy_p[:, None, :]
                sbx, sby = svx_p[None, :, :], svy_p[None, :, :]
                ma = cmass_p[:, None, :].astype(jnp.float32)
                mb = cmass_p[None, :, :].astype(jnp.float32)
                ra = radc[:, None, :]
                rb = radc[None, :, :]

                if static_only:
                    npax, nvax, npay, nvay, npbx, nvbx, npby, nvby = \
                        avoid_static(pax, pay, vax, vay, pbx, pby, vbx, vby,
                                     ra, rb)
                else:
                    d0 = jnp.sqrt(d2)
                    qax = pax - (vax + sax) * dt
                    qay = pay - (vay + say) * dt
                    qbx = pbx - (vbx + sbx) * dt
                    qby = pby - (vby + sby) * dt
                    dd = jnp.maximum(d0, 1e-12)
                    nx = dx / dd
                    ny = dy / dd
                    txn = -ny
                    tyn = nx
                    dpn1 = vax * nx + vay * ny
                    dpn2 = vbx * nx + vby * ny
                    dpt1 = vax * txn + vay * tyn
                    dpt2 = vbx * txn + vby * tyn
                    msum = jnp.maximum(ma + mb, 1.0)
                    v1 = (dpn1 * (ma - mb) + 2.0 * mb * dpn2) / msum
                    v2 = (dpn2 * (mb - ma) + 2.0 * ma * dpn1) / msum
                    ia = ma <= mb
                    ib = ma >= mb
                    vax = jnp.where(ia, txn * dpt1 + nx * v1, vax)
                    vay = jnp.where(ia, tyn * dpt1 + ny * v1, vay)
                    vbx = jnp.where(ib, txn * dpt2 + nx * v2, vbx)
                    vby = jnp.where(ib, tyn * dpt2 + ny * v2, vby)
                    npax = qax + (vax + sax) * dt
                    npay = qay + (vay + say) * dt
                    npbx = qbx + (vbx + sbx) * dt
                    npby = qby + (vby + sby) * dt
                    ddx1 = npbx - npax
                    ddy1 = npby - npay
                    dd21 = ddx1 * ddx1 + ddy1 * ddy1
                    still = (ra + rb) * (ra + rb) >= dd21
                    near = jnp.abs(cmass_p[:, None, :]
                                   - cmass_p[None, :, :]) <= 10
                    s_ax, s_vax, s_ay, s_vay, s_bx, s_vbx, s_by, s_vby = \
                        avoid_static(npax, npay, vax, vay, npbx, npby, vbx,
                                     vby, ra, rb)
                    p_ax, p_ay, p_bx, p_by = separate(
                        npax, npay, npbx, npby, ma, mb, ra, rb, cmass_p,
                        txp, typ)
                    us = still & near
                    up = still & ~near
                    npax = jnp.where(us, s_ax, jnp.where(up, p_ax, npax))
                    npay = jnp.where(us, s_ay, jnp.where(up, p_ay, npay))
                    npbx = jnp.where(us, s_bx, jnp.where(up, p_bx, npbx))
                    npby = jnp.where(us, s_by, jnp.where(up, p_by, npby))
                    vax = jnp.where(us, s_vax, vax)
                    vay = jnp.where(us, s_vay, vay)
                    vbx = jnp.where(us, s_vbx, vbx)
                    vby = jnp.where(us, s_vby, vby)
                    nvax, nvay, nvbx, nvby = vax, vay, vbx, vby
                    npax, npay = clampb(npax, npay, ra)
                    npbx, npby = clampb(npbx, npby, rb)

                ml = jnp.where(Mlow, 1.0, 0.0)
                has_a = jnp.max(_bint(Mlow), axis=1) > 0     # (Cc, E): i is "a"
                has_b = jnp.max(_bint(Mlow), axis=0) > 0     # (Cc, E): j is "b"
                ax_upd = jnp.sum(npax * ml, axis=1)
                ay_upd = jnp.sum(npay * ml, axis=1)
                avx_upd = jnp.sum(nvax * ml, axis=1)
                avy_upd = jnp.sum(nvay * ml, axis=1)
                bx_upd = jnp.sum(npbx * ml, axis=0)
                by_upd = jnp.sum(npby * ml, axis=0)
                bvx_upd = jnp.sum(nvbx * ml, axis=0)
                bvy_upd = jnp.sum(nvby * ml, axis=0)
                ncx = jnp.where(has_a, ax_upd, jnp.where(has_b, bx_upd, cx))
                ncy = jnp.where(has_a, ay_upd, jnp.where(has_b, by_upd, cy))
                ncvx = jnp.where(has_a, avx_upd,
                                 jnp.where(has_b, bvx_upd, cvx))
                ncvy = jnp.where(has_a, avy_upd,
                                 jnp.where(has_b, bvy_upd, cvy))
                return ncx, ncy, ncvx, ncvy

            # -- chunked relax: pair_pass with the i axis in CH-row fori
            # chunks through scratch. Every live value stays (CH, Cc, E)
            # = 8 vregs: the untaken-branch tax follows value footprint —
            # the (Cc, Cc, E) = 32-vreg form costs ~0.4 ms/tick per player
            # even when the relax cond is never taken, while a max_cells=8
            # config (8-vreg pairs) measures ~0 (CLAUDE.md). Identical
            # per-pair arithmetic: cross-chunk reductions are exact since
            # minkey_j is a running min and mutual matches are 1-1 (at most
            # one nonzero term per j in the b-side sums). calive derives as
            # cmass > 0 (dead cells are mass-masked at the previous
            # writeback, and nothing kills or revives cells before the
            # relax phase within a tick). ----------------------------------
            # 0 -> unchunked pair_pass (also when the scratch rows cannot
            # hold the 7 staged cell-field groups of an oversized Cc)
            CH = 4 if (Cc % 4 == 0 and 7 * Cc <= s_pxw.shape[0]) else 0

            def relax_stage_fixed(cmass_p, rank_p, svx_p, svy_p):
                """Per-cond-entry staging of the relax-invariant rows."""
                s_pxw[4 * Cc:5 * Cc, :] = svx_p
                s_pxw[5 * Cc:6 * Cc, :] = svy_p
                s_pxw[6 * Cc:7 * Cc, :] = cmass_p.astype(jnp.float32)
                s_pmin[Cc:2 * Cc, :] = rank_p
                s_pmin[3 * Cc:4 * Cc, :] = cmass_p

            def chunk_pass(cx_p, cy_p, cvx_p, cvy_p, cmass_p, rank_p,
                           svx_p, svy_p, txp, typ, static_only):
                f32 = jnp.float32
                calive_j = cmass_p > 0
                radc_j = _radius(cmass_p)
                s_pxw[0:Cc, :] = cx_p
                s_pxw[Cc:2 * Cc, :] = cy_p
                s_pxw[2 * Cc:3 * Cc, :] = cvx_p
                s_pxw[3 * Cc:4 * Cc, :] = cvy_p
                n_ch = Cc // CH
                jiota = jax.lax.broadcasted_iota(jnp.int32, (1, Cc, 1), 1)

                def geom(ci):
                    cxI = s_pxw[pl.ds(ci * CH, CH), :]
                    cyI = s_pxw[pl.ds(Cc + ci * CH, CH), :]
                    cmI = s_pxw[pl.ds(6 * Cc + ci * CH, CH), :]
                    rkI = s_pmin[pl.ds(Cc + ci * CH, CH), :]
                    radI = jnp.sqrt(cmI / jnp.pi)    # == _radius bits
                    dx = cx_p[None, :, :] - cxI[:, None, :]
                    dy = cy_p[None, :, :] - cyI[:, None, :]
                    d2 = dx * dx + dy * dy
                    rs = radI[:, None, :] + radc_j[None, :, :]
                    eyeI = ((jax.lax.broadcasted_iota(
                        jnp.int32, (CH, 1, 1), 0) + ci * CH) == jiota)
                    both = ((cmI > 0)[:, None, :] & calive_j[None, :, :]
                            & ~eyeI)
                    touch = both & (rs * rs >= d2)
                    return cxI, cyI, cmI, rkI, radI, dx, dy, d2, touch

                def pass1(ci, mkj):
                    g = geom(ci)
                    rkI, touch = g[3], g[8]
                    key = jnp.where(touch, rank_p[None, :, :], _BIG_I)
                    s_pmin[pl.ds(2 * Cc + ci * CH, CH), :] = jnp.min(
                        key, axis=1)                       # minkey_i rows
                    kji = jnp.where(touch, rkI[:, None, :], _BIG_I)
                    return jnp.minimum(mkj, jnp.min(kji, axis=0))

                mkj = jax.lax.fori_loop(
                    0, n_ch, pass1, jnp.full((Cc, E), _BIG_I, jnp.int32))

                def pass2(ci, carry):
                    hb, bxs, bys, bvxs, bvys = carry
                    (cxI, cyI, cmI, rkI, radI, dx, dy, d2,
                     touch) = geom(ci)
                    key = jnp.where(touch, rank_p[None, :, :], _BIG_I)
                    mki = s_pmin[pl.ds(2 * Cc + ci * CH, CH), :]
                    chose = touch & (key == mki[:, None, :])
                    # chose[j,i]: touch is symmetric; key[j,i] = rank_i
                    chose_t = touch & (rkI[:, None, :] == mkj[None, :, :])
                    M = chose & chose_t
                    Mlow = M & (rkI[:, None, :] < rank_p[None, :, :])

                    pax, pay = cxI[:, None, :], cyI[:, None, :]
                    pbx, pby = cx_p[None, :, :], cy_p[None, :, :]
                    cvxI = s_pxw[pl.ds(2 * Cc + ci * CH, CH), :]
                    cvyI = s_pxw[pl.ds(3 * Cc + ci * CH, CH), :]
                    vax, vay = cvxI[:, None, :], cvyI[:, None, :]
                    vbx, vby = cvx_p[None, :, :], cvy_p[None, :, :]
                    svxI = s_pxw[pl.ds(4 * Cc + ci * CH, CH), :]
                    svyI = s_pxw[pl.ds(5 * Cc + ci * CH, CH), :]
                    sax, say = svxI[:, None, :], svyI[:, None, :]
                    sbx, sby = svx_p[None, :, :], svy_p[None, :, :]
                    ma = cmI[:, None, :]
                    mb = cmass_p[None, :, :].astype(f32)
                    ra = radI[:, None, :]
                    rb = radc_j[None, :, :]

                    if static_only:
                        (npax, nvax, npay, nvay, npbx, nvbx, npby,
                         nvby) = avoid_static(pax, pay, vax, vay, pbx,
                                              pby, vbx, vby, ra, rb)
                    else:
                        d0 = jnp.sqrt(d2)
                        qax = pax - (vax + sax) * dt
                        qay = pay - (vay + say) * dt
                        qbx = pbx - (vbx + sbx) * dt
                        qby = pby - (vby + sby) * dt
                        dd = jnp.maximum(d0, 1e-12)
                        nx = dx / dd
                        ny = dy / dd
                        txn = -ny
                        tyn = nx
                        dpn1 = vax * nx + vay * ny
                        dpn2 = vbx * nx + vby * ny
                        dpt1 = vax * txn + vay * tyn
                        dpt2 = vbx * txn + vby * tyn
                        msum = jnp.maximum(ma + mb, 1.0)
                        v1 = (dpn1 * (ma - mb) + 2.0 * mb * dpn2) / msum
                        v2 = (dpn2 * (mb - ma) + 2.0 * ma * dpn1) / msum
                        ia = ma <= mb
                        ib = ma >= mb
                        vax = jnp.where(ia, txn * dpt1 + nx * v1, vax)
                        vay = jnp.where(ia, tyn * dpt1 + ny * v1, vay)
                        vbx = jnp.where(ib, txn * dpt2 + nx * v2, vbx)
                        vby = jnp.where(ib, tyn * dpt2 + ny * v2, vby)
                        npax = qax + (vax + sax) * dt
                        npay = qay + (vay + say) * dt
                        npbx = qbx + (vbx + sbx) * dt
                        npby = qby + (vby + sby) * dt
                        ddx1 = npbx - npax
                        ddy1 = npby - npay
                        dd21 = ddx1 * ddx1 + ddy1 * ddy1
                        still = (ra + rb) * (ra + rb) >= dd21
                        cmiI = s_pmin[pl.ds(3 * Cc + ci * CH, CH), :]
                        near = jnp.abs(cmiI[:, None, :]
                                       - cmass_p[None, :, :]) <= 10
                        (s_ax, s_vax, s_ay, s_vay, s_bx, s_vbx, s_by,
                         s_vby) = avoid_static(npax, npay, vax, vay,
                                               npbx, npby, vbx, vby,
                                               ra, rb)
                        p_ax, p_ay, p_bx, p_by = separate(
                            npax, npay, npbx, npby, ma, mb, ra, rb,
                            cmass_p, txp, typ)
                        us = still & near
                        up = still & ~near
                        npax = jnp.where(us, s_ax,
                                         jnp.where(up, p_ax, npax))
                        npay = jnp.where(us, s_ay,
                                         jnp.where(up, p_ay, npay))
                        npbx = jnp.where(us, s_bx,
                                         jnp.where(up, p_bx, npbx))
                        npby = jnp.where(us, s_by,
                                         jnp.where(up, p_by, npby))
                        vax = jnp.where(us, s_vax, vax)
                        vay = jnp.where(us, s_vay, vay)
                        vbx = jnp.where(us, s_vbx, vbx)
                        vby = jnp.where(us, s_vby, vby)
                        nvax, nvay, nvbx, nvby = vax, vay, vbx, vby
                        npax, npay = clampb(npax, npay, ra)
                        npbx, npby = clampb(npbx, npby, rb)

                    ml = jnp.where(Mlow, 1.0, 0.0)
                    s_pyw[pl.ds(0 * Cc + ci * CH, CH), :] = jnp.max(
                        ml, axis=1)                        # has_a rows
                    s_pyw[pl.ds(1 * Cc + ci * CH, CH), :] = jnp.sum(
                        npax * ml, axis=1)
                    s_pyw[pl.ds(2 * Cc + ci * CH, CH), :] = jnp.sum(
                        npay * ml, axis=1)
                    s_pyw[pl.ds(3 * Cc + ci * CH, CH), :] = jnp.sum(
                        nvax * ml, axis=1)
                    s_pyw[pl.ds(4 * Cc + ci * CH, CH), :] = jnp.sum(
                        nvay * ml, axis=1)
                    return (jnp.maximum(hb, jnp.max(_bint(Mlow), axis=0)),
                            bxs + jnp.sum(npbx * ml, axis=0),
                            bys + jnp.sum(npby * ml, axis=0),
                            bvxs + jnp.sum(nvbx * ml, axis=0),
                            bvys + jnp.sum(nvby * ml, axis=0))

                hb, bxs, bys, bvxs, bvys = jax.lax.fori_loop(
                    0, n_ch, pass2,
                    (jnp.zeros((Cc, E), jnp.int32),
                     jnp.zeros((Cc, E), f32), jnp.zeros((Cc, E), f32),
                     jnp.zeros((Cc, E), f32), jnp.zeros((Cc, E), f32)))
                has_a = s_pyw[0:Cc, :] > 0.0
                has_b = hb > 0
                ax = s_pyw[Cc:2 * Cc, :]
                ay = s_pyw[2 * Cc:3 * Cc, :]
                avx = s_pyw[3 * Cc:4 * Cc, :]
                avy = s_pyw[4 * Cc:5 * Cc, :]
                ncx = jnp.where(has_a, ax, jnp.where(has_b, bxs, cx_p))
                ncy = jnp.where(has_a, ay, jnp.where(has_b, bys, cy_p))
                ncvx = jnp.where(has_a, avx,
                                 jnp.where(has_b, bvxs, cvx_p))
                ncvy = jnp.where(has_a, avy,
                                 jnp.where(has_b, bvys, cvy_p))
                return ncx, ncy, ncvx, ncvy

            if phases >= 2 and loo != 1:
                ncx, ncy, ncvx, ncvy = [], [], [], []
                for p in range(P):
                    c0 = (pslice(cx, p), pslice(cy, p),
                          pslice(cvx, p), pslice(cvy, p))
                    extra = (pslice(cmass, p), pslice(calive, p),
                             pslice(rank, p), pslice(svx, p), pslice(svy, p),
                             tx[p:p + 1], ty[p:p + 1])
                    # single-cell fast path: skip the pairwise relaxation when
                    # no env in this block gives the player 2+ live cells
                    # (lax.cond lowers to a real branch in Mosaic)
                    nl = jnp.sum(_bint(pslice(calive, p)), axis=0,
                                 keepdims=True)
                    multi = jnp.max(nl) >= 2

                    def run_relax(c, extra=extra):
                        (cmass_p, _calive_p, rank_p, svx_p, svy_p,
                         txp, typ) = extra
                        if CH:
                            relax_stage_fixed(cmass_p, rank_p, svx_p,
                                              svy_p)

                            def trip(_, cc):
                                return chunk_pass(*cc, cmass_p, rank_p,
                                                  svx_p, svy_p, txp, typ,
                                                  False)
                            cc = jax.lax.fori_loop(0, 5, trip, c)
                            return chunk_pass(*cc, cmass_p, rank_p,
                                              svx_p, svy_p, txp, typ,
                                              True)

                        def relax_body(_, cc):
                            return pair_pass(*cc, *extra, False)
                        cc = jax.lax.fori_loop(0, 5, relax_body, c)
                        return pair_pass(*cc, *extra, True)

                    out = jax.lax.cond(multi, run_relax, lambda c: c,
                                       c0)
                    ncx.append(out[0])
                    ncy.append(out[1])
                    ncvx.append(out[2])
                    ncvy.append(out[3])
                cx = pcat(ncx)
                cy = pcat(ncy)
                cvx = pcat(ncvx)
                cvy = pcat(ncvy)

            # --- virus events (SPEC M2): per-player best pair, then per-virus
            # lowest-pid arbitration ------------------------------------------
            if sub >= 1:
                n_start = preduce(_bint(calive), jnp.sum)         # (P, E)
                multi_blk = jnp.max(n_start) >= 2
            viruses_eaten = viruses_eaten_in
            disr = jnp.zeros((P, E), bool)
            num_new = jnp.zeros((P, E), jnp.int32)
            pop_mass = jnp.zeros((P, E), jnp.int32)
            hit_cvx = hit_cvy = jnp.zeros((P, E), jnp.float32)
            hit_vx = hit_vy = jnp.zeros((P, E), jnp.float32)
            if Nv > 0 and phases >= 3 and loo != 2:
                radc = _radius(cmass)
                radv = _radius(vmass)
                viota = jax.lax.broadcasted_iota(jnp.int32, (1, Nv, 1), 1)

                vmf = vmass.astype(jnp.float32) * np.float32(
                    C.CELL_EAT_MARGIN)
                VCH = 4 if Cc % 4 == 0 else 0
                piotav = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)

                def velig_full_chunked():
                    # the (PC, Nv, E) eligibility tables ride VCH-row fori
                    # chunks through scratch (untaken-footprint rule,
                    # CLAUDE.md); chunks stay within one player (VCH | Cc).
                    # calive derives as cmass > 0 (no deaths before this
                    # phase within a tick; dead mass is masked at the
                    # previous writeback). Exact: best is a running
                    # per-player min, and the winner masks are recomputed
                    # with the final best.
                    s_pxw[0:PC, :] = cx
                    s_pyw[0:PC, :] = cy
                    s_aux1[0:PC, :] = radc
                    s_aux2[0:PC, :] = cmass.astype(jnp.float32)
                    s_pmin[0:PC, :] = rank
                    per_p = Cc // VCH

                    def chunk_elig(ci):
                        kds = pl.ds(ci * VCH, VCH)
                        cxI = s_pxw[kds, :]
                        cyI = s_pyw[kds, :]
                        radI = s_aux1[kds, :]
                        cmI = s_aux2[kds, :]
                        rkI = s_pmin[kds, :]
                        ddx = cxI[:, None, :] - vx_[None, :, :]
                        ddy = cyI[:, None, :] - vy_[None, :, :]
                        d2 = ddx * ddx + ddy * ddy
                        rm = jnp.maximum(radI[:, None, :],
                                         radv[None, :, :])
                        can = cmI[:, None, :] > vmf[None, :, :]
                        elig = ((cmI > 0)[:, None, :] & valive[None, :, :]
                                & can & (rm * rm >= d2))
                        return jnp.where(elig, rkI[:, None, :] * Nv + viota,
                                         _BIG_I)                # (VCH,Nv,E)

                    def pass1(ci, best):
                        pkey = chunk_elig(ci)
                        rmin = jnp.min(pkey, axis=1)            # (VCH, E)
                        cmin = jnp.min(rmin, axis=0, keepdims=True)
                        pc = ci // per_p
                        return jnp.where(piotav == pc,
                                         jnp.minimum(best, cmin), best)

                    best = jax.lax.fori_loop(
                        0, PC // VCH, pass1,
                        jnp.full((P, E), _BIG_I, jnp.int32))

                    def pass2(ci, wvs_c):
                        pkey = chunk_elig(ci)
                        pc = ci // per_p
                        bestp = jnp.sum(jnp.where(piotav == pc, best, 0),
                                        axis=0, keepdims=True)  # (1, E)
                        wpi = _bint((pkey < _BIG_I)
                                    & (pkey == bestp[:, None, :]))
                        s_pmin[pl.ds(PC + ci * VCH, VCH), :] = jnp.max(
                            wpi, axis=1)                        # wc rows
                        wvch = jnp.max(wpi, axis=0)             # (Nv, E)
                        if P == 1:
                            return jnp.maximum(wvs_c, wvch)
                        rowp = (jax.lax.broadcasted_iota(
                            jnp.int32, (P * Nv, 1), 0) // Nv)
                        tiled = jnp.concatenate([wvch] * P, axis=0)
                        return jnp.where(rowp == pc,
                                         jnp.maximum(wvs_c, tiled), wvs_c)

                    wvs = jax.lax.fori_loop(
                        0, PC // VCH, pass2,
                        jnp.zeros((P * Nv if P > 1 else Nv, E), jnp.int32))
                    wc = s_pmin[PC:2 * PC, :]
                    return _bint(best < _BIG_I), wvs, wc

                def velig_full():
                    ddx = cx[:, None, :] - vx_[None, :, :]    # (PC, Nv, E)
                    ddy = cy[:, None, :] - vy_[None, :, :]
                    d2 = ddx * ddx + ddy * ddy
                    rm = jnp.maximum(radc[:, None, :], radv[None, :, :])
                    can = (cmass[:, None, :].astype(jnp.float32)
                           > vmass[None, :, :].astype(jnp.float32)
                           * C.CELL_EAT_MARGIN)
                    elig = (calive[:, None, :] & valive[None, :, :] & can
                            & (rm * rm >= d2))
                    pkey = jnp.where(elig, rank[:, None, :] * Nv + viota,
                                     _BIG_I)
                    rowmin = jnp.min(pkey, axis=1)            # (PC, E)
                    best = preduce(rowmin, jnp.min)           # (P, E)
                    hit = best < _BIG_I
                    win_pair = elig & (pkey == pexpand(best)[:, None, :])
                    wpi = _bint(win_pair)
                    wvs = jnp.concatenate(
                        [jnp.max(wpi[p * Cc:(p + 1) * Cc], axis=0,
                                 keepdims=False)
                         for p in range(P)], axis=0) if P > 1 else                         jnp.max(wpi, axis=0)                  # (P*Nv, E)
                    wc = jnp.max(wpi, axis=1)                 # (PC, E)
                    return _bint(hit), wvs, wc

                def velig_single():
                    # single-live-cell block: (P, Nv, E) tables; exact —
                    # the lone cell's fields extract via masked sums, its
                    # rank is 0 so pkey = viota, and it is its player's
                    # winning cell iff the player hit at all
                    ai = jnp.where(calive, 1.0, 0.0)
                    sxv = preduce(cx * ai, jnp.sum)           # (P, E)
                    syv = preduce(cy * ai, jnp.sum)
                    srv = preduce(radc * ai, jnp.sum)
                    smv = preduce(jnp.where(calive, cmass, 0), jnp.sum)
                    hasp = n_start > 0
                    ddx = sxv[:, None, :] - vx_[None, :, :]   # (P, Nv, E)
                    ddy = syv[:, None, :] - vy_[None, :, :]
                    d2 = ddx * ddx + ddy * ddy
                    rm = jnp.maximum(srv[:, None, :], radv[None, :, :])
                    can = (smv[:, None, :].astype(jnp.float32)
                           > vmass[None, :, :].astype(jnp.float32)
                           * C.CELL_EAT_MARGIN)
                    elig = (hasp[:, None, :] & valive[None, :, :] & can
                            & (rm * rm >= d2))
                    pkey = jnp.where(elig, viota, _BIG_I)     # (P, Nv, E)
                    best = jnp.min(pkey, axis=1)              # (P, E)
                    hit = best < _BIG_I
                    win_pair = elig & (pkey == best[:, None, :])
                    wpi = _bint(win_pair)
                    wvs = (wpi.reshape(P * Nv, E) if P > 1
                           else jnp.max(wpi, axis=0))
                    wc = _bint(calive & pexpand(hit))         # (PC, E)
                    return _bint(hit), wvs, wc

                if VCH and 2 * PC <= np_pad_scratch:
                    velig_full = velig_full_chunked
                hit_i, wvs, wc_i = jax.lax.cond(multi_blk, velig_full,
                                                velig_single)
                hit = hit_i > 0
                if P == 1:
                    won = hit
                    wv = [wvs > 0]                            # (Nv, E)
                    wwon = wv
                else:
                    wv = [wvs[p * Nv:(p + 1) * Nv] > 0
                          for p in range(P)]
                    claim_pid = jnp.full((Nv, E), _BIG_I, jnp.int32)
                    for p in range(P):
                        cp = jnp.where(wv[p] & prow(hit, p), p, _BIG_I)
                        claim_pid = jnp.minimum(claim_pid, cp)
                    won_rows, wwon = [], []
                    for p in range(P):
                        winp = wv[p] & (claim_pid == p)
                        wwon.append(winp)
                        won_rows.append(
                            prow(hit, p)
                            & (jnp.max(_bint(winp), axis=0, keepdims=True) > 0))
                    won = pcat(won_rows)                      # (P, E)
                win_cell = (wc_i > 0) & pexpand(won)      # (PC, E)
                vgain = pcat([jnp.sum(jnp.where(wwon[p], vmass, 0), axis=0,
                                      keepdims=True) for p in range(P)])
                viruses_eaten = viruses_eaten + _bint(won)
                KT = vticks.shape[0] // P
                kiota = jax.lax.broadcasted_iota(jnp.int32, (P * KT, 1), 0) % KT
                push_oh = fexpand(won, KT) & (kiota == fexpand(vptr, KT) % KT)
                vticks = jnp.where(push_oh, fexpand(elapsed, KT), vticks)
                vptr = vptr + _bint(won)
                can_eat_virus = n_start >= C.NUM_CELLS_TO_SPLIT
                eat = won & can_eat_virus
                cmass = jnp.where(win_cell & pexpand(eat),
                                  cmass + pexpand(vgain), cmass)
                disr = won & ~can_eat_virus
                total = preduce(jnp.where(win_cell, cmass, 0), jnp.sum)
                cur = jnp.maximum((total.astype(jnp.float32)
                                   / C.CELL_POP_REDUCTION).astype(jnp.int32),
                                  C.CELL_MIN_SIZE)
                cur = cur + (total - cur) % C.CELL_POP_SIZE
                pop_mass = total - cur
                num_new0 = (pop_mass + C.CELL_POP_SIZE - 1) // C.CELL_POP_SIZE
                num_new = jnp.where(
                    disr, jnp.minimum(num_new0, jnp.maximum(
                        C.PLAYER_CELL_LIMIT - n_start, 0)), 0)
                cmass = jnp.where(win_cell & pexpand(disr), pexpand(cur), cmass)
                crecomb = jnp.where(win_cell & pexpand(disr),
                                    elc + C.RECOMBINE_TICKS, crecomb)
                hit_cvx = preduce(jnp.where(win_cell, cvx, 0.0), jnp.sum)
                hit_cvy = preduce(jnp.where(win_cell, cvy, 0.0), jnp.sum)
                hit_vx = pcat([jnp.sum(jnp.where(wwon[p], vx_, 0.0), axis=0,
                                       keepdims=True) for p in range(P)])
                hit_vy = pcat([jnp.sum(jnp.where(wwon[p], vy_, 0.0), axis=0,
                                       keepdims=True) for p in range(P)])
                removed = wwon[0]
                for p in range(1, P):
                    removed = removed | wwon[p]
                valive = valive & ~(removed & (jnp.max(_bint(won), axis=0,
                                                       keepdims=True) > 0))
                if ms.pellet_regen and phases >= 9:
                    # a virus died: the regen branch has work again
                    maybe_deficit = jnp.maximum(maybe_deficit,
                                                jnp.max(_bint(won)))

            # --- pellets (SPEC M1): parked-coord eligibility, contested by
            # gkey. Dead pellets/pads sit at _DEAD so NO alive-mask ops run
            # in the inner passes; both branches return gone as f32 and the
            # park update happens once outside the cond (carry size
            # unchanged vs the old palive update). ------------------------
            radc = _radius(cmass)
            food_eaten = food_eaten_in
            highest = highest_in
            eaten_pc = jnp.zeros((PC, E), jnp.int32)
            PCHUNK = 128
            if phases >= 4:
                # pad to the actual scratch plane size (>= the pellet pad:
                # large-roster configs enlarge the planes for cross-eat
                # staging); parked pad rows sit at _DEAD and never match
                n_chunks = np_pad_scratch // PCHUNK
                pad = np_pad_scratch - Np
                if pad:
                    px_p = jnp.concatenate(
                        [pxw, jnp.full((pad, E), _DEAD)], axis=0)
                    py_p = jnp.concatenate(
                        [pyw, jnp.full((pad, E), _DEAD)], axis=0)
                else:
                    px_p, py_p = pxw, pyw

                # contested (multi-cell) paths read chunks from the scratch
                # copy via dynamic ds inside fori_loop bodies: straight-line
                # (unrolled) code inside a cond branch costs ~60% of its
                # executed cost even when the branch is NEVER taken
                # (bench/pellet_probe.py cond_fat vs cond_fat_loop — the
                # tax follows static instruction-block size, and scf.for
                # bodies stay small), so the fat passes must be rolled.
                if P == 1:
                    # at rest (single-cell) the scratch is never read
                    @pl.when(multi_blk)
                    def _fill_scratch():
                        s_pxw[...] = px_p
                        s_pyw[...] = py_p
                else:
                    s_pxw[...] = px_p
                    s_pyw[...] = py_p

                def pellets_full():
                    radc2 = radc * radc

                    def pass1(k, carry):
                        cpx = s_pxw[pl.ds(k * PCHUNK, PCHUNK), :]
                        cpy = s_pyw[pl.ds(k * PCHUNK, PCHUNK), :]
                        # (PC, PCHUNK, E); dead cells have mass masked to 0
                        # at the previous writeback -> radius 0, and parked
                        # pellets sit ~1e9 away -> no mask ops needed beyond
                        # calive (a dead cell could sit exactly ON a stale
                        # pellet with r = 0 and d = 0)
                        pdx = cx[:, None, :] - cpx[None, :, :]
                        pdy = cy[:, None, :] - cpy[None, :, :]
                        pd2 = pdx * pdx + pdy * pdy
                        elig = (calive[:, None, :]
                                & (radc2[:, None, :] >= pd2))
                        pkey = jnp.where(elig, gkey[:, None, :], _BIG_I)
                        s_pmin[pl.ds(k * PCHUNK, PCHUNK), :] = jnp.min(
                            pkey, axis=0)                     # (PCHUNK, E)
                        return carry

                    def pass2(k, eat):
                        cpx = s_pxw[pl.ds(k * PCHUNK, PCHUNK), :]
                        cpy = s_pyw[pl.ds(k * PCHUNK, PCHUNK), :]
                        pdx = cx[:, None, :] - cpx[None, :, :]
                        pdy = cy[:, None, :] - cpy[None, :, :]
                        pd2 = pdx * pdx + pdy * pdy
                        elig = (calive[:, None, :]
                                & (radc2[:, None, :] >= pd2))
                        pmin = s_pmin[pl.ds(k * PCHUNK, PCHUNK), :]
                        win = elig & (gkey[:, None, :] == pmin[None, :, :])
                        return eat + jnp.sum(_bint(win), axis=1)

                    jax.lax.fori_loop(0, n_chunks, pass1, jnp.int32(0))
                    eat = jax.lax.fori_loop(0, n_chunks, pass2,
                                            jnp.zeros((PC, E), jnp.int32))
                    gone = jnp.where(s_pmin[...] < _BIG_I, 1.0, 0.0)
                    return eat, gone[:Np]

                def pellets_single():
                    # every player in the block has <= 1 live cell: the lone
                    # cell's fields extract EXACTLY via masked sums (a dead
                    # player sums to centroid (0,0) with radius 0, which no
                    # pellet coordinate can satisfy), and gkey arbitration
                    # (pid*Cc + rank, rank = 0) degenerates to pid order.
                    ai = jnp.where(calive, 1.0, 0.0)
                    sx = preduce(cx * ai, jnp.sum)            # (P, E)
                    sy = preduce(cy * ai, jnp.sum)
                    sr = preduce(radc * ai, jnp.sum)
                    sr2 = sr * sr
                    if P == 1:
                        # one unchunked (Np, E) pass: 6 VPU ops + one f32
                        # sum; this is the branch that executes at rest
                        pdx = sx - pxw                        # (Np, E)
                        pdy = sy - pyw
                        gonef = jnp.where(
                            pdx * pdx + pdy * pdy <= sr2, 1.0, 0.0)
                        eat_p = jnp.sum(gonef, axis=0,
                                        keepdims=True).astype(jnp.int32)
                        eat = jnp.where(calive, pexpand(eat_p), 0)
                        return eat, gonef
                    pid3 = jax.lax.broadcasted_iota(jnp.int32, (P, 1, 1), 0)

                    def chunk1(k, eat_p):
                        cpx = s_pxw[pl.ds(k * PCHUNK, PCHUNK), :]
                        cpy = s_pyw[pl.ds(k * PCHUNK, PCHUNK), :]
                        pdx = sx[:, None, :] - cpx[None, :, :]
                        pdy = sy[:, None, :] - cpy[None, :, :]
                        pd2 = pdx * pdx + pdy * pdy
                        elig = sr2[:, None, :] >= pd2
                        key = jnp.where(elig, pid3, _BIG_I)
                        kmin = jnp.min(key, axis=0)           # (PCHUNK, E)
                        s_pmin[pl.ds(k * PCHUNK, PCHUNK), :] = kmin
                        win = elig & (key == kmin[None, :, :])
                        return eat_p + jnp.sum(_bint(win), axis=1)

                    eat_p = jax.lax.fori_loop(0, n_chunks, chunk1,
                                              jnp.zeros((P, E), jnp.int32))
                    eat = jnp.where(calive, pexpand(eat_p), 0)
                    gone = jnp.where(s_pmin[...] < _BIG_I, 1.0, 0.0)
                    return eat, gone[:Np]

                eaten_pc, pgone = jax.lax.cond(multi_blk, pellets_full,
                                               pellets_single)
                pxw = jnp.where(pgone != 0.0, _DEAD, pxw)
                pyw = jnp.where(pgone != 0.0, _DEAD, pyw)
                if ms.pellet_regen and phases >= 9:
                    maybe_deficit = jnp.maximum(
                        maybe_deficit,
                        (jnp.max(pgone) != 0.0).astype(jnp.int32))
                cmass = cmass + eaten_pc * C.PELLET_MASS
                food_eaten = food_eaten_in + preduce(eaten_pc, jnp.sum)
                pm_now = preduce(jnp.where(calive, cmass, 0), jnp.sum)
                highest = jnp.maximum(highest_in, pm_now)

            # --- auto-split + foods + feed + split (phase 5) ------------------
            do_actions = phases >= 5
            if do_actions:
                over = calive & (cmass >= C.MAX_MASS_IN_THE_GAME)
            else:
                over = jnp.zeros_like(calive)
            if sub >= 3:
                may = n_start < C.PLAYER_CELL_LIMIT               # (P, E)
                do_aspl = over & pexpand(may)
                clampm = over & ~pexpand(may)
                a_rem, a_nf = split_fields(cx, cy, cmass, txc, tyc)
                cmass = jnp.where(
                    do_aspl, a_rem,
                    jnp.where(clampm, C.NEW_MASS_IF_NO_SPLIT, cmass))
                crecomb = jnp.where(do_aspl, elc + C.RECOMBINE_TICKS, crecomb)
                n_auto = preduce(_bint(do_aspl), jnp.sum)         # (P, E)

            FCH = 32 if Nf % 32 == 0 else Nf
            if Nf > 0 and do_actions and loo != 4:
                rf = _radius(np.float32(C.FOOD_MASS))


                def foods_full():
                    # rolled into fori_loop chunks like pellets_full (the
                    # unrolled (PC, Nf, E) body is taxed ~60% of its cost
                    # every tick even untaken, bench/pellet_probe.py).
                    # Dead foods park at _DEAD in the scratch copy so the
                    # chunk test needs no falive mask.
                    s_pxw[0:Nf, :] = jnp.where(falive, fx, _DEAD)
                    s_pyw[0:Nf, :] = jnp.where(falive, fy, _DEAD)
                    radc2 = _radius(cmass)
                    rm2 = jnp.maximum(radc2[:, None, :], rf)  # (PC, 1, E)
                    can_f = cmass[:, None, :] > np.int32(
                        C.FOOD_MASS * C.CELL_EAT_MARGIN)
                    rm22 = rm2 * rm2

                    def fbody(k, eat):
                        cfx = s_pxw[pl.ds(k * FCH, FCH), :]
                        cfy = s_pyw[pl.ds(k * FCH, FCH), :]
                        fdx = cx[:, None, :] - cfx[None, :, :]
                        fdy = cy[:, None, :] - cfy[None, :, :]
                        fd2 = fdx * fdx + fdy * fdy
                        felig = (calive[:, None, :] & can_f
                                 & (rm22 >= fd2))             # (PC, FCH, E)
                        fkey = jnp.where(felig, gkey[:, None, :], _BIG_I)
                        fmin = jnp.min(fkey, axis=0)          # (FCH, E)
                        s_pmin[pl.ds(k * FCH, FCH), :] = fmin
                        fwin = felig & (fkey == fmin[None, :, :])
                        return eat + jnp.sum(_bint(fwin), axis=1)

                    eat = jax.lax.fori_loop(0, Nf // FCH, fbody,
                                            jnp.zeros((PC, E), jnp.int32))
                    return eat, _bint(s_pmin[0:Nf, :] < _BIG_I)

                def foods_single():
                    # single-live-cell block: (P, Nf, E) instead of
                    # (PC, Nf, E) — same exact-extraction argument as
                    # pellets_single (cmass/radius re-read here: pellets
                    # and auto-split already updated them this tick)
                    ai = jnp.where(calive, 1.0, 0.0)
                    sxf = preduce(cx * ai, jnp.sum)           # (P, E)
                    syf = preduce(cy * ai, jnp.sum)
                    srf = preduce(_radius(cmass) * ai, jnp.sum)
                    smf = preduce(jnp.where(calive, cmass, 0), jnp.sum)
                    hasp = n_start > 0
                    fdx = sxf[:, None, :] - fx[None, :, :]    # (P, Nf, E)
                    fdy = syf[:, None, :] - fy[None, :, :]
                    fd2 = fdx * fdx + fdy * fdy
                    rm2 = jnp.maximum(srf[:, None, :], rf)
                    can_f = smf[:, None, :] > np.int32(
                        C.FOOD_MASS * C.CELL_EAT_MARGIN)
                    felig = (hasp[:, None, :] & falive[None, :, :] & can_f
                             & (rm2 * rm2 >= fd2))
                    if P == 1:
                        fwin = felig
                        fgone = _bint(felig[0])
                    else:
                        pid3 = jax.lax.broadcasted_iota(
                            jnp.int32, (P, 1, 1), 0)
                        fkey = jnp.where(felig, pid3, _BIG_I)
                        fmin = jnp.min(fkey, axis=0)          # (Nf, E)
                        fwin = felig & (fkey == fmin[None, :, :])
                        fgone = _bint(fmin < _BIG_I)
                    eat_p = jnp.sum(_bint(fwin), axis=1)      # (P, E)
                    return jnp.where(calive, pexpand(eat_p), 0), fgone

                # the whole eat pass is inert without a live food (the usual
                # state: ejected mass is rare and short-lived); the outer
                # block-level branch skips both (…, Nf, E) passes and costs
                # only the small (PC, E)+(Nf, E) carries
                def foods_none():
                    return (jnp.zeros((PC, E), jnp.int32),
                            jnp.zeros((Nf, E), jnp.int32))

                eaten_fc, fgone = jax.lax.cond(
                    jnp.max(_bint(falive)) > 0,
                    lambda: jax.lax.cond(multi_blk, foods_full,
                                         foods_single),
                    foods_none)
                falive = falive & (fgone == 0)
                cmass = cmass + eaten_fc * C.FOOD_MASS
                food_eaten = food_eaten + preduce(eaten_fc, jnp.sum)

            # feed emission (slots land in global (pid, rank) order, SPEC Q14)
            if sub >= 3:
                feed_cd = jnp.maximum(feed_cd_in - 1, 0)
                do_feed = (action_eff == 1) & (feed_cd == 0)      # (P, E)
                if not do_actions:
                    do_feed = jnp.zeros_like(do_feed)
                emit = (calive & pexpand(do_feed)
                        & (cmass >= C.CELL_MIN_SIZE + C.FOOD_MASS))
            if Nf > 0 and do_actions and loo != 5:
                # inert without a feeding cell this tick (feed actions are
                # rare); one block-level branch skips the (PC, Nf, E)
                # emission one-hot machinery
                def feed_run(fx=fx, fy=fy, fvx=fvx, fvy=fvy, falive=falive,
                             fnext=fnext, cmass=cmass):
                    edx = txc - cx
                    edy = tyc - cy
                    en = jnp.maximum(jnp.sqrt(edx * edx + edy * edy), 1e-12)
                    edx = edx / en
                    edy = edy / en
                    # radius from the CURRENT mass (post pellet/virus/auto-
                    # split/food gains), matching emit_foods
                    # (engine/actions.py:265-266)
                    rade = _radius(cmass)
                    elx = cx + edx * rade
                    ely = cy + edy * rade
                    evx = edx * C.FOOD_SPEED
                    evy = edy * C.FOOD_SPEED
                    ekey = jnp.where(emit, gkey, _BIG_I)
                    eord = jnp.sum(_bint((ekey[None, :, :] < ekey[:, None, :])
                                         & emit[None, :, :]), axis=1)
                    slot = (fnext + eord) % Nf                # (PC, E)
                    # the (PC, Nf, E) slot one-hot + four masked sums ride
                    # fori_loop chunks through scratch (unrolled fat cond
                    # bodies are taxed even untaken, bench/pellet_probe.py)
                    s_pxw[0:Nf, :] = fx
                    s_pyw[0:Nf, :] = fy
                    s_aux1[0:Nf, :] = fvx
                    s_aux2[0:Nf, :] = fvy
                    s_pmin[0:Nf, :] = _bint(falive)

                    def febody(k, c):
                        fiota = (jax.lax.broadcasted_iota(
                            jnp.int32, (1, FCH, 1), 1) + k * FCH)
                        oh = emit[:, None, :] & (slot[:, None, :] == fiota)
                        wrote_i = jnp.max(_bint(oh), axis=0)  # (FCH, E)
                        wrote = wrote_i > 0
                        ohf = jnp.where(oh, 1.0, 0.0)
                        ds = pl.ds(k * FCH, FCH)
                        s_pxw[ds, :] = jnp.where(
                            wrote, jnp.sum(elx[:, None, :] * ohf, axis=0),
                            s_pxw[ds, :])
                        s_pyw[ds, :] = jnp.where(
                            wrote, jnp.sum(ely[:, None, :] * ohf, axis=0),
                            s_pyw[ds, :])
                        s_aux1[ds, :] = jnp.where(
                            wrote, jnp.sum(evx[:, None, :] * ohf, axis=0),
                            s_aux1[ds, :])
                        s_aux2[ds, :] = jnp.where(
                            wrote, jnp.sum(evy[:, None, :] * ohf, axis=0),
                            s_aux2[ds, :])
                        s_pmin[ds, :] = jnp.maximum(s_pmin[ds, :], wrote_i)
                        return c

                    jax.lax.fori_loop(0, Nf // FCH, febody, jnp.int32(0))
                    fx = s_pxw[0:Nf, :]
                    fy = s_pyw[0:Nf, :]
                    fvx = s_aux1[0:Nf, :]
                    fvy = s_aux2[0:Nf, :]
                    falive_i = s_pmin[0:Nf, :]
                    fnext = fnext + jnp.sum(_bint(emit), axis=0,
                                            keepdims=True)
                    cmass = jnp.where(emit, cmass - C.FOOD_MASS, cmass)
                    # bools cross the scf.if as int32 (i1 vector results
                    # fail Mosaic legalization, like scf.for carries)
                    return fx, fy, fvx, fvy, falive_i, fnext, cmass

                fx, fy, fvx, fvy, falive_i, fnext, cmass = jax.lax.cond(
                    jnp.max(_bint(emit)) > 0, feed_run,
                    lambda: (fx, fy, fvx, fvy, _bint(falive), fnext, cmass))
                falive = falive_i > 0
            if sub >= 3:
                feed_cd = jnp.where(do_feed, C.FEED_COOLDOWN, feed_cd)
                feed_cd = jnp.where(palive_p, feed_cd, feed_cd_in)

                # split
                split_cd = jnp.maximum(split_cd_in - 1, 0)
                do_split = (action_eff == 2) & (split_cd == 0)    # (P, E)
                if not do_actions:
                    do_split = jnp.zeros_like(do_split)
                limit = jnp.maximum(
                    C.PLAYER_CELL_LIMIT - n_start - num_new - n_auto,
                    0)                                            # (P, E)
                s_elig = calive & (cmass >= C.CELL_SPLIT_MINIMUM) \
                    & pexpand(do_split)
                if loo == 6:
                    sords = [jnp.zeros((Cc, E), jnp.int32)] * P
                else:
                    sords = []
                    for p in range(P):
                        se = pslice(s_elig, p)
                        sk = jnp.where(se, pslice(rank, p), _BIG_I)
                        sords.append(jnp.sum(
                            _bint((sk[None, :, :] < sk[:, None, :])
                                  & se[None, :, :]), axis=1))
                sord = pcat(sords)
                chosen = s_elig & (sord < pexpand(limit))
                s_rem, s_nf = split_fields(cx, cy, cmass, txc, tyc)
                cmass = jnp.where(chosen, s_rem, cmass)
                crecomb = jnp.where(chosen, elc + C.RECOMBINE_TICKS, crecomb)
                split_cd = jnp.where(do_split, C.SPLIT_COOLDOWN, split_cd)
                split_cd = jnp.where(palive_p, split_cd, split_cd_in)

            # --- place created cells (SPEC M8) --------------------------------
            # Ids are phase-major like the XLA tick's three place_new_cells
            # calls: all players' disrupt cells, then all autos, then all
            # splits, pid-major within a phase (engine/actions.py:54-59).
            if phases >= 3 and loo != 9:
                K = C.PLAYER_CELL_LIMIT
                kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)   # (K, 1)
                pop_speed = _max_speed(np.float32(C.CELL_POP_SIZE))

                free_cnt = preduce(_bint(~calive), jnp.sum)       # (P, E)
                n_vd = jnp.minimum(num_new, free_cnt)
                n_va = jnp.minimum(n_auto, free_cnt - n_vd)
                n_sp = preduce(_bint(chosen), jnp.sum)
                n_vs = jnp.minimum(n_sp, free_cnt - n_vd - n_va)

                def prefixes(counts):
                    pre, acc = [], jnp.zeros((1, E), jnp.int32)
                    for p in range(P):
                        pre.append(acc)
                        acc = acc + counts[p:p + 1]
                    return pre, acc

                pre_d, tot_d = prefixes(n_vd)
                pre_a, tot_a = prefixes(n_va)
                pre_s, tot_s = prefixes(n_vs)
                base_d = next_id
                base_a = next_id + tot_d
                base_s = next_id + tot_d + tot_a
                next_id = next_id + tot_d + tot_a + tot_s

                def cat(*parts):
                    return jnp.concatenate(parts, axis=0)

                NEWK = K + 2 * Cc
                CH2 = 4 if NEWK % 4 == 0 else 2   # NEWK = 16 + 2*Cc: even

                # new cells appear only on disruption / auto-split / split
                # — rare per tick, so the whole placement pass sits behind
                # one block-level branch; the (NEWK, Cc, E) claim one-hot
                # rides fori chunks through scratch (the unrolled form is
                # 96-vreg-class and pays the untaken footprint tax,
                # CLAUDE.md). Cross-chunk accumulation is exact: each free
                # slot is claimed by at most one candidate (orderv values
                # are distinct among valid candidates), so the field sums
                # have a single nonzero term and `claimed` is a plain OR.
                def place_run(cx=cx, cy=cy, cvx=cvx, cvy=cvy, svx=svx,
                              svy=svy, cmass=cmass, cid=cid,
                              crecomb=crecomb, calive=calive):
                    outs = {f: [] for f in
                            ("cx", "cy", "cvx", "cvy", "svx", "svy",
                             "cmass", "cid", "crecomb", "calive")}
                    for p in range(P):
                        nn = num_new[p:p + 1]
                        d_mask = prow(disr, p) & (kk < nn)        # (K, E)
                        cth, sth = _dir_cos_sin(hit_cvx[p:p + 1],
                                                hit_cvy[p:p + 1])
                        c2 = cth * cth - sth * sth
                        s2 = 2.0 * cth * sth
                        nnf = jnp.maximum(nn, 1).astype(jnp.float32)
                        phik = 2.0 * jnp.pi * kk.astype(jnp.float32) / nnf
                        cphi = jnp.cos(phik)
                        sphi = jnp.sin(phik)
                        cos_ang = c2 * cphi - s2 * sphi           # (K, E)
                        sin_ang = s2 * cphi + c2 * sphi
                        d_mass = jnp.maximum(jnp.minimum(
                            pop_mass[p:p + 1] - C.CELL_POP_SIZE * kk,
                            C.CELL_POP_SIZE), 1)

                        a_mask = pslice(do_aspl, p)               # (Cc, E)
                        s_mask = pslice(chosen, p)
                        akey = jnp.where(a_mask, pslice(rank, p), _BIG_I)
                        a_ord = jnp.sum(
                            _bint((akey[None, :, :] < akey[:, None, :])
                                  & a_mask[None, :, :]), axis=1)
                        sord_p = pslice(sord, p)

                        cand_mask = cat(_bint(d_mask), _bint(a_mask),
                                        _bint(s_mask)) > 0        # (NEWK, E)
                        cand_order = cat(
                            jnp.where(d_mask,
                                      jnp.broadcast_to(kk, (K, E)), _BIG_I),
                            jnp.where(a_mask, nn + a_ord, _BIG_I),
                            jnp.where(s_mask, nn + n_auto[p:p + 1] + sord_p,
                                      _BIG_I))
                        cand_id = cat(
                            base_d + pre_d[p] + jnp.broadcast_to(kk, (K, E)),
                            base_a + pre_a[p] + a_ord,
                            base_s + pre_s[p] + sord_p)
                        cand_x = cat(jnp.broadcast_to(hit_vx[p:p + 1],
                                                      (K, E)),
                                     pslice(a_nf["x"], p), pslice(s_nf["x"],
                                                                  p))
                        cand_y = cat(jnp.broadcast_to(hit_vy[p:p + 1],
                                                      (K, E)),
                                     pslice(a_nf["y"], p), pslice(s_nf["y"],
                                                                  p))
                        cand_vx = cat(jnp.broadcast_to(hit_cvx[p:p + 1],
                                                       (K, E)),
                                      pslice(a_nf["vx"], p),
                                      pslice(s_nf["vx"], p))
                        cand_vy = cat(jnp.broadcast_to(hit_cvy[p:p + 1],
                                                       (K, E)),
                                      pslice(a_nf["vy"], p),
                                      pslice(s_nf["vy"], p))
                        cand_svx = cat(cos_ang * pop_speed,
                                       pslice(a_nf["vx"], p),
                                       pslice(s_nf["vx"], p))
                        cand_svy = cat(sin_ang * pop_speed,
                                       pslice(a_nf["vy"], p),
                                       pslice(s_nf["vy"], p))
                        cand_mass = jnp.maximum(
                            cat(d_mass, pslice(a_nf["mass"], p),
                                pslice(s_nf["mass"], p)), C.CELL_MIN_SIZE)

                        calive_p = pslice(calive, p)
                        free = ~calive_p
                        num_free = jnp.sum(_bint(free), axis=0,
                                           keepdims=True)
                        free_rank = _cumsum0(_bint(free)) - 1     # (Cc, E)
                        orderv = jnp.where(cand_mask, cand_order, _BIG_I)

                        # stage candidates for the chunked claim loop
                        s_pxw[0:NEWK, :] = cand_x
                        s_pxw[NEWK:2 * NEWK, :] = cand_y
                        s_pyw[0:NEWK, :] = cand_vx
                        s_pyw[NEWK:2 * NEWK, :] = cand_vy
                        s_aux1[0:NEWK, :] = cand_svx
                        s_aux1[NEWK:2 * NEWK, :] = cand_svy
                        s_aux2[0:NEWK, :] = cand_mass.astype(jnp.float32)
                        s_pmin[0:NEWK, :] = cand_id
                        s_pmin[NEWK:2 * NEWK, :] = orderv

                        def pbody(ki, carry):
                            (clm, wx, wy, wvx, wvy, wsx, wsy, wm,
                             wid) = carry
                            o = s_pmin[pl.ds(NEWK + ki * CH2, CH2), :]
                            # (CH2, Cc, E): candidate claims the free slot
                            # whose free-rank equals its order
                            oh2 = ((o < num_free)[:, None, :]
                                   & free[None, :, :]
                                   & (free_rank[None, :, :]
                                      == o[:, None, :]))
                            ohf = jnp.where(oh2, 1.0, 0.0)
                            clm = jnp.maximum(clm,
                                              jnp.max(_bint(oh2), axis=0))

                            def fsum(ref, off, acc):
                                v = ref[pl.ds(off + ki * CH2, CH2), :]
                                return acc + jnp.sum(v[:, None, :] * ohf,
                                                     axis=0)
                            wx = fsum(s_pxw, 0, wx)
                            wy = fsum(s_pxw, NEWK, wy)
                            wvx = fsum(s_pyw, 0, wvx)
                            wvy = fsum(s_pyw, NEWK, wvy)
                            wsx = fsum(s_aux1, 0, wsx)
                            wsy = fsum(s_aux1, NEWK, wsy)
                            wm = fsum(s_aux2, 0, wm)
                            idc = s_pmin[pl.ds(ki * CH2, CH2), :]
                            wid = wid + jnp.sum(
                                jnp.where(oh2, idc[:, None, :], 0), axis=0)
                            return (clm, wx, wy, wvx, wvy, wsx, wsy, wm,
                                    wid)

                        zf = jnp.zeros((Cc, E), jnp.float32)
                        (clm, wx, wy, wvx, wvy, wsx, wsy, wm,
                         wid) = jax.lax.fori_loop(
                            0, NEWK // CH2, pbody,
                            (jnp.zeros((Cc, E), jnp.int32), zf, zf, zf,
                             zf, zf, zf, zf,
                             jnp.zeros((Cc, E), jnp.int32)))
                        claimed = clm > 0
                        outs["cx"].append(jnp.where(claimed, wx,
                                                    pslice(cx, p)))
                        outs["cy"].append(jnp.where(claimed, wy,
                                                    pslice(cy, p)))
                        outs["cvx"].append(jnp.where(claimed, wvx,
                                                     pslice(cvx, p)))
                        outs["cvy"].append(jnp.where(claimed, wvy,
                                                     pslice(cvy, p)))
                        outs["svx"].append(jnp.where(claimed, wsx,
                                                     pslice(svx, p)))
                        outs["svy"].append(jnp.where(claimed, wsy,
                                                     pslice(svy, p)))
                        # the staged mass is an exact small int in f32 (one
                        # nonzero term per slot); ids stay int32 end-to-end
                        outs["cmass"].append(jnp.where(
                            claimed, wm.astype(jnp.int32),
                            pslice(cmass, p)))
                        outs["cid"].append(jnp.where(claimed, wid,
                                                     pslice(cid, p)))
                        outs["crecomb"].append(jnp.where(
                            claimed, elapsed[p:p + 1] + C.RECOMBINE_TICKS,
                            pslice(crecomb, p)))
                        outs["calive"].append(_bint(calive_p | claimed))
                    return (pcat(outs["cx"]), pcat(outs["cy"]),
                            pcat(outs["cvx"]), pcat(outs["cvy"]),
                            pcat(outs["svx"]), pcat(outs["svy"]),
                            pcat(outs["cmass"]), pcat(outs["cid"]),
                            pcat(outs["crecomb"]), pcat(outs["calive"]))

                def place_skip():
                    return (cx, cy, cvx, cvy, svx, svy, cmass, cid,
                            crecomb, _bint(calive))

                # nonstandard rosters whose candidate tables exceed the
                # scratch rows keep the placement unconditional via a
                # 1-chunk "loop" (canonicalized to straight-line — only
                # reachable for max_cells > 24, which no config uses)
                if 2 * NEWK <= s_pxw.shape[0]:
                    any_new = jnp.max(n_vd + n_va + n_vs) > 0
                    (cx, cy, cvx, cvy, svx, svy, cmass, cid, crecomb,
                     calive_i) = jax.lax.cond(any_new, place_run,
                                              place_skip)
                    calive = calive_i > 0
                else:
                    raise NotImplementedError(
                        "fused placement needs 2*(PLAYER_CELL_LIMIT + "
                        "2*max_cells) pellet-scratch rows; use the XLA "
                        "backend for max_cells > 56")

            # --- recombine (SPEC M7), per player ------------------------------
            if phases >= 6 and loo != 10:
                ncm, ncl = [], []
                RCH = 4 if Cc % 4 == 0 else (2 if Cc % 2 == 0 else Cc)
                for p in range(P):
                    cidp = pslice(cid, p)
                    crp = pslice(crecomb, p)
                    cxp = pslice(cx, p)
                    cyp = pslice(cy, p)
                    elp = elapsed[p:p + 1]

                    # the (Cc, Cc, E) matching tables ride RCH-row fori
                    # chunks through scratch (same footprint rule as the
                    # relax/placement passes; this pass is untaken until a
                    # player has two recombinable cells). Exact: rk sums
                    # the full j axis per chunk, bst is a running min, and
                    # pass C recomputes the winner mask with the final bst.
                    def rec_body(_, carry, cidp=cidp, crp=crp, cxp=cxp,
                                 cyp=cyp, elp=elp):
                        cm_, al_ = carry
                        alive2 = al_ > 0
                        key = jnp.where(alive2, cidp, _BIG_I)
                        can2 = alive2 & (elp >= crp)
                        radm = _radius(cm_)
                        s_pmin[0:Cc, :] = key
                        s_pmin[Cc:2 * Cc, :] = _bint(can2)
                        s_pxw[0:Cc, :] = cxp
                        s_pxw[Cc:2 * Cc, :] = cyp
                        s_pyw[0:Cc, :] = radm

                        def passA(ci, c):
                            kI = s_pmin[pl.ds(ci * RCH, RCH), :]
                            rkc = jnp.sum(_bint(key[None, :, :]
                                                < kI[:, None, :]), axis=1)
                            s_pmin[pl.ds(2 * Cc + ci * RCH, RCH), :] = rkc
                            return c

                        jax.lax.fori_loop(0, Cc // RCH, passA, jnp.int32(0))
                        rk = s_pmin[2 * Cc:3 * Cc, :]          # (Cc, E)

                        def chunk_elig(ci):
                            kds = pl.ds(ci * RCH, RCH)
                            rkI = s_pmin[pl.ds(2 * Cc + ci * RCH, RCH), :]
                            canI = s_pmin[pl.ds(Cc + ci * RCH, RCH), :] > 0
                            cxI = s_pxw[kds, :]
                            cyI = s_pxw[pl.ds(Cc + ci * RCH, RCH), :]
                            radI = s_pyw[kds, :]
                            dx = cxp[None, :, :] - cxI[:, None, :]
                            dy = cyp[None, :, :] - cyI[:, None, :]
                            d2 = dx * dx + dy * dy
                            rs = (radI[:, None, :] + radm[None, :, :]
                                  + np.float32(C.RECOMBINE_TOUCH_EPS))
                            lw = rkI[:, None, :] < rk[None, :, :]
                            elig = (canI[:, None, :] & can2[None, :, :] & lw
                                    & (rs * rs >= d2))
                            keyr = jnp.where(
                                elig, rkI[:, None, :] * Cc + rk[None, :, :],
                                _BIG_I)
                            return keyr

                        def passB(ci, bst):
                            keyr = chunk_elig(ci)
                            return jnp.minimum(
                                bst, jnp.min(jnp.min(keyr, axis=1), axis=0,
                                             keepdims=True))

                        bst = jax.lax.fori_loop(
                            0, Cc // RCH, passB,
                            jnp.full((1, E), _BIG_I, jnp.int32))

                        def passC(ci, wj):
                            keyr = chunk_elig(ci)
                            wpair = keyr == bst[None]
                            s_pmin[pl.ds(3 * Cc + ci * RCH, RCH), :] = \
                                jnp.max(_bint(wpair), axis=1)
                            return jnp.maximum(wj,
                                               jnp.max(_bint(wpair), axis=0))

                        wj_i = jax.lax.fori_loop(
                            0, Cc // RCH, passC,
                            jnp.zeros((Cc, E), jnp.int32))
                        wi = s_pmin[3 * Cc:4 * Cc, :] > 0
                        wj = wj_i > 0
                        has = bst < _BIG_I
                        gain = jnp.sum(jnp.where(wj, cm_, 0), axis=0,
                                       keepdims=True)
                        cm_ = jnp.where(wi & has, cm_ + gain, cm_)
                        alive2 = alive2 & ~(wj & has)
                        return cm_, _bint(alive2)

                    clp = pslice(calive, p)
                    rec_count = jnp.sum(_bint(clp & (elp >= crp)), axis=0,
                                        keepdims=True)
                    poss = jnp.max(rec_count) >= 2

                    def run_rec(c, rec_body=rec_body):
                        return jax.lax.fori_loop(0, Cc // 2, rec_body, c)

                    m2, a2 = jax.lax.cond(poss, run_rec, lambda c: c,
                                          (pslice(cmass, p), _bint(clp)))
                    ncm.append(m2)
                    ncl.append(a2 > 0)
                cmass = pcat(ncm)
                calive = pcat(ncl)

            # --- anti-team + decay --------------------------------------------
            last_decay = last_decay_in
            anti_team = anti_team_in
            if ms.mass_decay and phases >= 7 and loo != 11:
                due = palive_p & (elapsed % 60 == 0)              # (P, E)
                KT2 = vticks.shape[0] // P
                fall_off = elapsed - C.ANTI_TEAM_ACTIVATION_TICKS
                expired = vticks < fexpand(fall_off, KT2)
                vticks = jnp.where(fexpand(due, KT2) & expired,
                                   np.int32(-(2**30)), vticks)
                n_recent = freduce(_bint(vticks != np.int32(-(2**30))), KT2,
                                   jnp.sum)                       # (P, E)
                anti_team = jnp.where(due & (n_recent > 0),
                                      jnp.power(1.1, (n_recent - 1)
                                                .astype(jnp.float32)),
                                      anti_team)
                do_decay = due & (elapsed - last_decay >= C.DECAY_TICKS)
                decayed = jnp.maximum(
                    (cmass.astype(jnp.float32)
                     * (1.0 - C.PLAYER_DECAY_RATE * pexpand(anti_team)))
                    .astype(jnp.int32), C.CELL_MIN_SIZE)
                cmass = jnp.where(pexpand(do_decay) & calive, decayed, cmass)
                last_decay = jnp.where(do_decay, elapsed, last_decay)

            # --- cross-player eating (Engine.hpp:150-200, SPEC M3) ------------
            if P > 1 and phases >= 8 and loo != 12:
                rk2 = rank_of(cid, calive)
                gkey2 = pidc * Cc + rk2                           # (PC, E)
                # large rosters: the full (PC, PC, E) pairwise tables are
                # fat (P=9 -> (144, 144, E) = 10.6 MB/value at E=128), so
                # the i (eater) axis rides XCH-row fori chunks through
                # VMEM scratch exactly like the relax chunk_pass. The
                # arithmetic is identical: the per-prey winner key minj is
                # a running min across chunks, and gains/counts are
                # per-eater-row sums over j computed inside each chunk.
                # Masked staging (mass/key zeroed for dead cells) changes
                # values only where calive already kills eligibility.
                XCH = 8
                x_chunked = (PC > 48 and PC % XCH == 0
                             and 2 * PC <= np_pad_scratch)
                if x_chunked:
                    mj_eff = jnp.where(calive, cmass, 0)   # snapshot masses
                    key_eff = jnp.where(calive, gkey2, _BIG_I)
                    s_pxw[0:PC, :] = cx
                    s_pyw[0:PC, :] = cy
                    s_pmin[0:PC, :] = mj_eff
                    s_pmin[PC:2 * PC, :] = key_eff
                    radc_j = _radius(cmass)
                    mjf = mj_eff.astype(jnp.float32)
                    pid_j = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, PC, 1), 1) // Cc)

                    def xgeom(ci):
                        """(XCH, PC, E) eligibility + key tables of eater
                        rows [ci*XCH, ci*XCH+XCH) vs every prey j."""
                        cxI = s_pxw[pl.ds(ci * XCH, XCH), :]
                        cyI = s_pyw[pl.ds(ci * XCH, XCH), :]
                        cmI = s_pmin[pl.ds(ci * XCH, XCH), :]
                        keyI = s_pmin[pl.ds(PC + ci * XCH, XCH), :]
                        radI = jnp.sqrt(cmI.astype(jnp.float32) / jnp.pi)
                        xdx = cxI[:, None, :] - cx[None, :, :]
                        xdy = cyI[:, None, :] - cy[None, :, :]
                        xd2 = xdx * xdx + xdy * xdy
                        xrm = jnp.maximum(radI[:, None, :],
                                          radc_j[None, :, :])
                        miI = cmI[:, None, :]
                        pidI = ((jax.lax.broadcasted_iota(
                            jnp.int32, (XCH, 1, 1), 0) + ci * XCH) // Cc)
                        xelig = ((keyI < _BIG_I)[:, None, :]
                                 & calive[None, :, :] & (pidI != pid_j)
                                 & (miI > C.CELL_EAT_REQUIREMENT)
                                 & (miI.astype(jnp.float32)
                                    > mjf[None, :, :] * C.CELL_EAT_MARGIN)
                                 & (xrm * xrm >= xd2))
                        xkey = jnp.where(xelig, keyI[:, None, :], _BIG_I)
                        return xelig, xkey

                    def xpass1(ci, mkj):
                        _, xkey = xgeom(ci)
                        return jnp.minimum(mkj, jnp.min(xkey, axis=0))

                    minj = jax.lax.fori_loop(
                        0, PC // XCH, xpass1,
                        jnp.full((PC, E), _BIG_I, jnp.int32))

                    def xpass2(ci, carry):
                        xelig, xkey = xgeom(ci)
                        xwin = xelig & (xkey == minj[None, :, :])
                        s_aux1[pl.ds(ci * XCH, XCH), :] = jnp.sum(
                            jnp.where(xwin, mj_eff[None, :, :], 0),
                            axis=1).astype(jnp.float32)
                        s_aux2[pl.ds(ci * XCH, XCH), :] = jnp.sum(
                            _bint(xwin), axis=1).astype(jnp.float32)
                        return carry

                    jax.lax.fori_loop(0, PC // XCH, xpass2, jnp.int32(0))
                    gain = s_aux1[0:PC, :].astype(jnp.int32)
                    cnt = s_aux2[0:PC, :].astype(jnp.int32)
                else:
                    radc3 = _radius(cmass)
                    xdx = cx[None, :, :] - cx[:, None, :]         # [i, j, E]
                    xdy = cy[None, :, :] - cy[:, None, :]
                    xd2 = xdx * xdx + xdy * xdy
                    xrm = jnp.maximum(radc3[:, None, :], radc3[None, :, :])
                    mi = cmass[:, None, :]
                    mj = cmass[None, :, :]
                    xcan = ((mi > C.CELL_EAT_REQUIREMENT)
                            & (mi.astype(jnp.float32)
                               > mj.astype(jnp.float32) * C.CELL_EAT_MARGIN))
                    dif_p = (jax.lax.broadcasted_iota(
                        jnp.int32, (PC, PC, 1), 0) // Cc) != (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (PC, PC, 1), 1) // Cc)
                    xelig = (calive[:, None, :] & calive[None, :, :] & dif_p
                             & xcan & (xrm * xrm >= xd2))
                    xkey = jnp.where(xelig, gkey2[:, None, :], _BIG_I)
                    minj = jnp.min(xkey, axis=0)                  # per prey j
                    xwin = xelig & (xkey == minj[None, :, :])
                    # gains use snapshot masses; chains allowed
                    gain = jnp.sum(jnp.where(xwin, mj, 0), axis=1)
                    cnt = jnp.sum(_bint(xwin), axis=1)
                eaten = minj < _BIG_I
                cmass = cmass + gain
                calive = calive & ~eaten
                cells_eaten = cells_eaten_in + preduce(cnt, jnp.sum)

            # --- foods move + virus feeding (SPEC M4) -------------------------
            # the whole pass is inert without a live MOVING food (the usual
            # state at rest: feeds are rare and emitted foods settle within
            # ~30 ticks); one block-level branch skips it
            if Nf > 0 and phases >= 8 and loo != 7:
                moving = falive & ((fvx != 0.0) | (fvy != 0.0))
                rf_m = _radius(np.float32(C.FOOD_MASS))
                FCH2 = 32 if Nf % 32 == 0 else Nf

                # the whole pass (movement + virus feeding) sits behind one
                # block-level branch: the movement ops cost ~0.06 ms/tick
                # when unconditional (p8 bisect), thin-cond carries are
                # near-free, and the fat (Nf, Nv, E) collision table rides
                # fori_loop chunks so its untaken tax is gone
                # (bench/pellet_probe.py)
                def foods_move_run(fx=fx, fy=fy, fvx=fvx, fvy=fvy,
                                   falive=falive, vx_=vx_, vy_=vy_, vvx=vvx,
                                   vvy=vvy, vmass=vmass, vhits=vhits,
                                   valive=valive):
                    pfvx, pfvy = fvx, fvy          # launch-tick velocities
                    nfvx, nfvy = _decel(fvx, fvy, C.FOOD_DECEL, dt)
                    nfx = fx + nfvx * dt
                    nfy = fy + nfvy * dt
                    nfx, nfy = clampb(nfx, nfy, rf_m)
                    fx = jnp.where(moving, nfx, fx)
                    fy = jnp.where(moving, nfy, fy)
                    fvx = jnp.where(moving, nfvx, fvx)
                    fvy = jnp.where(moving, nfvy, fvy)
                    if Nv == 0:
                        return fx, fy, fvx, fvy, _bint(falive)
                    # non-moving foods park at _DEAD in scratch so no
                    # `moving` mask runs per chunk
                    s_pxw[0:Nf, :] = jnp.where(moving, fx, _DEAD)
                    s_pyw[0:Nf, :] = jnp.where(moving, fy, _DEAD)
                    radv2 = _radius(vmass)
                    rmv = jnp.maximum(rf_m, radv2[None, :, :])   # (1, Nv, E)
                    rmv2 = rmv * rmv
                    viota2 = jax.lax.broadcasted_iota(jnp.int32, (1, Nv, 1), 1)

                    def vbody(k, hcount):
                        cfx = s_pxw[pl.ds(k * FCH2, FCH2), :]
                        cfy = s_pyw[pl.ds(k * FCH2, FCH2), :]
                        cdx = cfx[:, None, :] - vx_[None, :, :]
                        cdy = cfy[:, None, :] - vy_[None, :, :]
                        cd2 = cdx * cdx + cdy * cdy           # (FCH2, Nv, E)
                        coll = valive[None, :, :] & (rmv2 >= cd2)
                        hv = jnp.min(jnp.where(coll, viota2, _BIG_I),
                                     axis=1)                  # (FCH2, E)
                        s_pmin[pl.ds(k * FCH2, FCH2), :] = hv
                        fh = hv < _BIG_I
                        hm = fh[:, None, :] & (hv[:, None, :] == viota2)
                        return hcount + jnp.sum(_bint(hm), axis=0)

                    hcount = jax.lax.fori_loop(
                        0, Nf // FCH2, vbody, jnp.zeros((Nv, E), jnp.int32))
                    hitv = s_pmin[0:Nf, :]                    # (Nf, E)
                    fhit = hitv < _BIG_I
                    nh = vhits + hcount
                    burst = valive & (nh > C.NUMBER_OF_FOOD_HITS)
                    post = jnp.maximum(nh - (C.NUMBER_OF_FOOD_HITS + 1), 0)
                    vhits = jnp.where(burst, post, nh)
                    vmass = jnp.where(burst,
                                      C.VIRUS_INITIAL_MASS + post * C.FOOD_MASS,
                                      vmass + hcount * C.FOOD_MASS)
                    falive = falive & ~fhit
                    any_burst = jnp.max(_bint(burst), axis=0,
                                        keepdims=True) > 0    # (1, E)
                    viota1 = jax.lax.broadcasted_iota(jnp.int32, (Nv, 1), 0)
                    bslot = jnp.min(jnp.where(burst, viota1, _BIG_I), axis=0,
                                    keepdims=True)            # (1, E)
                    f_hit_b = fhit & (hitv == bslot)
                    fiota1 = jax.lax.broadcasted_iota(jnp.int32, (Nf, 1), 0)
                    src = jnp.min(jnp.where(f_hit_b, fiota1, _BIG_I), axis=0,
                                  keepdims=True)
                    src_oh = fiota1 == jnp.where(src < _BIG_I, src, -1)
                    svx_f = jnp.sum(jnp.where(src_oh, pfvx, 0.0), axis=0,
                                    keepdims=True)
                    svy_f = jnp.sum(jnp.where(src_oh, pfvy, 0.0), axis=0,
                                    keepdims=True)
                    b_oh = viota1 == jnp.where(bslot < _BIG_I, bslot, -1)
                    bx = jnp.sum(jnp.where(b_oh, vx_, 0.0), axis=0,
                                 keepdims=True)
                    by = jnp.sum(jnp.where(b_oh, vy_, 0.0), axis=0,
                                 keepdims=True)
                    spx = bx + svx_f * dt * 10.0
                    spy = by + svy_f * dt * 10.0
                    rnew = _radius(np.float32(C.VIRUS_INITIAL_MASS))
                    spx, spy = clampb(spx, spy, rnew)
                    vdead_rank = _cumsum0(_bint(~valive)) - 1
                    dslot_oh = (~valive) & (vdead_rank == 0) & any_burst
                    vx_ = jnp.where(dslot_oh, spx, vx_)
                    vy_ = jnp.where(dslot_oh, spy, vy_)
                    vvx = jnp.where(dslot_oh, svx_f, vvx)
                    vvy = jnp.where(dslot_oh, svy_f, vvy)
                    vmass = jnp.where(dslot_oh, C.VIRUS_INITIAL_MASS, vmass)
                    vhits = jnp.where(dslot_oh, 0, vhits)
                    valive = valive | dslot_oh
                    return (fx, fy, fvx, fvy, _bint(falive), vx_, vy_, vvx,
                            vvy, vmass, vhits, _bint(valive))

                def foods_move_skip():
                    if Nv == 0:
                        return fx, fy, fvx, fvy, _bint(falive)
                    return (fx, fy, fvx, fvy, _bint(falive), vx_, vy_, vvx,
                            vvy, vmass, vhits, _bint(valive))

                outs = jax.lax.cond(jnp.max(_bint(moving)) > 0,
                                    foods_move_run, foods_move_skip)
                if Nv == 0:
                    fx, fy, fvx, fvy, falive_i = outs
                else:
                    (fx, fy, fvx, fvy, falive_i, vx_, vy_, vvx, vvy,
                     vmass, vhits, valive_i) = outs
                    valive = valive_i > 0
                falive = falive_i > 0

            # --- regeneration -------------------------------------------------
            if ms.pellet_regen and phases >= 9 and loo != 8:
                due_r = (ticks % C.REGEN_PERIOD) == 0         # (1, E)
                # regen fires every REGEN_PERIOD ticks AND only matters when
                # something is dead (maybe_deficit): quiescent blocks skip
                # even the branch's carry copies
                RCH = 128
                np_pad_k = np_pad_scratch    # multiple of 128 >= Np

                def regen_run(pxw=pxw, pyw=pyw, vx_=vx_,
                              vy_=vy_, vvx=vvx, vvy=vvy, vmass=vmass,
                              vhits=vhits, valive=valive):
                    # pellet fill rides fori_loop chunks over the scratch
                    # copies (unrolled fat cond bodies — here the per-slot
                    # uniform draws — are taxed even untaken). Pads park at
                    # _DEAD but can never fill: deficit <= #dead real rows.
                    pal = pxw < _DEAD_MIN                     # (Np, E)
                    n_alive = jnp.sum(_bint(pal), axis=0, keepdims=True)
                    deficit = jnp.maximum(cfg.num_pellets - n_alive, 0)
                    if np_pad_k != Np:
                        zf = jnp.full((np_pad_k - Np, E), _DEAD)
                        s_pxw[...] = jnp.concatenate([pxw, zf], axis=0)
                        s_pyw[...] = jnp.concatenate([pyw, zf], axis=0)
                    else:
                        s_pxw[...] = pxw
                        s_pyw[...] = pyw
                    def rbody(k, base):
                        cpxw = s_pxw[pl.ds(k * RCH, RCH), :]
                        dead_c = _bint(~(cpxw < _DEAD_MIN))   # (RCH, E)
                        order_c = base + _cumsum0(dead_c) - 1
                        fill = due_r & (dead_c > 0) & (order_c < deficit)
                        piota = (jax.lax.broadcasted_iota(
                            jnp.int32, (RCH, 1), 0) + k * RCH)
                        # exact-integer quantized spawn draw (the same
                        # counters + ops as spawn.py::pellet_spawn_keys);
                        # the working coords are the DECODED cell centers
                        # so the obs/section emissions below match the
                        # XLA tick bit-for-bit
                        qx_ = (_uniform_q(_P_NQX, seed, 1, ticks, piota, 0)
                               + np.int32(_P_QLX))
                        qy_ = (_uniform_q(_P_NQY, seed, 1, ticks, piota, 1)
                               + np.int32(_P_QLY))
                        nx_ = (qx_.astype(jnp.float32) + 0.5) * _P_INVX
                        ny_ = (qy_.astype(jnp.float32) + 0.5) * _P_INVY
                        s_pxw[pl.ds(k * RCH, RCH), :] = jnp.where(
                            fill, nx_, cpxw)
                        s_pyw[pl.ds(k * RCH, RCH), :] = jnp.where(
                            fill, ny_, s_pyw[pl.ds(k * RCH, RCH), :])
                        return base + jnp.sum(dead_c, axis=0, keepdims=True)

                    jax.lax.fori_loop(0, np_pad_k // RCH, rbody,
                                      jnp.zeros((1, E), jnp.int32))
                    pxw = s_pxw[0:Np, :]
                    pyw = s_pyw[0:Np, :]
                    if Nv == 0:
                        return pxw, pyw
                    nv_alive = jnp.sum(_bint(valive), axis=0, keepdims=True)
                    vdef = jnp.maximum(cfg.num_viruses - nv_alive, 0)
                    vdead_order = _cumsum0(_bint(~valive)) - 1
                    vfill = due_r & ~valive & (vdead_order < vdef)
                    rv = _radius(np.float32(C.VIRUS_INITIAL_MASS))
                    viota3 = jax.lax.broadcasted_iota(jnp.int32, (Nv, 1), 0)
                    nvx_ = _uniform(0.0, W - 2 * rv, seed, 2, ticks, viota3,
                                    0) + rv
                    nvy_ = _uniform(0.0, H - 2 * rv, seed, 2, ticks, viota3,
                                    1) + rv
                    vx_ = jnp.where(vfill, nvx_, vx_)
                    vy_ = jnp.where(vfill, nvy_, vy_)
                    vvx = jnp.where(vfill, 0.0, vvx)
                    vvy = jnp.where(vfill, 0.0, vvy)
                    vmass = jnp.where(vfill, C.VIRUS_INITIAL_MASS, vmass)
                    vhits = jnp.where(vfill, 0, vhits)
                    valive = valive | vfill
                    return (pxw, pyw, vx_, vy_, vvx, vvy,
                            vmass, vhits, _bint(valive))

                def regen_skip():
                    if Nv == 0:
                        return pxw, pyw
                    return (pxw, pyw, vx_, vy_, vvx, vvy,
                            vmass, vhits, _bint(valive))

                outs_r = jax.lax.cond(
                    (jnp.max(_bint(due_r)) > 0) & (maybe_deficit > 0),
                    regen_run, regen_skip)
                if Nv == 0:
                    pxw, pyw = outs_r
                else:
                    (pxw, pyw, vx_, vy_, vvx, vvy, vmass, vhits,
                     valive_i) = outs_r
                    valive = valive_i > 0

            # chain exactly what the XLA writeback exposes to the
            # next tick (engine/tick.py:184-198): dead cells' split
            # vel and mass are masked now; pos/vel stay stale
            if sub >= 1:
                svx = jnp.where(calive, svx, 0.0)
                svy = jnp.where(calive, svy, 0.0)
                cmass = jnp.where(calive, cmass, 0)
            ticks = ticks + 1

            if n_steps and _t % n_ticks == n_ticks - 1 and loo != 21:
                # end of env step sidx: emit this step's RAM frame into its
                # obs slice + the per-step (mass, alive) info rows the XLA
                # rim turns into rewards/dones
                sidx = _t // n_ticks
                if ram_obs is not None:
                    from agarcl_tpu.ops.fused_obs import obs_rows
                    _b2i = lambda b: jnp.where(b, 1, 0)
                    pkey_s = _pellet_encode(pxw, pyw)
                    AR_s = o_extra[0].shape[0] // n_steps
                    o_extra[0][pl.ds(sidx * AR_s, AR_s), :] = obs_rows(
                        cfg, ram_obs, 1.0 / cfg.arena_width,
                        1.0 / cfg.arena_height,
                        cx, cy, cvx, cvy, cmass, _b2i(calive),
                        pxw, pyw, jnp.where(pxw < _DEAD_MIN, 1, 0),
                        vx_, vy_, vmass, _b2i(valive), pkey=pkey_s)
                o_si = o_extra[1 if ram_obs is not None else 0]
                pm_s = preduce(jnp.where(calive, cmass, 0),
                               jnp.sum).astype(jnp.float32)
                pal_s = preduce(_bint(calive), jnp.max).astype(jnp.float32)
                o_si[pl.ds(sidx * 2 * P, P), :] = pm_s
                o_si[pl.ds(sidx * 2 * P + P, P), :] = pal_s

        # --- writeback ----------------------------------------------------
        o_tx[...] = tx
        o_ty[...] = ty
        o_action[...] = action
        o_split_cd[...] = split_cd
        o_feed_cd[...] = feed_cd
        o_elapsed[...] = elapsed
        o_last_decay[...] = last_decay
        o_anti_team[...] = anti_team
        o_vticks[...] = vticks
        o_vptr[...] = vptr
        o_food_eaten[...] = food_eaten
        o_highest[...] = highest
        o_viruses_eaten[...] = viruses_eaten
        o_cells_eaten[...] = cells_eaten
        # match the XLA assemble exactly (engine/tick.py:184-198): pos/vel
        # of cells that died THIS tick stay stale until next tick's
        # movement masks them; split_vel and mass are masked now
        o_cx[...] = cx
        o_cy[...] = cy
        o_cvx[...] = cvx
        o_cvy[...] = cvy
        o_svx[...] = svx
        o_svy[...] = svy
        o_cmass[...] = cmass
        o_calive[...] = calive
        o_cid[...] = cid
        o_crecomb[...] = crecomb
        o_next_id[...] = next_id
        pkey_out = _pellet_encode(pxw, pyw)
        o_pkey[...] = pkey_out
        o_vx[...] = vx_
        o_vy[...] = vy_
        o_vvx[...] = vvx
        o_vvy[...] = vvy
        o_vmass[...] = vmass
        o_vhits[...] = vhits
        o_valive[...] = valive
        o_fx[...] = fx
        o_fy[...] = fy
        o_fvx[...] = fvx
        o_fvy[...] = fvy
        o_falive[...] = falive
        o_fnext[...] = fnext
        o_ticks[...] = ticks
        o_seed[...] = seed

        if ram_obs is not None and not n_steps:
            # RAM frame emitted from the final in-VMEM state: saves the
            # standalone obs kernel's separate state read+dispatch (~1 ms
            # per call at 8192 envs). Bit-identical to fused_ram_obs on
            # the written-back state (same tensors, same layout, same ops;
            # the stale dead-cell positions are masked by the alive flags
            # exactly as obs/ram.py does). (n_steps kernels emit per step
            # inside the loop instead.)
            from agarcl_tpu.ops.fused_obs import obs_rows
            b2i = lambda b: jnp.where(b, 1, 0)
            o_extra[0][...] = obs_rows(
                cfg, ram_obs, 1.0 / cfg.arena_width, 1.0 / cfg.arena_height,
                cx, cy, cvx, cvy, cmass, b2i(calive),
                pxw, pyw, jnp.where(pxw < _DEAD_MIN, 1, 0),
                vx_, vy_, vmass, b2i(valive), pkey=pkey_out)

        if grid_tab or screen_tab:
            # Obs-kernel input sections emitted from the final in-VMEM
            # state, transposed to env-major and stored alongside the
            # state writeback: the XLA table build (a +2.1 ms/step grid /
            # +1.5 ms/step screen pass of state transposes + masking at
            # bench sizes, bench/obs_table_probe.py) never runs. Values
            # are the exact _build_grid_table / _build_table expressions;
            # the screen m/o sections skip the alive-first compaction
            # (only the off-by-default count ladder reads lane order).
            k0 = 1 if ram_obs is not None else 0
            f32 = jnp.float32

            def emit(idx, val, fill, pw):
                F = val.shape[0]
                if pw != F:
                    val = jnp.concatenate(
                        [val, jnp.full((pw - F, E), f32(fill))], axis=0)
                o_extra[k0 + idx][...] = jnp.transpose(val)

            calive0 = pslice(calive, 0)
            cmass0 = pslice(cmass, 0)
            cx0 = pslice(cx, 0)
            cy0 = pslice(cy, 0)
            w0 = jnp.where(calive0, cmass0.astype(f32), 0.0)
            tot = jnp.sum(w0, axis=0, keepdims=True)          # (1, E)
            den = jnp.maximum(tot, 1.0)
            cenx = jnp.sum(cx0 * w0, axis=0, keepdims=True) / den
            ceny = jnp.sum(cy0 * w0, axis=0, keepdims=True) / den
            pmass = jnp.sum(jnp.where(calive0, cmass0, 0), axis=0,
                            keepdims=True).astype(f32)
            zrow = jnp.zeros((1, E), f32)
            n_other = PC - Cc
            if n_other:
                oali = _bint(calive)[Cc:] > 0
                omf = cmass[Cc:].astype(f32)

            # pellets already ride parked (dead at 1e9) — reuse directly
            pxm, pym = pxw, pyw
            vxm = jnp.where(valive, vx_, f32(1e9))
            vym = jnp.where(valive, vy_, f32(1e9))
            next_idx = k0

        if grid_tab:
            from agarcl_tpu.ops.fused_grid import _INF_F
            from agarcl_tpu.ops.fused_grid import section_meta as _gmeta
            view = jnp.clip(2.0 * pmass, 100.0, 300.0)
            gvals = dict(
                params=jnp.concatenate([cenx, ceny, view] + [zrow] * 5,
                                       axis=0),
                px=pxm, py=pym, vx=vxm, vy=vym,
                vm=jnp.where(valive, vmass.astype(f32), 0.0),
                mx=cx0, my=cy0, mm=w0)
            if n_other:
                gvals.update(
                    ox=jnp.where(oali, cx[Cc:], f32(1e9)),
                    oy=jnp.where(oali, cy[Cc:], f32(1e9)),
                    om=jnp.where(oali, omf, 0.0),
                    ok=jnp.where(oali, omf, f32(_INF_F)))
            else:
                z8 = jnp.zeros((8, E), f32)
                gvals.update(ox=z8, oy=z8, om=z8, ok=z8)
            for i, (name, _w, pw, fill) in enumerate(_gmeta(cfg)):
                emit(next_idx - k0 + i, gvals[name], fill, pw)
            next_idx += len(_gmeta(cfg))

        if screen_tab:
            from agarcl_tpu.obs.screen import (_RAD_FOOD, _RAD_PELLET,
                                               _TAN_HALF_FOV)
            from agarcl_tpu.ops.fused_screen import section_meta as _smeta
            z = jnp.clip(100.0 + pmass / 10.0, 100.0, 900.0)
            half = z * f32(_TAN_HALF_FOV)
            # params[3]/[4] semantics: "1 + highest live slot", NOT live
            # count — tick-emitted sections are UNCOMPACTED, and the
            # kernel's dynamic-count cell loop (fused_screen circles_dyn)
            # stops at this bound; for the XLA build's compacted sections
            # the two definitions coincide
            miota1 = jax.lax.broadcasted_iota(jnp.int32, (Cc, 1), 0) + 1
            mcnt = jnp.max(jnp.where(calive0, miota1, 0), axis=0,
                           keepdims=True).astype(f32)
            rpel = f32(_RAD_PELLET)
            rfoo = f32(_RAD_FOOD)
            crad0 = jnp.sqrt(cmass0.astype(f32) / jnp.pi)
            vrad = jnp.sqrt(vmass.astype(f32) / jnp.pi)
            svals = dict(
                px=pxm, py=pym,
                pr2=jnp.where(pxw < _DEAD_MIN, rpel * rpel, -1.0),
                fx=fx, fy=fy,
                fr2=jnp.where(falive, rfoo * rfoo, -1.0),
                mx=cx0, my=cy0,
                mr2=jnp.where(calive0, crad0 * crad0, -1.0),
                vx=vxm, vy=vym,
                vr2=jnp.where(valive, vrad * vrad, -1.0))
            if n_other:
                orad = jnp.sqrt(omf / jnp.pi)
                oiota1 = jax.lax.broadcasted_iota(
                    jnp.int32, (oali.shape[0], 1), 0) + 1
                ocnt = jnp.max(jnp.where(oali, oiota1, 0), axis=0,
                               keepdims=True).astype(f32)
                svals.update(
                    ox=cx[Cc:], oy=cy[Cc:],
                    or2=jnp.where(oali, orad * orad, -1.0))
            else:
                z1 = jnp.zeros((1, E), f32)
                ocnt = z1
                svals.update(ox=z1, oy=z1, or2=z1)
            svals["params"] = jnp.concatenate(
                [cenx, ceny, half, mcnt, ocnt] + [zrow] * 3, axis=0)
            for i, (name, _w, pw, fill) in enumerate(_smeta(cfg)):
                emit(next_idx - k0 + i, svals[name], fill, pw)

    if n_steps:
        return kernel

    def kernel_nosteps(*refs):
        # no action-plane inputs in the single-step layout: splice Nones
        # into the ax/ay/aact slots after the last state input (seed)
        return kernel(*refs[:_N_STATE_PLANES], None, None, None,
                      *refs[_N_STATE_PLANES:])

    return kernel_nosteps


# ------------------------------------------------------------- wrapper
# (name, kind): "s" = per-env scalar -> (1, N); "p" = per-player -> (P, N);
# "pk"/"pc" = (N,P,F) -> (P*F, N); "v2p" = (N,P,2) -> two (P, N);
# "v2c" = (N,P,F,2) -> two (P*F, N); "v2" = (N,F,2) -> two (F, N);
# "2d" = (N,F) -> (F, N)
_SPLIT_PLAN = [
    ("target", "v2p"),
    ("action", "p"), ("split_cooldown", "p"), ("feed_cooldown", "p"),
    ("elapsed_ticks", "p"), ("last_decay_tick", "p"),
    ("anti_team_decay", "p"),
    ("virus_eaten_ticks", "pk"), ("virus_eaten_ptr", "p"),
    ("food_eaten", "p"), ("highest_mass", "p"), ("viruses_eaten", "p"),
    ("cells_eaten", "p"),
    ("cell_pos", "v2c"), ("cell_vel", "v2c"), ("cell_split_vel", "v2c"),
    ("cell_mass", "pc"), ("cell_alive", "pc"), ("cell_id", "pc"),
    ("cell_recombine_at", "pc"), ("next_cell_id", "s"),
    ("pellet_key", "2d"),
    ("virus_pos", "v2"), ("virus_vel", "v2"), ("virus_mass", "2d"),
    ("virus_hits", "2d"), ("virus_alive", "2d"),
    ("food_pos", "v2"), ("food_vel", "v2"), ("food_alive", "2d"),
    ("food_next", "s"), ("ticks", "s"), ("seed", "s"),
]

# number of (feature, N) planes _to_kernel_arrays produces — the kernel's
# positional input count before any action planes
_N_STATE_PLANES = sum(2 if k in ("v2", "v2p", "v2c") else 1
                      for _, k in _SPLIT_PLAN)


def _to_kernel_arrays(states: GameState):
    """GameState (batched) -> flat list of (feature, N) arrays."""
    N = states.ticks.shape[0]
    out = []
    for name, kind in _SPLIT_PLAN:
        x = getattr(states, name)
        if kind == "s":
            out.append(x[None, :])
        elif kind == "p":
            out.append(x.T)                        # (P, N)
        elif kind in ("pk", "pc"):
            out.append(jnp.transpose(x.reshape(N, -1)))   # (P*F, N)
        elif kind == "v2p":
            out.append(jnp.transpose(x[:, :, 0]))
            out.append(jnp.transpose(x[:, :, 1]))
        elif kind == "v2c":
            out.append(jnp.transpose(x[..., 0].reshape(N, -1)))
            out.append(jnp.transpose(x[..., 1].reshape(N, -1)))
        elif kind == "v2":
            out.append(jnp.transpose(x[:, :, 0]))
            out.append(jnp.transpose(x[:, :, 1]))
        elif kind == "2d":
            out.append(jnp.transpose(x))
        else:
            raise ValueError(kind)
    return out


def _from_kernel_arrays(states: GameState, outs):
    """Inverse of _to_kernel_arrays."""
    N = states.ticks.shape[0]
    kw = {}
    i = 0
    for name, kind in _SPLIT_PLAN:
        shp = getattr(states, name).shape
        if kind == "s":
            kw[name] = outs[i][0]
            i += 1
        elif kind == "p":
            kw[name] = outs[i].T
            i += 1
        elif kind in ("pk", "pc"):
            kw[name] = jnp.transpose(outs[i]).reshape(shp)
            i += 1
        elif kind == "v2p":
            kw[name] = jnp.stack([jnp.transpose(outs[i]),
                                  jnp.transpose(outs[i + 1])], axis=-1)
            i += 2
        elif kind == "v2c":
            kw[name] = jnp.stack(
                [jnp.transpose(outs[i]).reshape(shp[:-1]),
                 jnp.transpose(outs[i + 1]).reshape(shp[:-1])], axis=-1)
            i += 2
        elif kind == "v2":
            kw[name] = jnp.stack([jnp.transpose(outs[i]),
                                  jnp.transpose(outs[i + 1])], axis=-1)
            i += 2
        elif kind == "2d":
            kw[name] = jnp.transpose(outs[i])
            i += 1
    return states.replace(**kw)


def supports(cfg: EnvConfig) -> bool:
    """The fused path covers rosters up to 9 players (agents + bots) —
    e.g. mode 0 with 8 bots, twice the reference integration fixture's
    roster granularity. The cross-player eat's (P*Cc)^2 pairwise tables
    ride XCH-row fori chunks through VMEM scratch for P >= 4 (round-3
    footprint rules), so VMEM no longer caps the roster at 5; the
    remaining bound is program size (per-player unrolled relax/placement/
    recombine phases) and the (PC, E) working-set footprint."""
    return cfg.num_players <= 9


@functools.partial(jax.jit,
                   static_argnums=(0, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def fused_engine_tick(cfg: EnvConfig, states: GameState,
                      block_envs: int = 128,
                      interpret: bool = False,
                      phases: int = 99,
                      n_ticks: int = 1,
                      sub: int = 99,
                      ram_obs=None,
                      grid_tab: bool = False,
                      screen_tab: bool = False,
                      loo: int = 0):
    """n_ticks engine ticks over a BATCH of envs via ONE fused kernel.

    states: a vmapped GameState with leading env axis N. block_envs should
    be a multiple of 128 (the lane width) that divides N. Running several
    ticks inside one kernel round-trips the state through HBM once instead
    of once per tick — the round trip alone measures 0.98 ms per tick at
    8192 envs (half the total tick cost).

    ram_obs: optional RamObsConfig — the kernel additionally emits the RAM
    frame from the post-tick in-VMEM state (ops/fused_obs.py::obs_rows) and
    the call returns (states, obs (N, A, ram_size)); this saves the
    standalone obs kernel's state re-read and dispatch.

    grid_tab / screen_tab: additionally emit the grid / screen obs-kernel
    input sections (fused_grid.section_meta / fused_screen.section_meta)
    env-major from the post-tick in-VMEM state; the call returns
    (states, [ram obs,] secs dict) and the sections feed
    fused_grid_frame_from_secs / fused_screen_frame_from_secs directly —
    the XLA table build (+2.1 / +1.5 ms/step of state transposes at bench
    sizes, bench/obs_table_probe.py) never runs.
    """
    assert supports(cfg), "fused tick requires num_players <= 9"
    N = states.ticks.shape[0]
    E = _block_size(N, block_envs)

    ins = _to_kernel_arrays(states)

    def spec_for(x):
        blk = x.shape[:-1] + (E,)
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,))

    in_specs = [spec_for(x) for x in ins]
    out_specs = list(in_specs)
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ins]
    if ram_obs is not None:
        from agarcl_tpu.obs.ram import ram_size
        AR = cfg.num_agents * ram_size(cfg, ram_obs)
        out_specs.append(pl.BlockSpec((AR, E), lambda i: (0, i)))
        out_shapes.append(jax.ShapeDtypeStruct((AR, N), jnp.float32))
    metas = []
    if grid_tab:
        from agarcl_tpu.ops.fused_grid import section_meta as _gm
        metas.append(("grid", _gm(cfg)))
    if screen_tab:
        from agarcl_tpu.ops.fused_screen import section_meta as _sm
        metas.append(("screen", _sm(cfg)))
    for _, meta in metas:
        for _name, _w, pw, _fill in meta:
            out_specs.append(pl.BlockSpec((E, pw), lambda i: (i, 0)))
            out_shapes.append(jax.ShapeDtypeStruct((N, pw), jnp.float32))

    kernel = _make_kernel(cfg, phases, n_ticks, sub, ram_obs,
                          grid_tab, screen_tab, loo)
    # VMEM scratch for the fori_loop'd contested pellet passes (see the
    # kernel comment: Mosaic cannot dynamic-slice values, and unrolled fat
    # cond branches are taxed even untaken)
    PCHUNK = 128
    # scratch planes serve both the pellet chunk loops (>= pellet
    # capacity) and the large-roster cross-eat staging (>= 2*P*Cc
    # int rows for masked masses + winner keys)
    np_pad = max(-(-cfg.pellet_capacity // PCHUNK) * PCHUNK,
                 -(-2 * cfg.num_players * cfg.max_cells // PCHUNK)
                 * PCHUNK)
    scratch = [pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.int32)]
    outs = pl.pallas_call(
        kernel,
        grid=(N // E,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(len(ins))},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    n_state = len(ins)
    new_states = _from_kernel_arrays(states, outs[:n_state])
    ret = [new_states]
    k = n_state
    if ram_obs is not None:
        R = outs[k].shape[0] // cfg.num_agents
        ret.append(jnp.transpose(outs[k]).reshape(N, cfg.num_agents, R))
        k += 1
    for _kind, meta in metas:
        secs = {}
        for name, _w, _pw, _fill in meta:
            secs[name] = outs[k]
            k += 1
        ret.append(secs)
    return ret[0] if len(ret) == 1 else tuple(ret)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def fused_multi_step_call(cfg: EnvConfig, states: GameState, actions,
                          n_steps: int, ram_obs=None,
                          block_envs: int = 128, interpret: bool = False,
                          loo: int = 0):
    """n_steps whole ENV STEPS (apply actions + ticks_per_step ticks +
    per-step RAM frame) in ONE kernel call — amortizes the per-call state
    HBM round trip across steps (_make_kernel n_steps docstring).

    actions: (N, A, 3) f32, applied at the start of EVERY step (the
    VecEnv.multi_step contract). Returns (states, obs (N, S, A, R) | None,
    step_mass (N, S, P) f32, step_alive (N, S, P) bool) where mass/alive
    are the post-step per-player values the XLA rim turns into
    rewards/dones (ops/fused_step.py::fused_env_multi_step).
    """
    assert supports(cfg), "fused tick requires num_players <= 9"
    N = states.ticks.shape[0]
    A = cfg.num_agents
    P = cfg.num_players

    ins = _to_kernel_arrays(states)
    raw_outs, obs_raw, info_raw = _multi_step_raw_core(
        cfg, tuple(ins), actions, n_steps, ram_obs, block_envs, interpret,
        loo)
    new_states = _from_kernel_arrays(states, list(raw_outs))
    obs = None
    if obs_raw is not None:
        R = obs_raw.shape[0] // (n_steps * A)
        obs = jnp.transpose(obs_raw).reshape(N, n_steps, A, R)
    si = jnp.transpose(info_raw).reshape(N, n_steps, 2, P)
    step_mass = si[:, :, 0, :]
    step_alive = si[:, :, 1, :] > 0.0
    return new_states, obs, step_mass, step_alive


def _multi_step_raw_core(cfg: EnvConfig, raw, actions, n_steps: int,
                         ram_obs, block_envs: int, interpret: bool,
                         loo: int = 0):
    """The multi-step pallas call on RAW kernel-layout state (the
    _to_kernel_arrays tuple of (feature, N) arrays): no state transposes.
    Returns (raw_outs tuple, obs_raw (AR, N)|None, info_raw (2kP, N)).
    The per-program state transposes of the GameState wrappers cost
    ~5.6 ms/call at 8192 envs (bench/ms_block_probe.py vs bench.py k-scan
    arithmetic) — the resident path (ops/fused_step.py
    fused_env_multi_step_resident + vec.py) keeps state raw between
    multi_step calls so they never run."""
    N = raw[0].shape[-1]
    E = _block_size(N, block_envs)
    P = cfg.num_players
    A = cfg.num_agents

    ins = list(raw)
    n_state = len(ins)
    acts = jnp.asarray(actions, jnp.float32).reshape(N, A, 3)
    ins.append(jnp.transpose(acts[:, :, 0]))                 # (A, N)
    ins.append(jnp.transpose(acts[:, :, 1]))
    ins.append(jnp.transpose(acts[:, :, 2].astype(jnp.int32)))

    def spec_for(x):
        blk = x.shape[:-1] + (E,)
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,))

    in_specs = [spec_for(x) for x in ins]
    out_specs = [spec_for(x) for x in ins[:n_state]]
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in ins[:n_state]]
    if ram_obs is not None:
        from agarcl_tpu.obs.ram import ram_size
        AR = n_steps * A * ram_size(cfg, ram_obs)
        out_specs.append(pl.BlockSpec((AR, E), lambda i: (0, i)))
        out_shapes.append(jax.ShapeDtypeStruct((AR, N), jnp.float32))
    out_specs.append(pl.BlockSpec((n_steps * 2 * P, E), lambda i: (0, i)))
    out_shapes.append(jax.ShapeDtypeStruct((n_steps * 2 * P, N),
                                           jnp.float32))

    kernel = _make_kernel(cfg, 99, cfg.ticks_per_step, 99, ram_obs,
                          False, False, loo, n_steps)
    PCHUNK = 128
    # scratch planes serve both the pellet chunk loops (>= pellet
    # capacity) and the large-roster cross-eat staging (>= 2*P*Cc
    # int rows for masked masses + winner keys)
    np_pad = max(-(-cfg.pellet_capacity // PCHUNK) * PCHUNK,
                 -(-2 * cfg.num_players * cfg.max_cells // PCHUNK)
                 * PCHUNK)
    scratch = [pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.float32),
               pltpu.VMEM((np_pad, E), jnp.int32)]
    outs = pl.pallas_call(
        kernel,
        grid=(N // E,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(n_state)},
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    k = n_state
    obs_raw = None
    if ram_obs is not None:
        obs_raw = outs[k]
        k += 1
    return tuple(outs[:n_state]), obs_raw, outs[k]
