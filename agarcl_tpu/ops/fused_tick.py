"""Fused single-agent tick: the whole engine tick as ONE Pallas kernel.

Why: the XLA op-graph tick materializes dozens of padded intermediates per
tick — cost analysis shows ~45 GB of HBM traffic per 8192-env step (vs ~70 MB
of true state), capping throughput near 75k env-steps/s/chip. This kernel
keeps each env block's entire state in VMEM across all phases of a tick and
touches HBM exactly twice (read state, write state), which removes the
bandwidth wall.

Scope: the single-agent fast path (num_players == 1 — the BASELINE bench
configs: ram/grid tasks without bots). Multi-player configs use the XLA tick
(agarcl_tpu/engine/tick.py). Semantics are identical to the XLA tick (same
SPEC.md pins); tests/test_fused_tick.py checks fused-vs-XLA agreement
state-field by state-field, and the C++ oracle transitively covers it.

Layout: blocks of E envs; inside the kernel, arrays are (E, feature) with E
in sublanes — VMEM tile padding on small feature axes is irrelevant because
everything stays on-chip. Pellet-sized arrays are (E, Np).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState

_BIG = np.float32(3.4e38)
_BIG_I = np.int32(2**30)
_GOLDEN = np.uint32(0x9E3779B9)


# ------------------------------------------------------------------ helpers
def _mix(h):
    h = h ^ (h >> 16)
    h = h * np.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


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


def _radius(mass):
    return jnp.sqrt(mass.astype(jnp.float32) / jnp.pi)


def _max_speed(mass):
    m = jnp.maximum(mass.astype(jnp.float32), 1.0)
    return C.CELL_MAX_SPEED / jnp.power(m, 0.439)


def _split_speed(mass):
    return jnp.clip(3.0 * jnp.power(_max_speed(mass), 1.2), 20.0, 130.0)


def _dir_cos_sin(dx, dy):
    """cos/sin of the reference's quirky direction() = atan(dx/dy) with
    +-pi corrections for dx<0 — computed algebraically (Mosaic has no atan):
    cos(atan(t)) = 1/sqrt(1+t^2), sin(atan(t)) = t/sqrt(1+t^2); the +-pi
    correction flips both signs."""
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


def _clampb(x, y, rad, W, H):
    cx = jnp.maximum(0.0, jnp.maximum(jnp.minimum(x, W - rad), rad))
    cy = jnp.maximum(0.0, jnp.maximum(jnp.minimum(y, H - rad), rad))
    return cx, cy


def _e1(b):
    """(E,) bool -> (E, 1) bool via an int32 expansion (Mosaic cannot insert
    a minor dim on 1-bit vectors)."""
    return jnp.where(b, 1, 0)[:, None] > 0


def _e2(b):
    """(E, F) bool -> (E, F, 1) bool via int32."""
    return jnp.where(b, 1, 0)[:, :, None] > 0


def _cumsum1(x):
    """Inclusive prefix sum along axis 1 via log-shift adds (Mosaic has no
    cumsum lowering). x: (E, F) int32."""
    E, F = x.shape
    acc = x
    d = 1
    while d < F:
        shifted = jnp.concatenate(
            [jnp.zeros((E, d), acc.dtype), acc[:, :F - d]], axis=1)
        acc = acc + shifted
        d *= 2
    return acc


def _rank_of(cid, alive):
    """(E,Cc) counting rank by id among live cells."""
    key = jnp.where(alive, cid, _BIG_I)
    return jnp.sum(jnp.where(key[:, :, None] > key[:, None, :], 1, 0),
                   axis=-1)


# ------------------------------------------------------------------ kernel
def _make_kernel(cfg: EnvConfig, phases: int = 99):
    Cc = cfg.max_cells
    Np = cfg.pellet_capacity
    Nv = cfg.virus_capacity
    Nf = cfg.food_capacity
    W, H = cfg.arena_width, cfg.arena_height
    dt = np.float32(cfg.dt)
    ms = cfg.mode_spec

    def kernel(tx_ref, ty_ref, action_ref, split_cd_ref, feed_cd_ref,
               elapsed_ref, last_decay_ref, anti_team_ref,
               vticks_ref, vptr_ref,
               food_eaten_ref, highest_ref, viruses_eaten_ref,
               cx_ref, cy_ref, cvx_ref, cvy_ref, svx_ref, svy_ref,
               cmass_ref, calive_ref, cid_ref, crecomb_ref, next_id_ref,
               px_ref, py_ref, palive_ref,
               vx_ref, vy_ref, vvx_ref, vvy_ref, vmass_ref, vhits_ref,
               valive_ref,
               fx_ref, fy_ref, fvx_ref, fvy_ref, falive_ref, fnext_ref,
               ticks_ref, seed_ref,
               # outputs (aliased to inputs)
               o_tx, o_ty, o_action, o_split_cd, o_feed_cd, o_elapsed,
               o_last_decay, o_anti_team, o_vticks, o_vptr,
               o_food_eaten, o_highest, o_viruses_eaten,
               o_cx, o_cy, o_cvx, o_cvy, o_svx, o_svy,
               o_cmass, o_calive, o_cid, o_crecomb, o_next_id,
               o_px, o_py, o_palive,
               o_vx, o_vy, o_vvx, o_vvy, o_vmass, o_vhits, o_valive,
               o_fx, o_fy, o_fvx, o_fvy, o_falive, o_fnext,
               o_ticks, o_seed):
        E = action_ref.shape[0]
        tx = tx_ref[...][:, 0]
        ty = ty_ref[...][:, 0]
        action = action_ref[...][:, 0]
        split_cd_in = split_cd_ref[...][:, 0]
        feed_cd_in = feed_cd_ref[...][:, 0]
        elapsed_in = elapsed_ref[...][:, 0]
        last_decay_in = last_decay_ref[...][:, 0]
        anti_team_in = anti_team_ref[...][:, 0]
        food_eaten_in = food_eaten_ref[...][:, 0]
        highest_in = highest_ref[...][:, 0]
        viruses_eaten_in = viruses_eaten_ref[...][:, 0]
        ticks = ticks_ref[...][:, 0]
        seed = seed_ref[...][:, 0]
        vticks = vticks_ref[...]                 # (E, K)
        vptr = vptr_ref[...][:, 0]

        cx = cx_ref[...]                         # (E, Cc)
        cy = cy_ref[...]
        cvx = cvx_ref[...]
        cvy = cvy_ref[...]
        svx = svx_ref[...]
        svy = svy_ref[...]
        cmass = cmass_ref[...]
        calive = calive_ref[...]
        cid = cid_ref[...]
        crecomb = crecomb_ref[...]
        next_id = next_id_ref[...][:, 0]

        px = px_ref[...]                         # (E, Np)
        py = py_ref[...]
        palive = palive_ref[...]
        vx_ = vx_ref[...]                        # (E, Nv)
        vy_ = vy_ref[...]
        vvx = vvx_ref[...]
        vvy = vvy_ref[...]
        vmass = vmass_ref[...]
        vhits = vhits_ref[...]
        valive = valive_ref[...]
        fx = fx_ref[...]                         # (E, Nf)
        fy = fy_ref[...]
        fvx = fvx_ref[...]
        fvy = fvy_ref[...]
        falive = falive_ref[...]
        fnext = fnext_ref[...][:, 0]

        palive_p = jnp.any(calive, axis=1)       # player alive (E,)
        action_eff = jnp.where(palive_p, action, 0)
        elapsed = elapsed_in + jnp.where(palive_p, 1, 0)

        # --- movement ---------------------------------------------------
        nvx = 3.0 * (tx[:, None] - cx)
        nvy = 3.0 * (ty[:, None] - cy)
        sp = jnp.sqrt(nvx * nvx + nvy * nvy)
        lim = _max_speed(cmass)
        scale = jnp.where(sp > lim, lim / jnp.maximum(sp, 1e-12), 1.0)
        nvx = nvx * scale
        nvy = nvy * scale
        cx = cx + (nvx + svx) * dt
        cy = cy + (nvy + svy) * dt
        svx, svy = _decel(svx, svy, C.SPLIT_DECELERATION, dt)
        rad = _radius(cmass)
        cx, cy = _clampb(cx, cy, rad, W, H)
        cvx, cvy = nvx, nvy
        dead = ~calive
        cx = jnp.where(dead, 0.0, cx)
        cy = jnp.where(dead, 0.0, cy)
        cvx = jnp.where(dead, 0.0, cvx)
        cvy = jnp.where(dead, 0.0, cvy)
        svx = jnp.where(dead, 0.0, svx)
        svy = jnp.where(dead, 0.0, svy)

        rank = (_rank_of(cid, calive) if phases >= 2
                else jnp.zeros((E, Cc), jnp.int32))

        # --- self-collision relaxation (SPEC M6, matrix form) ------------
        def pair_pass(cx, cy, cvx, cvy, static_only):
            dx = cx[:, None, :] - cx[:, :, None]     # (E, i, j): j - i
            dy = cy[:, None, :] - cy[:, :, None]
            d2 = dx * dx + dy * dy
            radc = _radius(cmass)
            rs = radc[:, :, None] + radc[:, None, :]
            eye = jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc), 0) \
                == jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc), 1)
            both = _e2(calive) & calive[:, None, :] & ~eye[None]
            touch = both & (rs * rs >= d2)
            key = jnp.where(touch, rank[:, None, :], _BIG_I)
            minkey = jnp.min(key, axis=-1, keepdims=True)
            chose = touch & (key == minkey)
            # bool transpose unsupported in Mosaic; swap via int32
            chose_t = jnp.swapaxes(jnp.where(chose, 1, 0), 1, 2) > 0
            M = chose & chose_t
            Mlow = M & (rank[:, :, None] < rank[:, None, :])

            pax, pay = cx[:, :, None], cy[:, :, None]
            pbx, pby = cx[:, None, :], cy[:, None, :]
            vax, vay = cvx[:, :, None], cvy[:, :, None]
            vbx, vby = cvx[:, None, :], cvy[:, None, :]
            sax, say = svx[:, :, None], svy[:, :, None]
            sbx, sby = svx[:, None, :], svy[:, None, :]
            ma = cmass[:, :, None].astype(jnp.float32)
            mb = cmass[:, None, :].astype(jnp.float32)
            ra = radc[:, :, None]
            rb = radc[:, None, :]

            if static_only:
                npax, nvax, npay, nvay, npbx, nvbx, npby, nvby = \
                    _avoid_static(pax, pay, vax, vay, pbx, pby, vbx, vby,
                                  ra, rb)
            else:
                d0 = jnp.sqrt(d2)
                # move back
                qax = pax - (vax + sax) * dt
                qay = pay - (vay + say) * dt
                qbx = pbx - (vbx + sbx) * dt
                qby = pby - (vby + sby) * dt
                # elastic on (dx, dy, d0)
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
                # move forward
                npax = qax + (vax + sax) * dt
                npay = qay + (vay + say) * dt
                npbx = qbx + (vbx + sbx) * dt
                npby = qby + (vby + sby) * dt
                # still touching?
                ddx1 = npbx - npax
                ddy1 = npby - npay
                dd21 = ddx1 * ddx1 + ddy1 * ddy1
                still = (ra + rb) * (ra + rb) >= dd21
                near = jnp.abs(cmass[:, :, None] - cmass[:, None, :]) <= 10
                # static branch
                s_ax, s_vax, s_ay, s_vay, s_bx, s_vbx, s_by, s_vby = \
                    _avoid_static(npax, npay, vax, vay, npbx, npby, vbx,
                                  vby, ra, rb)
                # separate branch
                p_ax, p_ay, p_bx, p_by = _separate(
                    npax, npay, npbx, npby, ma, mb, ra, rb,
                    tx[:, None, None], ty[:, None, None])
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
                npax, npay = _clampb(npax, npay, ra, W, H)
                npbx, npby = _clampb(npbx, npby, rb, W, H)

            ml = jnp.where(Mlow, 1.0, 0.0)
            has_a = jnp.any(Mlow, axis=2)
            has_b = jnp.any(Mlow, axis=1)
            ax_upd = jnp.sum(npax * ml, axis=2)
            ay_upd = jnp.sum(npay * ml, axis=2)
            avx_upd = jnp.sum(nvax * ml, axis=2)
            avy_upd = jnp.sum(nvay * ml, axis=2)
            bx_upd = jnp.sum(npbx * ml, axis=1)
            by_upd = jnp.sum(npby * ml, axis=1)
            bvx_upd = jnp.sum(nvbx * ml, axis=1)
            bvy_upd = jnp.sum(nvby * ml, axis=1)
            ncx = jnp.where(has_a, ax_upd, jnp.where(has_b, bx_upd, cx))
            ncy = jnp.where(has_a, ay_upd, jnp.where(has_b, by_upd, cy))
            ncvx = jnp.where(has_a, avx_upd,
                             jnp.where(has_b, bvx_upd, cvx))
            ncvy = jnp.where(has_a, avy_upd,
                             jnp.where(has_b, bvy_upd, cvy))
            return ncx, ncy, ncvx, ncvy

        def _avoid_static(pax, pay, vax, vay, pbx, pby, vbx, vby, ra, rb):
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
            nax, nay = _clampb(nax, nay, ra, W, H)
            nbx, nby = _clampb(nbx, nby, rb, W, H)
            nax = jnp.where(ov, nax, pax)
            nay = jnp.where(ov, nay, pay)
            nbx = jnp.where(ov, nbx, pbx)
            nby = jnp.where(ov, nby, pby)
            return nax, nvax, nay, nvay, nbx, nvbx, nby, nvby

        def _separate(pax, pay, pbx, pby, ma, mb, ra, rb, txx, tyy):
            dx = pbx - pax
            dy = pby - pay
            d = jnp.sqrt(dx * dx + dy * dy)
            td = ra + rb
            ov = d <= td
            denom = jnp.maximum(jnp.abs(dx) + jnp.abs(dy), 1e-12)
            rx = dx / denom
            ry = dy / denom
            depth = td - d
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

        if phases >= 2:
            def relax_body(_, carry):
                return pair_pass(*carry, False)

            cx, cy, cvx, cvy = jax.lax.fori_loop(
                0, 5, relax_body, (cx, cy, cvx, cvy))
            cx, cy, cvx, cvy = pair_pass(cx, cy, cvx, cvy, True)

        # --- virus events (P=1: best pair only) --------------------------
        n_start = jnp.sum(jnp.where(calive, 1, 0), axis=1)
        viruses_eaten = viruses_eaten_in
        if Nv > 0 and phases >= 3:
            radc = _radius(cmass)
            radv = _radius(vmass)
            ddx = cx[:, :, None] - vx_[:, None, :]
            ddy = cy[:, :, None] - vy_[:, None, :]
            d2 = ddx * ddx + ddy * ddy
            rm = jnp.maximum(radc[:, :, None], radv[:, None, :])
            can = (cmass[:, :, None].astype(jnp.float32)
                   > vmass[:, None, :].astype(jnp.float32) * C.CELL_EAT_MARGIN)
            elig = (_e2(calive) & valive[:, None, :] & can
                    & (rm * rm >= d2))
            pkey = jnp.where(elig, rank[:, :, None] * Nv
                             + jax.lax.broadcasted_iota(
                                 jnp.int32, (1, Cc, Nv), 2), _BIG_I)
            best = jnp.min(jnp.min(pkey, axis=2), axis=1)    # (E,)
            hit = best < _BIG_I
            can_eat_virus = n_start >= C.NUM_CELLS_TO_SPLIT
            # winning pair one-hots
            win_pair = elig & (pkey == best[:, None, None])
            win_cell = jnp.any(win_pair, axis=2)             # (E, Cc)
            win_virus = jnp.any(win_pair, axis=1)            # (E, Nv)
            vgain = jnp.sum(jnp.where(win_virus, vmass, 0), axis=1)
            viruses_eaten = viruses_eaten + jnp.where(hit, 1, 0)
            # ring push of the eat tick (anti-team window, SPEC)
            K_T = vticks.shape[1]
            kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K_T), 1)
            push_oh = _e1(hit) & (kiota == (vptr % K_T)[:, None])
            vticks = jnp.where(push_oh, elapsed[:, None], vticks)
            vptr = vptr + jnp.where(hit, 1, 0)
            # eat case
            eat = hit & can_eat_virus
            cmass = jnp.where(win_cell & _e1(eat),
                              cmass + vgain[:, None], cmass)
            # disrupt case
            disr = hit & ~can_eat_virus
            total = jnp.sum(jnp.where(win_cell, cmass, 0), axis=1)
            cur = jnp.maximum((total.astype(jnp.float32)
                               / C.CELL_POP_REDUCTION).astype(jnp.int32),
                              C.CELL_MIN_SIZE)
            cur = cur + (total - cur) % C.CELL_POP_SIZE
            pop_mass = total - cur
            num_new = (pop_mass + C.CELL_POP_SIZE - 1) // C.CELL_POP_SIZE
            num_new = jnp.where(
                disr, jnp.minimum(num_new, jnp.maximum(
                    C.PLAYER_CELL_LIMIT - n_start, 0)), 0)
            cmass = jnp.where(win_cell & _e1(disr), cur[:, None], cmass)
            crecomb = jnp.where(win_cell & _e1(disr),
                                (elapsed + C.RECOMBINE_TICKS)[:, None],
                                crecomb)
            hit_cvx = jnp.sum(jnp.where(win_cell, cvx, 0.0), axis=1)
            hit_cvy = jnp.sum(jnp.where(win_cell, cvy, 0.0), axis=1)
            hit_vx = jnp.sum(jnp.where(win_virus, vx_, 0.0), axis=1)
            hit_vy = jnp.sum(jnp.where(win_virus, vy_, 0.0), axis=1)
            valive = valive & ~(win_virus & _e1(hit))
        else:
            disr = jnp.zeros((E,), bool)
            num_new = jnp.zeros((E,), jnp.int32)
            pop_mass = jnp.zeros((E,), jnp.int32)
            hit_cvx = hit_cvy = hit_vx = hit_vy = jnp.zeros((E,),
                                                            jnp.float32)

        # --- pellets (SPEC M1) -------------------------------------------
        # chunked over Np so VMEM temps stay (E, Cc, CHUNK)
        radc = _radius(cmass)
        food_eaten = food_eaten_in
        highest = highest_in
        eaten_pc = jnp.zeros((E, Cc), jnp.int32)
        PCHUNK = 128
        if phases >= 4:
            # static chunk loop (Mosaic has no dynamic_slice lowering)
            n_chunks = (Np + PCHUNK - 1) // PCHUNK
            pad = n_chunks * PCHUNK - Np
            pal_int = jnp.where(palive, 1, 0)
            if pad:
                px_p = jnp.concatenate(
                    [px, jnp.zeros((E, pad), px.dtype)], axis=1)
                py_p = jnp.concatenate(
                    [py, jnp.zeros((E, pad), py.dtype)], axis=1)
                # pad the alive mask in int32 (Mosaic can't concat/slice i1)
                pal_pi = jnp.concatenate(
                    [pal_int, jnp.zeros((E, pad), jnp.int32)], axis=1)
            else:
                px_p, py_p, pal_pi = px, py, pal_int

            def chunk_elig(k):
                # explicit static slices (mixed None+offset-slice indexing
                # lowers as an unsupported gather)
                cpx = jax.lax.slice_in_dim(px_p, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=1)
                cpy = jax.lax.slice_in_dim(py_p, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=1)
                cpa = jax.lax.slice_in_dim(pal_pi, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=1)
                pdx = cx[:, :, None] - cpx[:, None, :]
                pdy = cy[:, :, None] - cpy[:, None, :]
                pd2 = pdx * pdx + pdy * pdy
                return (_e2(calive) & (cpa[:, None, :] > 0)
                        & ((radc * radc)[:, :, None] >= pd2))

            pmins = []
            for k in range(n_chunks):
                elig = chunk_elig(k)
                pkey = jnp.where(elig, rank[:, :, None], _BIG_I)
                pmins.append(jnp.min(pkey, axis=1))          # (E, PCHUNK)
            for k in range(n_chunks):
                elig = chunk_elig(k)
                win = elig & (rank[:, :, None] == pmins[k][:, None, :])
                eaten_pc = eaten_pc + jnp.sum(jnp.where(win, 1, 0), axis=2)
            pmin = jnp.concatenate(pmins, axis=1)[:, :Np]
            palive = palive & (pmin == _BIG_I)
            cmass = cmass + eaten_pc * C.PELLET_MASS
            food_eaten = food_eaten_in + jnp.sum(eaten_pc, axis=1)
            pm_now = jnp.sum(jnp.where(calive, cmass, 0), axis=1)
            highest = jnp.maximum(highest_in, pm_now)

        # --- auto-split --------------------------------------------------
        do_actions = phases >= 5
        over = calive & (cmass >= C.MAX_MASS_IN_THE_GAME) \
            if do_actions else jnp.zeros_like(calive)
        may = _e1(n_start < C.PLAYER_CELL_LIMIT)
        do_aspl = over & may
        clampm = over & ~may
        a_rem, a_nf = _split_cells(cx, cy, cmass, tx, ty, elapsed, W, H)
        cmass = jnp.where(do_aspl, a_rem,
                          jnp.where(clampm, C.NEW_MASS_IF_NO_SPLIT, cmass))
        crecomb = jnp.where(do_aspl, (elapsed + C.RECOMBINE_TICKS)[:, None],
                            crecomb)
        n_auto = jnp.sum(jnp.where(do_aspl, 1, 0), axis=1)

        # --- foods eaten -------------------------------------------------
        if Nf > 0 and do_actions:
            rf = _radius(np.float32(C.FOOD_MASS))
            radc2 = _radius(cmass)
            fdx = cx[:, :, None] - fx[:, None, :]
            fdy = cy[:, :, None] - fy[:, None, :]
            fd2 = fdx * fdx + fdy * fdy
            rm2 = jnp.maximum(radc2[:, :, None], rf)
            can_f = cmass[:, :, None] > np.int32(
                C.FOOD_MASS * C.CELL_EAT_MARGIN)
            felig = (_e2(calive) & falive[:, None, :] & can_f
                     & (rm2 * rm2 >= fd2))
            fkey = jnp.where(felig, rank[:, :, None], _BIG_I)
            fmin = jnp.min(fkey, axis=1)
            fwin = felig & (fkey == fmin[:, None, :])
            eaten_fc = jnp.sum(jnp.where(fwin, 1, 0), axis=2)
            falive = falive & (fmin == _BIG_I)
            cmass = cmass + eaten_fc * C.FOOD_MASS
            food_eaten = food_eaten + jnp.sum(eaten_fc, axis=1)

        # --- feed emission ----------------------------------------------
        feed_cd = jnp.maximum(feed_cd_in - 1, 0)
        do_feed = (action_eff == 1) & (feed_cd == 0) & do_actions
        emit = (calive & _e1(do_feed)
                & (cmass >= C.CELL_MIN_SIZE + C.FOOD_MASS))
        if Nf > 0 and do_actions:
            edx = tx[:, None] - cx
            edy = ty[:, None] - cy
            en = jnp.maximum(jnp.sqrt(edx * edx + edy * edy), 1e-12)
            edx = edx / en
            edy = edy / en
            elx = cx + edx * radc
            ely = cy + edy * radc
            evx = edx * C.FOOD_SPEED
            evy = edy * C.FOOD_SPEED
            # order among emitting cells by rank
            ekey = jnp.where(emit, rank, _BIG_I)
            eord = jnp.sum(jnp.where((ekey[:, :, None] > ekey[:, None, :])
                                     & emit[:, None, :], 1, 0), axis=2)
            slot = (fnext[:, None] + eord) % Nf
            oh = _e2(emit) & (slot[:, :, None]
                                     == jax.lax.broadcasted_iota(
                                         jnp.int32, (1, 1, Nf), 2))
            wrote = jnp.any(oh, axis=1)                      # (E, Nf)
            ohf = jnp.where(oh, 1.0, 0.0)
            fx = jnp.where(wrote, jnp.sum(elx[:, :, None] * ohf, axis=1), fx)
            fy = jnp.where(wrote, jnp.sum(ely[:, :, None] * ohf, axis=1), fy)
            fvx = jnp.where(wrote, jnp.sum(evx[:, :, None] * ohf, axis=1),
                            fvx)
            fvy = jnp.where(wrote, jnp.sum(evy[:, :, None] * ohf, axis=1),
                            fvy)
            falive = falive | wrote
            fnext = fnext + jnp.sum(jnp.where(emit, 1, 0), axis=1)
            cmass = jnp.where(emit, cmass - C.FOOD_MASS, cmass)
        feed_cd = jnp.where(do_feed, C.FEED_COOLDOWN, feed_cd)
        feed_cd = jnp.where(palive_p, feed_cd, feed_cd_in)

        # --- split -------------------------------------------------------
        split_cd = jnp.maximum(split_cd_in - 1, 0)
        do_split = (action_eff == 2) & (split_cd == 0) & do_actions
        limit = jnp.maximum(C.PLAYER_CELL_LIMIT - n_start - num_new - n_auto,
                            0)
        s_elig = calive & (cmass >= C.CELL_SPLIT_MINIMUM) & _e1(do_split)
        skey = jnp.where(s_elig, rank, _BIG_I)
        sord = jnp.sum(jnp.where((skey[:, :, None] > skey[:, None, :])
                                 & s_elig[:, None, :], 1, 0), axis=2)
        chosen = s_elig & (sord < limit[:, None])
        s_rem, s_nf = _split_cells(cx, cy, cmass, tx, ty, elapsed, W, H)
        cmass = jnp.where(chosen, s_rem, cmass)
        crecomb = jnp.where(chosen, (elapsed + C.RECOMBINE_TICKS)[:, None],
                            crecomb)
        split_cd = jnp.where(do_split, C.SPLIT_COOLDOWN, split_cd)
        split_cd = jnp.where(palive_p, split_cd, split_cd_in)

        # --- place created cells (disrupt pops, auto-splits, splits) -----
        do_place = phases >= 3
        # disrupt pop candidates: up to PLAYER_CELL_LIMIT per env
        K = C.PLAYER_CELL_LIMIT
        if do_place:
            kk = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            d_mask = _e1(disr) & (kk < num_new[:, None])
            cth, sth = _dir_cos_sin(hit_cvx, hit_cvy)
            # angle = 2*theta + 2*pi*k/n (SPEC Q3 doubled-direction quirk):
            # cos/sin composed from double-angle + phi_k terms
            c2 = cth * cth - sth * sth
            s2 = 2.0 * cth * sth
            nnf = jnp.maximum(num_new, 1).astype(jnp.float32)
            phik = 2.0 * jnp.pi * kk.astype(jnp.float32) / nnf[:, None]
            cphi = jnp.cos(phik)
            sphi = jnp.sin(phik)
            cos_ang = c2[:, None] * cphi - s2[:, None] * sphi
            sin_ang = s2[:, None] * cphi + c2[:, None] * sphi
            pop_speed = _max_speed(np.float32(C.CELL_POP_SIZE))
            d_mass = jnp.maximum(jnp.minimum(
                pop_mass[:, None] - C.CELL_POP_SIZE * kk, C.CELL_POP_SIZE), 1)

            # assemble candidate list: [disrupt K] + [auto Cc] + [split Cc]
            def cat(*parts):
                return jnp.concatenate(parts, axis=1)

            NEWK = K + 2 * Cc
            cand_mask = cat(jnp.where(d_mask, 1, 0),
                            jnp.where(do_aspl, 1, 0),
                            jnp.where(chosen, 1, 0)) > 0
            # creation order: disrupts (kk), then autos, then splits; orders are
            # disjoint blocks so offset by counts
            a_ord = jnp.sum(jnp.where(
                (jnp.where(do_aspl, rank, _BIG_I)[:, :, None]
                 > jnp.where(do_aspl, rank, _BIG_I)[:, None, :])
                & do_aspl[:, None, :], 1, 0), axis=2)
            cand_order = cat(
                jnp.where(d_mask, kk, _BIG_I),
                jnp.where(do_aspl, num_new[:, None] + a_ord, _BIG_I),
                jnp.where(chosen, (num_new + n_auto)[:, None] + sord, _BIG_I))
            cand_x = cat(jnp.broadcast_to(hit_vx[:, None], (E, K)),
                         a_nf["x"], s_nf["x"])
            cand_y = cat(jnp.broadcast_to(hit_vy[:, None], (E, K)),
                         a_nf["y"], s_nf["y"])
            cand_vx = cat(jnp.broadcast_to(hit_cvx[:, None], (E, K)),
                          a_nf["vx"], s_nf["vx"])
            cand_vy = cat(jnp.broadcast_to(hit_cvy[:, None], (E, K)),
                          a_nf["vy"], s_nf["vy"])
            cand_svx = cat(cos_ang * pop_speed, a_nf["vx"], s_nf["vx"])
            cand_svy = cat(sin_ang * pop_speed, a_nf["vy"], s_nf["vy"])
            cand_mass = cat(d_mass, a_nf["mass"], s_nf["mass"])

            free = ~calive
            num_free = jnp.sum(jnp.where(free, 1, 0), axis=1, keepdims=True)
            free_rank = _cumsum1(jnp.where(free, 1, 0)) - 1
            orderv = jnp.where(cand_mask, cand_order, _BIG_I)
            valid = cand_mask & (orderv < num_free)
            # ids in creation order
            ids = next_id[:, None] + orderv
            next_id = next_id + jnp.sum(jnp.where(valid, 1, 0), axis=1)
            oh2 = (_e2(valid) & free[:, None, :]
                   & (free_rank[:, None, :] == orderv[:, :, None]))  # (E,NEWK,Cc)
            claimed = jnp.any(oh2, axis=1)
            oh2f = jnp.where(oh2, 1.0, 0.0)

            def wr_f(old, vals):
                return jnp.where(claimed,
                                 jnp.sum(vals[:, :, None] * oh2f, axis=1), old)

            def wr_i(old, vals):
                return jnp.where(claimed,
                                 jnp.sum(jnp.where(oh2, vals[:, :, None], 0),
                                         axis=1), old)

            cx = wr_f(cx, cand_x)
            cy = wr_f(cy, cand_y)
            cvx = wr_f(cvx, cand_vx)
            cvy = wr_f(cvy, cand_vy)
            svx = wr_f(svx, cand_svx)
            svy = wr_f(svy, cand_svy)
            cmass = wr_i(cmass, jnp.maximum(cand_mass, C.CELL_MIN_SIZE))
            cid = wr_i(cid, ids)
            crecomb = jnp.where(claimed, (elapsed + C.RECOMBINE_TICKS)[:, None],
                                crecomb)
            calive = calive | claimed

        # --- recombine (SPEC M7): fixed-trip merge loop -------------------
        def rec_body(_, carry):
            cmass, calive_i = carry
            calive = calive_i > 0
            rk = _rank_of(cid, calive)
            can = calive & (elapsed[:, None] >= crecomb)
            radm = _radius(cmass)
            dx = cx[:, None, :] - cx[:, :, None]
            dy = cy[:, None, :] - cy[:, :, None]
            d2 = dx * dx + dy * dy
            rs = radm[:, :, None] + radm[:, None, :]
            lower = rk[:, :, None] < rk[:, None, :]
            elig = (_e2(can) & can[:, None, :] & lower
                    & (rs * rs >= d2))
            keyr = jnp.where(elig, rk[:, :, None] * Cc + rk[:, None, :],
                             _BIG_I)
            bst = jnp.min(jnp.min(keyr, axis=2), axis=1)
            has = bst < _BIG_I
            wpair = elig & (keyr == bst[:, None, None])
            wi = jnp.any(wpair, axis=2)
            wj = jnp.any(wpair, axis=1)
            gain = jnp.sum(jnp.where(wj, cmass, 0), axis=1)
            cmass = jnp.where(wi & _e1(has), cmass + gain[:, None],
                              cmass)
            calive = calive & ~(wj & _e1(has))
            return cmass, jnp.where(calive, 1, 0)

        if phases >= 6:
            cmass, calive_i = jax.lax.fori_loop(
                0, Cc // 2, rec_body, (cmass, jnp.where(calive, 1, 0)))
            calive = calive_i > 0

        # --- anti-team + decay -------------------------------------------
        last_decay = last_decay_in
        anti_team = anti_team_in
        if ms.mass_decay and phases >= 7:
            due = palive_p & (elapsed % 60 == 0)
            fall_off = elapsed[:, None] - C.ANTI_TEAM_ACTIVATION_TICKS
            expired = vticks < fall_off
            vticks = jnp.where(_e1(due) & expired,
                               np.int32(-(2**30)), vticks)
            n_recent = jnp.sum(jnp.where(vticks != np.int32(-(2**30)), 1, 0), axis=1)
            anti_team = jnp.where(due & (n_recent > 0),
                                  jnp.power(1.1, (n_recent - 1)
                                            .astype(jnp.float32)),
                                  anti_team)
            do_decay = due & (elapsed - last_decay >= C.DECAY_TICKS)
            decayed = jnp.maximum(
                (cmass.astype(jnp.float32)
                 * (1.0 - C.PLAYER_DECAY_RATE * anti_team[:, None]))
                .astype(jnp.int32), C.CELL_MIN_SIZE)
            cmass = jnp.where(_e1(do_decay) & calive, decayed, cmass)
            last_decay = jnp.where(do_decay, elapsed, last_decay)

        # --- foods move + virus feeding ----------------------------------
        if Nf > 0 and phases >= 8:
            moving = falive & ((fvx != 0.0) | (fvy != 0.0))
            pfvx, pfvy = fvx, fvy
            nfvx, nfvy = _decel(fvx, fvy, C.FOOD_DECEL, dt)
            rf = _radius(np.float32(C.FOOD_MASS))
            nfx = fx + nfvx * dt
            nfy = fy + nfvy * dt
            nfx, nfy = _clampb(nfx, nfy, rf, W, H)
            fx = jnp.where(moving, nfx, fx)
            fy = jnp.where(moving, nfy, fy)
            fvx = jnp.where(moving, nfvx, fvx)
            fvy = jnp.where(moving, nfvy, fvy)
            if Nv > 0:
                radv2 = _radius(vmass)
                cdx = fx[:, :, None] - vx_[:, None, :]
                cdy = fy[:, :, None] - vy_[:, None, :]
                cd2 = cdx * cdx + cdy * cdy
                rmv = jnp.maximum(rf, radv2[:, None, :])
                coll = (_e2(moving) & valive[:, None, :]
                        & (rmv * rmv >= cd2))                # (E, Nf, Nv)
                viota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Nv), 2)
                hitv = jnp.min(jnp.where(coll, viota, _BIG_I), axis=2)
                fhit = hitv < _BIG_I
                hitm = _e2(fhit) & (hitv[:, :, None] == viota)
                hcount = jnp.sum(jnp.where(hitm, 1, 0), axis=1)  # (E, Nv)
                nh = vhits + hcount
                burst = valive & (nh > C.NUMBER_OF_FOOD_HITS)
                post = jnp.maximum(nh - (C.NUMBER_OF_FOOD_HITS + 1), 0)
                vhits = jnp.where(burst, post, nh)
                vmass = jnp.where(burst,
                                  C.VIRUS_INITIAL_MASS + post * C.FOOD_MASS,
                                  vmass + hcount * C.FOOD_MASS)
                falive = falive & ~fhit
                # spawn: lowest-slot burst, lowest dead slot, lowest food
                any_burst = jnp.any(burst, axis=1)
                viota2 = jax.lax.broadcasted_iota(jnp.int32, (1, Nv), 1)
                bslot = jnp.min(jnp.where(burst, viota2, _BIG_I), axis=1)
                f_hit_b = fhit & (hitv == bslot[:, None])
                fiota = jax.lax.broadcasted_iota(jnp.int32, (1, Nf), 1)
                src = jnp.min(jnp.where(f_hit_b, fiota, _BIG_I), axis=1)
                src_oh = (fiota == jnp.where(src < _BIG_I, src, -1)
                          [:, None])
                svx_f = jnp.sum(jnp.where(src_oh, pfvx, 0.0), axis=1)
                svy_f = jnp.sum(jnp.where(src_oh, pfvy, 0.0), axis=1)
                b_oh = (viota2 == jnp.where(bslot < _BIG_I, bslot, -1)
                        [:, None])
                bx = jnp.sum(jnp.where(b_oh, vx_, 0.0), axis=1)
                by = jnp.sum(jnp.where(b_oh, vy_, 0.0), axis=1)
                spx = bx + svx_f * dt * 10.0
                spy = by + svy_f * dt * 10.0
                rnew = _radius(np.float32(C.VIRUS_INITIAL_MASS))
                spx, spy = _clampb(spx, spy, rnew, W, H)
                dead_rank = _cumsum1(jnp.where(valive, 0, 1)) - 1
                dslot_oh = ((~valive) & (dead_rank == 0)
                            & _e1(any_burst))
                vx_ = jnp.where(dslot_oh, spx[:, None], vx_)
                vy_ = jnp.where(dslot_oh, spy[:, None], vy_)
                vvx = jnp.where(dslot_oh, svx_f[:, None], vvx)
                vvy = jnp.where(dslot_oh, svy_f[:, None], vvy)
                vmass = jnp.where(dslot_oh, C.VIRUS_INITIAL_MASS, vmass)
                vhits = jnp.where(dslot_oh, 0, vhits)
                valive = valive | dslot_oh

        # --- regeneration ------------------------------------------------
        if ms.pellet_regen and phases >= 9:
            due_r = (ticks % C.REGEN_PERIOD) == 0
            n_alive = jnp.sum(jnp.where(palive, 1, 0), axis=1)
            deficit = jnp.maximum(cfg.num_pellets - n_alive, 0)
            dead_order = _cumsum1(jnp.where(palive, 0, 1)) - 1
            fill = _e1(due_r) & ~palive & (dead_order < deficit[:, None])
            rp = _radius(np.float32(C.PELLET_MASS))
            piota = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
            nx_ = _uniform(0.0, W - 2 * rp, seed[:, None], 1,
                           ticks[:, None], piota, 0) + rp
            ny_ = _uniform(0.0, H - 2 * rp, seed[:, None], 1,
                           ticks[:, None], piota, 1) + rp
            px = jnp.where(fill, nx_, px)
            py = jnp.where(fill, ny_, py)
            palive = palive | fill
            if Nv > 0:
                nv_alive = jnp.sum(jnp.where(valive, 1, 0), axis=1)
                vdef = jnp.maximum(cfg.num_viruses - nv_alive, 0)
                vdead_order = _cumsum1(jnp.where(valive, 0, 1)) - 1
                vfill = (_e1(due_r) & ~valive
                         & (vdead_order < vdef[:, None]))
                rv = _radius(np.float32(C.VIRUS_INITIAL_MASS))
                viota3 = jax.lax.broadcasted_iota(jnp.int32, (1, Nv), 1)
                nvx_ = _uniform(0.0, W - 2 * rv, seed[:, None], 2,
                                ticks[:, None], viota3, 0) + rv
                nvy_ = _uniform(0.0, H - 2 * rv, seed[:, None], 2,
                                ticks[:, None], viota3, 1) + rv
                vx_ = jnp.where(vfill, nvx_, vx_)
                vy_ = jnp.where(vfill, nvy_, vy_)
                vvx = jnp.where(vfill, 0.0, vvx)
                vvy = jnp.where(vfill, 0.0, vvy)
                vmass = jnp.where(vfill, C.VIRUS_INITIAL_MASS, vmass)
                vhits = jnp.where(vfill, 0, vhits)
                valive = valive | vfill

        # --- writeback (2D whole-array stores) ---------------------------
        keep = calive
        o_tx[...] = tx[:, None]
        o_ty[...] = ty[:, None]
        o_action[...] = action[:, None]
        o_split_cd[...] = split_cd[:, None]
        o_feed_cd[...] = feed_cd[:, None]
        o_elapsed[...] = elapsed[:, None]
        o_last_decay[...] = last_decay[:, None]
        o_anti_team[...] = anti_team[:, None]
        o_vticks[...] = vticks
        o_vptr[...] = vptr[:, None]
        o_food_eaten[...] = food_eaten[:, None]
        o_highest[...] = highest[:, None]
        o_viruses_eaten[...] = viruses_eaten[:, None]
        o_cx[...] = jnp.where(keep, cx, 0.0)
        o_cy[...] = jnp.where(keep, cy, 0.0)
        o_cvx[...] = jnp.where(keep, cvx, 0.0)
        o_cvy[...] = jnp.where(keep, cvy, 0.0)
        o_svx[...] = jnp.where(keep, svx, 0.0)
        o_svy[...] = jnp.where(keep, svy, 0.0)
        o_cmass[...] = jnp.where(keep, cmass, 0)
        o_calive[...] = calive
        o_cid[...] = cid
        o_crecomb[...] = crecomb
        o_next_id[...] = next_id[:, None]
        o_px[...] = px
        o_py[...] = py
        o_palive[...] = palive
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
        o_fnext[...] = fnext[:, None]
        o_ticks[...] = (ticks + 1)[:, None]
        o_seed[...] = seed[:, None]

    def _split_cells(cx, cy, cmass, tx, ty, elapsed, W, H):
        """cell_split fields for every cell (masking applied by caller)."""
        split_mass = cmass // 2
        remaining = jnp.maximum(cmass - split_mass, C.CELL_MIN_SIZE)
        radr = _radius(remaining)
        dx = tx[:, None] - cx
        dy = ty[:, None] - cy
        n = jnp.maximum(jnp.sqrt(dx * dx + dy * dy), 1e-12)
        dx = dx / n
        dy = dy / n
        lx = cx + dx * radr
        ly = cy + dy * radr
        lx, ly = _clampb(lx, ly, radr, W, H)
        spd = _split_speed(split_mass)
        return remaining, dict(x=lx, y=ly, vx=dx * spd, vy=dy * spd,
                               mass=split_mass)

    return kernel


# (name, kind): kind "s" = per-env scalar -> (N,1); "p" = per-player (N,P=1)
# kept as-is; "v2" = (... ,2) vector field split into _x/_y; "2d" = already 2D
_SPLIT_PLAN = [
    ("target", "v2p"),          # (N,1,2) -> tx, ty (N,1)
    ("action", "p"), ("split_cooldown", "p"), ("feed_cooldown", "p"),
    ("elapsed_ticks", "p"), ("last_decay_tick", "p"),
    ("anti_team_decay", "p"),
    ("virus_eaten_ticks", "pk"),   # (N,1,K) -> (N,K)
    ("virus_eaten_ptr", "p"),
    ("food_eaten", "p"), ("highest_mass", "p"), ("viruses_eaten", "p"),
    ("cell_pos", "v2c"), ("cell_vel", "v2c"), ("cell_split_vel", "v2c"),
    ("cell_mass", "pc"), ("cell_alive", "pc"), ("cell_id", "pc"),
    ("cell_recombine_at", "pc"), ("next_cell_id", "s"),
    ("pellet_pos", "v2"), ("pellet_alive", "2d"),
    ("virus_pos", "v2"), ("virus_vel", "v2"), ("virus_mass", "2d"),
    ("virus_hits", "2d"), ("virus_alive", "2d"),
    ("food_pos", "v2"), ("food_vel", "v2"), ("food_alive", "2d"),
    ("food_next", "s"), ("ticks", "s"), ("seed", "s"),
]


def _to_kernel_arrays(states: GameState):
    """GameState (batched, P=1) -> flat list of clean 2D arrays."""
    out = []
    for name, kind in _SPLIT_PLAN:
        x = getattr(states, name)
        if kind == "s":
            out.append(x[:, None])
        elif kind == "p":
            out.append(x)                        # (N, 1)
        elif kind == "pk":
            out.append(x[:, 0, :])               # (N, K)
        elif kind == "pc":
            out.append(x[:, 0, :])               # (N, Cc)
        elif kind == "v2p":
            out.append(x[:, 0, 0:1])             # tx (N,1)
            out.append(x[:, 0, 1:2])             # ty (N,1)
        elif kind == "v2c":
            out.append(x[:, 0, :, 0])            # (N, Cc)
            out.append(x[:, 0, :, 1])
        elif kind == "v2":
            out.append(x[:, :, 0])               # (N, F)
            out.append(x[:, :, 1])
        elif kind == "2d":
            out.append(x)
        else:
            raise ValueError(kind)
    return out


def _from_kernel_arrays(states: GameState, outs):
    """Inverse of _to_kernel_arrays."""
    kw = {}
    i = 0
    for name, kind in _SPLIT_PLAN:
        if kind == "s":
            kw[name] = outs[i][:, 0]
            i += 1
        elif kind == "p":
            kw[name] = outs[i]
            i += 1
        elif kind in ("pk", "pc"):
            kw[name] = outs[i][:, None, :]
            i += 1
        elif kind == "v2p":
            kw[name] = jnp.stack([outs[i][:, 0], outs[i + 1][:, 0]],
                                 axis=-1)[:, None, :]
            i += 2
        elif kind == "v2c":
            kw[name] = jnp.stack([outs[i], outs[i + 1]], axis=-1)[:, None]
            i += 2
        elif kind == "v2":
            kw[name] = jnp.stack([outs[i], outs[i + 1]], axis=-1)
            i += 2
        elif kind == "2d":
            kw[name] = outs[i]
            i += 1
    return states.replace(**kw)


def supports(cfg: EnvConfig) -> bool:
    """The fused path covers single-player configs (no bots)."""
    return cfg.num_players == 1


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def fused_engine_tick(cfg: EnvConfig, states: GameState,
                      block_envs: int = 256,
                      interpret: bool = False,
                      phases: int = 99) -> GameState:
    """One engine tick over a BATCH of envs via the fused kernel.

    states: a vmapped GameState with leading env axis N (N % block_envs == 0,
    or block_envs is clamped to N).
    """
    assert supports(cfg), "fused tick requires num_players == 1"
    N = states.ticks.shape[0]
    E = min(block_envs, N)
    assert N % E == 0, (N, E)

    ins = _to_kernel_arrays(states)

    def spec_for(x):
        blk = (E,) + x.shape[1:]
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1))

    in_specs = [spec_for(x) for x in ins]
    out_specs = in_specs
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ins]

    kernel = _make_kernel(cfg, phases)
    outs = pl.pallas_call(
        kernel,
        grid=(N // E,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(len(ins))},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    return _from_kernel_arrays(states, outs)
