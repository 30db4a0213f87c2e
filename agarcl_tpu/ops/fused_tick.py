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
    u = bits.astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    return lo + (hi - lo) * u


def _radius(mass):
    return jnp.sqrt(mass.astype(jnp.float32) / jnp.pi)


def _max_speed(mass):
    m = jnp.maximum(mass.astype(jnp.float32), 1.0)
    return C.CELL_MAX_SPEED / jnp.power(m, 0.439)


def _split_speed(mass):
    return jnp.clip(3.0 * jnp.power(_max_speed(mass), 1.2), 20.0, 130.0)


def _direction(dx, dy):
    both_zero = (dx == 0.0) & (dy == 0.0)
    ratio = jnp.where(dy == 0.0, jnp.sign(dx) * jnp.inf,
                      dx / jnp.where(dy == 0.0, 1.0, dy))
    ang = jnp.arctan(ratio)
    ang = jnp.where(dx < 0, jnp.where(dy > 0, ang + jnp.pi, ang - jnp.pi),
                    ang)
    return jnp.where(both_zero, 0.0, ang)


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


def _rank_of(cid, alive):
    """(E,Cc) counting rank by id among live cells."""
    key = jnp.where(alive, cid, _BIG_I)
    return jnp.sum(key[:, :, None] > key[:, None, :], axis=-1) \
        .astype(jnp.int32)


# ------------------------------------------------------------------ kernel
def _make_kernel(cfg: EnvConfig):
    Cc = cfg.max_cells
    Np = cfg.pellet_capacity
    Nv = cfg.virus_capacity
    Nf = cfg.food_capacity
    W, H = cfg.arena_width, cfg.arena_height
    dt = np.float32(cfg.dt)
    ms = cfg.mode_spec

    def kernel(target_ref, action_ref, split_cd_ref, feed_cd_ref,
               elapsed_ref, last_decay_ref, anti_team_ref,
               vticks_ref, vptr_ref,
               food_eaten_ref, highest_ref, viruses_eaten_ref,
               cpos_ref, cvel_ref, csvel_ref, cmass_ref, calive_ref,
               cid_ref, crecomb_ref, next_id_ref,
               ppos_ref, palive_ref,
               vpos_ref, vvel_ref, vmass_ref, vhits_ref, valive_ref,
               fpos_ref, fvel_ref, falive_ref, fnext_ref,
               ticks_ref, seed_ref,
               # outputs (aliased to inputs)
               o_target, o_action, o_split_cd, o_feed_cd, o_elapsed,
               o_last_decay, o_anti_team, o_vticks, o_vptr,
               o_food_eaten, o_highest,
               o_viruses_eaten, o_cpos, o_cvel, o_csvel, o_cmass, o_calive,
               o_cid, o_crecomb, o_next_id, o_ppos, o_palive, o_vpos,
               o_vvel, o_vmass, o_vhits, o_valive, o_fpos, o_fvel,
               o_falive, o_fnext, o_ticks, o_seed):
        E = target_ref.shape[0]
        target_v = target_ref[...]
        tx = target_v[:, 0, 0]                   # (E,)
        ty = target_v[:, 0, 1]
        action = action_ref[...][:, 0]
        split_cd_in = split_cd_ref[...][:, 0]
        feed_cd_in = feed_cd_ref[...][:, 0]
        elapsed_in = elapsed_ref[...][:, 0]
        last_decay_in = last_decay_ref[...][:, 0]
        anti_team_in = anti_team_ref[...][:, 0]
        food_eaten_in = food_eaten_ref[...][:, 0]
        highest_in = highest_ref[...][:, 0]
        viruses_eaten_in = viruses_eaten_ref[...][:, 0]
        ticks = ticks_ref[...]
        seed = seed_ref[...]
        vticks = vticks_ref[...][:, 0, :]        # (E, K)
        vptr = vptr_ref[...][:, 0]

        cpos_v = cpos_ref[...]
        cx = cpos_v[:, 0, :, 0]                  # (E, Cc)
        cy = cpos_v[:, 0, :, 1]
        cvel_v = cvel_ref[...]
        cvx = cvel_v[:, 0, :, 0]
        cvy = cvel_v[:, 0, :, 1]
        csvel_v = csvel_ref[...]
        svx = csvel_v[:, 0, :, 0]
        svy = csvel_v[:, 0, :, 1]
        cmass = cmass_ref[...][:, 0, :]
        calive = calive_ref[...][:, 0, :]
        cid = cid_ref[...][:, 0, :]
        crecomb = crecomb_ref[...][:, 0, :]
        next_id = next_id_ref[...]

        palive = palive_ref[...]                 # (E, Np)
        ppos_v = ppos_ref[...]
        px = ppos_v[:, :, 0]
        py = ppos_v[:, :, 1]
        vpos_v = vpos_ref[...]
        vx_ = vpos_v[:, :, 0]                    # (E, Nv)
        vy_ = vpos_v[:, :, 1]
        vvel_v = vvel_ref[...]
        vvx = vvel_v[:, :, 0]
        vvy = vvel_v[:, :, 1]
        vmass = vmass_ref[...]
        vhits = vhits_ref[...]
        valive = valive_ref[...]
        fpos_v = fpos_ref[...]
        fx = fpos_v[:, :, 0]                     # (E, Nf)
        fy = fpos_v[:, :, 1]
        fvel_v = fvel_ref[...]
        fvx = fvel_v[:, :, 0]
        fvy = fvel_v[:, :, 1]
        falive = falive_ref[...]
        fnext = fnext_ref[...]

        palive_p = jnp.any(calive, axis=1)       # player alive (E,)
        action_eff = jnp.where(palive_p, action, 0)
        elapsed = elapsed_in + palive_p.astype(jnp.int32)

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

        rank = _rank_of(cid, calive)

        # --- self-collision relaxation (SPEC M6, matrix form) ------------
        def pair_pass(cx, cy, cvx, cvy, static_only):
            dx = cx[:, None, :] - cx[:, :, None]     # (E, i, j): j - i
            dy = cy[:, None, :] - cy[:, :, None]
            d2 = dx * dx + dy * dy
            radc = _radius(cmass)
            rs = radc[:, :, None] + radc[:, None, :]
            eye = jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc), 0) \
                == jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc), 1)
            both = calive[:, :, None] & calive[:, None, :] & ~eye[None]
            touch = both & (rs * rs >= d2)
            key = jnp.where(touch, rank[:, None, :], _BIG_I)
            minkey = jnp.min(key, axis=-1, keepdims=True)
            chose = touch & (key == minkey)
            M = chose & jnp.swapaxes(chose, 1, 2)
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

            ml = Mlow.astype(jnp.float32)
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

        def relax_body(_, carry):
            return pair_pass(*carry, False)

        cx, cy, cvx, cvy = jax.lax.fori_loop(
            0, 5, relax_body, (cx, cy, cvx, cvy))
        cx, cy, cvx, cvy = pair_pass(cx, cy, cvx, cvy, True)

        # --- virus events (P=1: best pair only) --------------------------
        n_start = jnp.sum(calive, axis=1).astype(jnp.int32)
        viruses_eaten = viruses_eaten_in
        if Nv > 0:
            radc = _radius(cmass)
            radv = _radius(vmass)
            ddx = cx[:, :, None] - vx_[:, None, :]
            ddy = cy[:, :, None] - vy_[:, None, :]
            d2 = ddx * ddx + ddy * ddy
            rm = jnp.maximum(radc[:, :, None], radv[:, None, :])
            can = (cmass[:, :, None].astype(jnp.float32)
                   > vmass[:, None, :].astype(jnp.float32) * C.CELL_EAT_MARGIN)
            elig = (calive[:, :, None] & valive[:, None, :] & can
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
            viruses_eaten = viruses_eaten + hit.astype(jnp.int32)
            # ring push of the eat tick (anti-team window, SPEC)
            K_T = vticks.shape[1]
            kiota = jax.lax.broadcasted_iota(jnp.int32, (1, K_T), 1)
            push_oh = hit[:, None] & (kiota == (vptr % K_T)[:, None])
            vticks = jnp.where(push_oh, elapsed[:, None], vticks)
            vptr = vptr + hit.astype(jnp.int32)
            # eat case
            eat = hit & can_eat_virus
            cmass = jnp.where(win_cell & eat[:, None],
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
            cmass = jnp.where(win_cell & disr[:, None], cur[:, None], cmass)
            crecomb = jnp.where(win_cell & disr[:, None],
                                (elapsed + C.RECOMBINE_TICKS)[:, None],
                                crecomb)
            hit_cvx = jnp.sum(jnp.where(win_cell, cvx, 0.0), axis=1)
            hit_cvy = jnp.sum(jnp.where(win_cell, cvy, 0.0), axis=1)
            hit_vx = jnp.sum(jnp.where(win_virus, vx_, 0.0), axis=1)
            hit_vy = jnp.sum(jnp.where(win_virus, vy_, 0.0), axis=1)
            valive = valive & ~(win_virus & hit[:, None])
        else:
            disr = jnp.zeros((E,), bool)
            num_new = jnp.zeros((E,), jnp.int32)
            pop_mass = jnp.zeros((E,), jnp.int32)
            hit_cvx = hit_cvy = hit_vx = hit_vy = jnp.zeros((E,),
                                                            jnp.float32)

        # --- pellets (SPEC M1) -------------------------------------------
        # chunked over Np so VMEM temps stay (E, Cc, CHUNK)
        radc = _radius(cmass)
        PCHUNK = 128
        n_chunks = (Np + PCHUNK - 1) // PCHUNK
        # pad pellet arrays to a chunk multiple (padding is never eligible)
        pad = n_chunks * PCHUNK - Np
        if pad:
            px_p = jnp.concatenate(
                [px, jnp.zeros((E, pad), px.dtype)], axis=1)
            py_p = jnp.concatenate(
                [py, jnp.zeros((E, pad), py.dtype)], axis=1)
            pal_p = jnp.concatenate(
                [palive, jnp.zeros((E, pad), bool)], axis=1)
        else:
            px_p, py_p, pal_p = px, py, palive

        def chunk_elig(k):
            cpx = jax.lax.dynamic_slice(px_p, (0, k * PCHUNK), (E, PCHUNK))
            cpy = jax.lax.dynamic_slice(py_p, (0, k * PCHUNK), (E, PCHUNK))
            cpa = jax.lax.dynamic_slice(pal_p, (0, k * PCHUNK), (E, PCHUNK))
            pdx = cx[:, :, None] - cpx[:, None, :]
            pdy = cy[:, :, None] - cpy[:, None, :]
            pd2 = pdx * pdx + pdy * pdy
            return (calive[:, :, None] & cpa[:, None, :]
                    & ((radc * radc)[:, :, None] >= pd2))   # (E, Cc, PCHUNK)

        def pmin_body(k, pmin_p):
            elig = chunk_elig(k)
            pkey = jnp.where(elig, rank[:, :, None], _BIG_I)
            cmin = jnp.min(pkey, axis=1)                    # (E, PCHUNK)
            return jax.lax.dynamic_update_slice(
                pmin_p, cmin, (0, k * PCHUNK))

        pmin_p = jax.lax.fori_loop(
            0, n_chunks, pmin_body,
            jnp.full((E, n_chunks * PCHUNK), _BIG_I, jnp.int32))

        def count_body(k, eaten_pc):
            elig = chunk_elig(k)
            cmin = jax.lax.dynamic_slice(pmin_p, (0, k * PCHUNK),
                                         (E, PCHUNK))
            win = elig & (rank[:, :, None] == cmin[:, None, :])
            return eaten_pc + jnp.sum(win, axis=2).astype(jnp.int32)

        eaten_pc = jax.lax.fori_loop(
            0, n_chunks, count_body, jnp.zeros((E, Cc), jnp.int32))
        pmin = jax.lax.slice(pmin_p, (0, 0), (E, Np))
        palive = palive & (pmin == _BIG_I)
        cmass = cmass + eaten_pc * C.PELLET_MASS
        food_eaten = food_eaten_in + jnp.sum(eaten_pc, axis=1)
        pm_now = jnp.sum(jnp.where(calive, cmass, 0), axis=1)
        highest = jnp.maximum(highest_in, pm_now)

        # --- auto-split --------------------------------------------------
        over = calive & (cmass >= C.MAX_MASS_IN_THE_GAME)
        may = (n_start < C.PLAYER_CELL_LIMIT)[:, None]
        do_aspl = over & may
        clampm = over & ~may
        a_rem, a_nf = _split_cells(cx, cy, cmass, tx, ty, elapsed, W, H)
        cmass = jnp.where(do_aspl, a_rem,
                          jnp.where(clampm, C.NEW_MASS_IF_NO_SPLIT, cmass))
        crecomb = jnp.where(do_aspl, (elapsed + C.RECOMBINE_TICKS)[:, None],
                            crecomb)
        n_auto = jnp.sum(do_aspl, axis=1).astype(jnp.int32)

        # --- foods eaten -------------------------------------------------
        if Nf > 0:
            rf = _radius(np.float32(C.FOOD_MASS))
            radc2 = _radius(cmass)
            fdx = cx[:, :, None] - fx[:, None, :]
            fdy = cy[:, :, None] - fy[:, None, :]
            fd2 = fdx * fdx + fdy * fdy
            rm2 = jnp.maximum(radc2[:, :, None], rf)
            can_f = cmass[:, :, None] > np.int32(
                C.FOOD_MASS * C.CELL_EAT_MARGIN)
            felig = (calive[:, :, None] & falive[:, None, :] & can_f
                     & (rm2 * rm2 >= fd2))
            fkey = jnp.where(felig, rank[:, :, None], _BIG_I)
            fmin = jnp.min(fkey, axis=1)
            fwin = felig & (fkey == fmin[:, None, :])
            eaten_fc = jnp.sum(fwin, axis=2).astype(jnp.int32)
            falive = falive & (fmin == _BIG_I)
            cmass = cmass + eaten_fc * C.FOOD_MASS
            food_eaten = food_eaten + jnp.sum(eaten_fc, axis=1)

        # --- feed emission ----------------------------------------------
        feed_cd = jnp.maximum(feed_cd_in - 1, 0)
        do_feed = (action_eff == 1) & (feed_cd == 0)
        emit = (calive & do_feed[:, None]
                & (cmass >= C.CELL_MIN_SIZE + C.FOOD_MASS))
        if Nf > 0:
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
            eord = jnp.sum((ekey[:, :, None] > ekey[:, None, :])
                           & emit[:, None, :], axis=2).astype(jnp.int32)
            slot = (fnext[:, None] + eord) % Nf
            oh = emit[:, :, None] & (slot[:, :, None]
                                     == jax.lax.broadcasted_iota(
                                         jnp.int32, (1, 1, Nf), 2))
            wrote = jnp.any(oh, axis=1)                      # (E, Nf)
            ohf = oh.astype(jnp.float32)
            fx = jnp.where(wrote, jnp.sum(elx[:, :, None] * ohf, axis=1), fx)
            fy = jnp.where(wrote, jnp.sum(ely[:, :, None] * ohf, axis=1), fy)
            fvx = jnp.where(wrote, jnp.sum(evx[:, :, None] * ohf, axis=1),
                            fvx)
            fvy = jnp.where(wrote, jnp.sum(evy[:, :, None] * ohf, axis=1),
                            fvy)
            falive = falive | wrote
            fnext = fnext + jnp.sum(emit, axis=1).astype(jnp.int32)
            cmass = jnp.where(emit, cmass - C.FOOD_MASS, cmass)
        feed_cd = jnp.where(do_feed, C.FEED_COOLDOWN, feed_cd)
        feed_cd = jnp.where(palive_p, feed_cd, feed_cd_in)

        # --- split -------------------------------------------------------
        split_cd = jnp.maximum(split_cd_in - 1, 0)
        do_split = (action_eff == 2) & (split_cd == 0)
        limit = jnp.maximum(C.PLAYER_CELL_LIMIT - n_start - num_new - n_auto,
                            0)
        s_elig = calive & (cmass >= C.CELL_SPLIT_MINIMUM) & do_split[:, None]
        skey = jnp.where(s_elig, rank, _BIG_I)
        sord = jnp.sum((skey[:, :, None] > skey[:, None, :])
                       & s_elig[:, None, :], axis=2).astype(jnp.int32)
        chosen = s_elig & (sord < limit[:, None])
        s_rem, s_nf = _split_cells(cx, cy, cmass, tx, ty, elapsed, W, H)
        cmass = jnp.where(chosen, s_rem, cmass)
        crecomb = jnp.where(chosen, (elapsed + C.RECOMBINE_TICKS)[:, None],
                            crecomb)
        split_cd = jnp.where(do_split, C.SPLIT_COOLDOWN, split_cd)
        split_cd = jnp.where(palive_p, split_cd, split_cd_in)

        # --- place created cells (disrupt pops, auto-splits, splits) -----
        # disrupt pop candidates: up to PLAYER_CELL_LIMIT per env
        K = C.PLAYER_CELL_LIMIT
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        d_mask = disr[:, None] & (kk < num_new[:, None])
        theta = _direction(hit_cvx, hit_cvy)
        nnf = jnp.maximum(num_new, 1).astype(jnp.float32)
        angk = theta[:, None] + (theta[:, None]
                                 + 2.0 * jnp.pi * kk.astype(jnp.float32)
                                 / nnf[:, None])
        pop_speed = _max_speed(np.float32(C.CELL_POP_SIZE))
        d_mass = jnp.maximum(jnp.minimum(
            pop_mass[:, None] - C.CELL_POP_SIZE * kk, C.CELL_POP_SIZE), 1)

        # assemble candidate list: [disrupt K] + [auto Cc] + [split Cc]
        def cat(*parts):
            return jnp.concatenate(parts, axis=1)

        NEWK = K + 2 * Cc
        cand_mask = cat(d_mask, do_aspl, chosen)
        # creation order: disrupts (kk), then autos, then splits; orders are
        # disjoint blocks so offset by counts
        a_ord = jnp.sum((jnp.where(do_aspl, rank, _BIG_I)[:, :, None]
                         > jnp.where(do_aspl, rank, _BIG_I)[:, None, :])
                        & do_aspl[:, None, :], axis=2).astype(jnp.int32)
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
        cand_svx = cat(jnp.cos(angk) * pop_speed, a_nf["vx"], s_nf["vx"])
        cand_svy = cat(jnp.sin(angk) * pop_speed, a_nf["vy"], s_nf["vy"])
        cand_mass = cat(d_mass, a_nf["mass"], s_nf["mass"])

        free = ~calive
        num_free = jnp.sum(free, axis=1, keepdims=True)
        free_rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
        orderv = jnp.where(cand_mask, cand_order, _BIG_I)
        valid = cand_mask & (orderv < num_free)
        # ids in creation order
        ids = next_id[:, None] + orderv
        next_id = next_id + jnp.sum(valid, axis=1).astype(jnp.int32)
        oh2 = (valid[:, :, None] & free[:, None, :]
               & (free_rank[:, None, :] == orderv[:, :, None]))  # (E,NEWK,Cc)
        claimed = jnp.any(oh2, axis=1)
        oh2f = oh2.astype(jnp.float32)

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
            cmass, calive = carry
            rk = _rank_of(cid, calive)
            can = calive & (elapsed[:, None] >= crecomb)
            radm = _radius(cmass)
            dx = cx[:, None, :] - cx[:, :, None]
            dy = cy[:, None, :] - cy[:, :, None]
            d2 = dx * dx + dy * dy
            rs = radm[:, :, None] + radm[:, None, :]
            lower = rk[:, :, None] < rk[:, None, :]
            elig = (can[:, :, None] & can[:, None, :] & lower
                    & (rs * rs >= d2))
            keyr = jnp.where(elig, rk[:, :, None] * Cc + rk[:, None, :],
                             _BIG_I)
            bst = jnp.min(jnp.min(keyr, axis=2), axis=1)
            has = bst < _BIG_I
            wpair = elig & (keyr == bst[:, None, None])
            wi = jnp.any(wpair, axis=2)
            wj = jnp.any(wpair, axis=1)
            gain = jnp.sum(jnp.where(wj, cmass, 0), axis=1)
            cmass = jnp.where(wi & has[:, None], cmass + gain[:, None],
                              cmass)
            calive = calive & ~(wj & has[:, None])
            return cmass, calive

        cmass, calive = jax.lax.fori_loop(0, Cc // 2, rec_body,
                                          (cmass, calive))

        # --- anti-team + decay -------------------------------------------
        last_decay = last_decay_in
        anti_team = anti_team_in
        if ms.mass_decay:
            due = palive_p & (elapsed % 60 == 0)
            fall_off = elapsed[:, None] - C.ANTI_TEAM_ACTIVATION_TICKS
            expired = vticks < fall_off
            vticks = jnp.where(due[:, None] & expired,
                               np.int32(-(2**30)), vticks)
            n_recent = jnp.sum(vticks != np.int32(-(2**30)), axis=1)
            anti_team = jnp.where(due & (n_recent > 0),
                                  jnp.power(1.1, (n_recent - 1)
                                            .astype(jnp.float32)),
                                  anti_team)
            do_decay = due & (elapsed - last_decay >= C.DECAY_TICKS)
            decayed = jnp.maximum(
                (cmass.astype(jnp.float32)
                 * (1.0 - C.PLAYER_DECAY_RATE * anti_team[:, None]))
                .astype(jnp.int32), C.CELL_MIN_SIZE)
            cmass = jnp.where(do_decay[:, None] & calive, decayed, cmass)
            last_decay = jnp.where(do_decay, elapsed, last_decay)

        # --- foods move + virus feeding ----------------------------------
        if Nf > 0:
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
                coll = (moving[:, :, None] & valive[:, None, :]
                        & (rmv * rmv >= cd2))                # (E, Nf, Nv)
                viota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Nv), 2)
                hitv = jnp.min(jnp.where(coll, viota, _BIG_I), axis=2)
                fhit = hitv < _BIG_I
                hitm = fhit[:, :, None] & (hitv[:, :, None] == viota)
                hcount = jnp.sum(hitm, axis=1).astype(jnp.int32)  # (E, Nv)
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
                dead_rank = jnp.cumsum((~valive).astype(jnp.int32),
                                       axis=1) - 1
                dslot_oh = ((~valive) & (dead_rank == 0)
                            & any_burst[:, None])
                vx_ = jnp.where(dslot_oh, spx[:, None], vx_)
                vy_ = jnp.where(dslot_oh, spy[:, None], vy_)
                vvx = jnp.where(dslot_oh, svx_f[:, None], vvx)
                vvy = jnp.where(dslot_oh, svy_f[:, None], vvy)
                vmass = jnp.where(dslot_oh, C.VIRUS_INITIAL_MASS, vmass)
                vhits = jnp.where(dslot_oh, 0, vhits)
                valive = valive | dslot_oh

        # --- regeneration ------------------------------------------------
        if ms.pellet_regen:
            due_r = (ticks % C.REGEN_PERIOD) == 0
            n_alive = jnp.sum(palive, axis=1).astype(jnp.int32)
            deficit = jnp.maximum(cfg.num_pellets - n_alive, 0)
            dead_order = jnp.cumsum((~palive).astype(jnp.int32), axis=1) - 1
            fill = due_r[:, None] & ~palive & (dead_order < deficit[:, None])
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
                nv_alive = jnp.sum(valive, axis=1).astype(jnp.int32)
                vdef = jnp.maximum(cfg.num_viruses - nv_alive, 0)
                vdead_order = jnp.cumsum((~valive).astype(jnp.int32),
                                         axis=1) - 1
                vfill = (due_r[:, None] & ~valive
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

        # --- writeback (whole-array stores only) -------------------------
        keep = calive
        o_target[...] = target_v
        o_action[...] = action[:, None]
        o_split_cd[...] = split_cd[:, None]
        o_feed_cd[...] = feed_cd[:, None]
        o_elapsed[...] = elapsed[:, None]
        o_last_decay[...] = last_decay[:, None]
        o_anti_team[...] = anti_team[:, None]
        o_vticks[...] = vticks[:, None, :]
        o_vptr[...] = vptr[:, None]
        o_food_eaten[...] = food_eaten[:, None]
        o_highest[...] = highest[:, None]
        o_viruses_eaten[...] = viruses_eaten[:, None]
        o_cpos[...] = jnp.stack(
            [jnp.where(keep, cx, 0.0), jnp.where(keep, cy, 0.0)],
            axis=-1)[:, None]
        o_cvel[...] = jnp.stack(
            [jnp.where(keep, cvx, 0.0), jnp.where(keep, cvy, 0.0)],
            axis=-1)[:, None]
        o_csvel[...] = jnp.stack(
            [jnp.where(keep, svx, 0.0), jnp.where(keep, svy, 0.0)],
            axis=-1)[:, None]
        o_cmass[...] = jnp.where(keep, cmass, 0)[:, None, :]
        o_calive[...] = calive[:, None, :]
        o_cid[...] = cid[:, None, :]
        o_crecomb[...] = crecomb[:, None, :]
        o_next_id[...] = next_id
        o_ppos[...] = jnp.stack([px, py], axis=-1)
        o_palive[...] = palive
        o_vpos[...] = jnp.stack([vx_, vy_], axis=-1)
        o_vvel[...] = jnp.stack([vvx, vvy], axis=-1)
        o_vmass[...] = vmass
        o_vhits[...] = vhits
        o_valive[...] = valive
        o_fpos[...] = jnp.stack([fx, fy], axis=-1)
        o_fvel[...] = jnp.stack([fvx, fvy], axis=-1)
        o_falive[...] = falive
        o_fnext[...] = fnext
        o_ticks[...] = ticks + 1
        o_seed[...] = seed

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


_FIELDS = [
    ("target", "f"), ("action", "i"), ("split_cooldown", "i"),
    ("feed_cooldown", "i"), ("elapsed_ticks", "i"), ("last_decay_tick", "i"),
    ("anti_team_decay", "f"), ("virus_eaten_ticks", "i"),
    ("virus_eaten_ptr", "i"),
    ("food_eaten", "i"), ("highest_mass", "i"),
    ("viruses_eaten", "i"),
    ("cell_pos", "f"), ("cell_vel", "f"), ("cell_split_vel", "f"),
    ("cell_mass", "i"), ("cell_alive", "b"), ("cell_id", "i"),
    ("cell_recombine_at", "i"), ("next_cell_id", "i"),
    ("pellet_pos", "f"), ("pellet_alive", "b"),
    ("virus_pos", "f"), ("virus_vel", "f"), ("virus_mass", "i"),
    ("virus_hits", "i"), ("virus_alive", "b"),
    ("food_pos", "f"), ("food_vel", "f"), ("food_alive", "b"),
    ("food_next", "i"), ("ticks", "i"), ("seed", "u"),
]


def supports(cfg: EnvConfig) -> bool:
    """The fused path covers single-player configs (no bots)."""
    return cfg.num_players == 1


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def fused_engine_tick(cfg: EnvConfig, states: GameState,
                      block_envs: int = 256,
                      interpret: bool = False) -> GameState:
    """One engine tick over a BATCH of envs via the fused kernel.

    states: a vmapped GameState with leading env axis N (N % block_envs == 0,
    or block_envs is clamped to N).
    """
    assert supports(cfg), "fused tick requires num_players == 1"
    N = states.ticks.shape[0]
    E = min(block_envs, N)
    assert N % E == 0, (N, E)

    ins = [getattr(states, name) for name, _ in _FIELDS]
    # per-env scalars: broadcast () leaves to (N,)
    ins = [jnp.broadcast_to(x, (N,) + x.shape[1:]) if x.ndim >= 1 else x
           for x in ins]

    def spec_for(x):
        blk = (E,) + x.shape[1:]
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1))

    in_specs = [spec_for(x) for x in ins]
    out_specs = in_specs
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ins]

    kernel = _make_kernel(cfg)
    outs = pl.pallas_call(
        kernel,
        grid=(N // E,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={i: i for i in range(len(ins))},
        interpret=interpret,
    )(*ins)

    kw = {name: out for (name, _), out in zip(_FIELDS, outs)}
    return states.replace(**kw)
