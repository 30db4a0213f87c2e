"""Fused single-agent tick: the whole engine tick as ONE Pallas kernel.

Why: the XLA op-graph tick materializes dozens of padded intermediates per
tick — cost analysis shows ~45 GB of HBM traffic per 8192-env step (vs ~70 MB
of true state), capping throughput near 75k env-steps/s/chip. This kernel
keeps each env block's entire state in VMEM across all phases of a tick and
touches HBM exactly twice per block (read state, write state).

Layout — env-in-lanes: every array inside the kernel is (feature..., E) with
the env-block axis E LAST, so the 128-wide vector lanes are always fully
packed by envs (E a multiple of 128). Feature axes (16 cells, pellet chunks,
virus slots) live in sublanes; pairwise tensors are (Ci, Cj, E). The wrapper
feeds transposed (feature, N) arrays so the kernel needs no relayouts. The
earlier (env, feature) orientation padded every 16-wide cell axis to 128
lanes — an 8x VPU/VMEM waste.

Mosaic lowering rules baked in (each was a discovered blocker):
no dynamic_slice (static chunk slices), no cumsum (log-shift prefix sums),
no atan (algebraic cos/sin), no i1 minor-dim inserts / transposes / bitcasts
/ concats (bool work routes through int32 selects; env-last keeps bool
broadcasts on leading dims, which are legal), no uint32->f32 casts (via
int32), and scf.for cannot carry i1 (loop carries are int32).

Scope: the single-agent fast path (num_players == 1 — the BASELINE bench
configs). Multi-player configs use the XLA tick (engine/tick.py). Semantics
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
def _make_kernel(cfg: EnvConfig, phases: int = 99):
    Cc = cfg.max_cells
    Np = cfg.pellet_capacity
    Nv = cfg.virus_capacity
    Nf = cfg.food_capacity
    W, H = cfg.arena_width, cfg.arena_height
    dt = np.float32(cfg.dt)
    ms = cfg.mode_spec

    def clampb(x, y, rad):
        cx_ = jnp.maximum(0.0, jnp.maximum(jnp.minimum(x, W - rad), rad))
        cy_ = jnp.maximum(0.0, jnp.maximum(jnp.minimum(y, H - rad), rad))
        return cx_, cy_

    def rank_of(cid, calive):
        """(Cc, E) counting rank by id among live cells."""
        key = jnp.where(calive, cid, _BIG_I)
        lt = key[None, :, :] < key[:, None, :]   # [i, j, E]: key_j < key_i
        return jnp.sum(_bint(lt), axis=1)

    def split_fields(cx, cy, cmass, tx, ty, elapsed):
        """cell_split fields for every cell, (Cc, E) arrays."""
        split_mass = cmass // 2
        remaining = jnp.maximum(cmass - split_mass, C.CELL_MIN_SIZE)
        radr = _radius(remaining)
        dx = tx - cx
        dy = ty - cy
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
               cx_ref, cy_ref, cvx_ref, cvy_ref, svx_ref, svy_ref,
               cmass_ref, calive_ref, cid_ref, crecomb_ref, next_id_ref,
               px_ref, py_ref, palive_ref,
               vx_ref, vy_ref, vvx_ref, vvy_ref, vmass_ref, vhits_ref,
               valive_ref,
               fx_ref, fy_ref, fvx_ref, fvy_ref, falive_ref, fnext_ref,
               ticks_ref, seed_ref,
               o_tx, o_ty, o_action, o_split_cd, o_feed_cd, o_elapsed,
               o_last_decay, o_anti_team, o_vticks, o_vptr,
               o_food_eaten, o_highest, o_viruses_eaten,
               o_cx, o_cy, o_cvx, o_cvy, o_svx, o_svy,
               o_cmass, o_calive, o_cid, o_crecomb, o_next_id,
               o_px, o_py, o_palive,
               o_vx, o_vy, o_vvx, o_vvy, o_vmass, o_vhits, o_valive,
               o_fx, o_fy, o_fvx, o_fvy, o_falive, o_fnext,
               o_ticks, o_seed):
        E = tx_ref.shape[1]
        tx = tx_ref[...]                     # (1, E)
        ty = ty_ref[...]
        action = action_ref[...]
        split_cd_in = split_cd_ref[...]
        feed_cd_in = feed_cd_ref[...]
        elapsed_in = elapsed_ref[...]
        last_decay_in = last_decay_ref[...]
        anti_team_in = anti_team_ref[...]
        food_eaten_in = food_eaten_ref[...]
        highest_in = highest_ref[...]
        viruses_eaten_in = viruses_eaten_ref[...]
        ticks = ticks_ref[...]
        seed = seed_ref[...]
        vticks = vticks_ref[...]             # (K, E)
        vptr = vptr_ref[...]

        cx = cx_ref[...]                     # (Cc, E)
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

        px = px_ref[...]                     # (Np, E)
        py = py_ref[...]
        palive = palive_ref[...]
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

        palive_p = jnp.max(_bint(calive), axis=0, keepdims=True) > 0  # (1,E)
        action_eff = jnp.where(palive_p, action, 0)
        elapsed = elapsed_in + _bint(palive_p)

        # --- movement (Engine.hpp:609-630) --------------------------------
        nvx = 3.0 * (tx - cx)
        nvy = 3.0 * (ty - cy)
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

        rank = (rank_of(cid, calive) if phases >= 2
                else jnp.zeros((Cc, E), jnp.int32))

        # --- self-collision relaxation (SPEC M6) --------------------------
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

        def separate(pax, pay, pbx, pby, ma, mb, ra, rb):
            dx = pbx - pax
            dy = pby - pay
            d = jnp.sqrt(dx * dx + dy * dy)
            td = ra + rb
            ov = d <= td
            denom = jnp.maximum(jnp.abs(dx) + jnp.abs(dy), 1e-12)
            rx = dx / denom
            ry = dy / denom
            depth = td - d
            txx = tx[None]                      # (1, 1, E)
            tyy = ty[None]
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

        def pair_pass(cx, cy, cvx, cvy, static_only):
            # [i, j, E] pairwise: d = pos_j - pos_i
            dx = cx[None, :, :] - cx[:, None, :]
            dy = cy[None, :, :] - cy[:, None, :]
            d2 = dx * dx + dy * dy
            radc = _radius(cmass)
            rs = radc[:, None, :] + radc[None, :, :]
            eye = (jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc, 1), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (Cc, Cc, 1), 1))
            both = calive[:, None, :] & calive[None, :, :] & ~eye
            touch = both & (rs * rs >= d2)
            key = jnp.where(touch, rank[None, :, :], _BIG_I)
            minkey = jnp.min(key, axis=1, keepdims=True)
            chose = touch & (key == minkey)
            # mutual: chose[i,j] & chose[j,i] — transpose via int32
            chose_t = jnp.swapaxes(_bint(chose), 0, 1) > 0
            M = chose & chose_t
            Mlow = M & (rank[:, None, :] < rank[None, :, :])

            pax, pay = cx[:, None, :], cy[:, None, :]
            pbx, pby = cx[None, :, :], cy[None, :, :]
            vax, vay = cvx[:, None, :], cvy[:, None, :]
            vbx, vby = cvx[None, :, :], cvy[None, :, :]
            sax, say = svx[:, None, :], svy[:, None, :]
            sbx, sby = svx[None, :, :], svy[None, :, :]
            ma = cmass[:, None, :].astype(jnp.float32)
            mb = cmass[None, :, :].astype(jnp.float32)
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
                near = jnp.abs(cmass[:, None, :] - cmass[None, :, :]) <= 10
                s_ax, s_vax, s_ay, s_vay, s_bx, s_vbx, s_by, s_vby = \
                    avoid_static(npax, npay, vax, vay, npbx, npby, vbx,
                                 vby, ra, rb)
                p_ax, p_ay, p_bx, p_by = separate(
                    npax, npay, npbx, npby, ma, mb, ra, rb)
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

        # single-cell fast path: when no env in this block has 2+ live
        # cells, the pairwise relaxation and recombine phases are no-ops —
        # skip them entirely (lax.cond lowers to a real branch in Mosaic).
        n_live = jnp.sum(_bint(calive), axis=0, keepdims=True)    # (1, E)
        any_multi = jnp.max(n_live) >= 2

        if phases >= 2:
            def run_relax(carry):
                def relax_body(_, c):
                    return pair_pass(*c, False)
                c = jax.lax.fori_loop(0, 5, relax_body, carry)
                return pair_pass(*c, True)

            cx, cy, cvx, cvy = jax.lax.cond(
                any_multi, run_relax, lambda c: c, (cx, cy, cvx, cvy))

        # --- virus events (SPEC M2) ---------------------------------------
        n_start = jnp.sum(_bint(calive), axis=0, keepdims=True)   # (1, E)
        viruses_eaten = viruses_eaten_in
        disr = jnp.zeros((1, E), bool)
        num_new = jnp.zeros((1, E), jnp.int32)
        pop_mass = jnp.zeros((1, E), jnp.int32)
        hit_cvx = hit_cvy = hit_vx = hit_vy = jnp.zeros((1, E), jnp.float32)
        if Nv > 0 and phases >= 3:
            radc = _radius(cmass)
            radv = _radius(vmass)
            ddx = cx[:, None, :] - vx_[None, :, :]        # (Cc, Nv, E)
            ddy = cy[:, None, :] - vy_[None, :, :]
            d2 = ddx * ddx + ddy * ddy
            rm = jnp.maximum(radc[:, None, :], radv[None, :, :])
            can = (cmass[:, None, :].astype(jnp.float32)
                   > vmass[None, :, :].astype(jnp.float32) * C.CELL_EAT_MARGIN)
            elig = (calive[:, None, :] & valive[None, :, :] & can
                    & (rm * rm >= d2))
            viota = jax.lax.broadcasted_iota(jnp.int32, (1, Nv, 1), 1)
            pkey = jnp.where(elig, rank[:, None, :] * Nv + viota, _BIG_I)
            best = jnp.min(jnp.min(pkey, axis=1), axis=0,
                           keepdims=True)                 # (1, E)
            hit = best < _BIG_I
            can_eat_virus = n_start >= C.NUM_CELLS_TO_SPLIT
            win_pair = elig & (pkey == best[None])
            win_cell = jnp.max(_bint(win_pair), axis=1) > 0   # (Cc, E)
            win_virus = jnp.max(_bint(win_pair), axis=0) > 0  # (Nv, E)
            vgain = jnp.sum(jnp.where(win_virus, vmass, 0), axis=0,
                            keepdims=True)
            viruses_eaten = viruses_eaten + _bint(hit)
            K_T = vticks.shape[0]
            kiota = jax.lax.broadcasted_iota(jnp.int32, (K_T, 1), 0)
            push_oh = hit & (kiota == vptr % K_T)
            vticks = jnp.where(push_oh, elapsed, vticks)
            vptr = vptr + _bint(hit)
            eat = hit & can_eat_virus
            cmass = jnp.where(win_cell & eat, cmass + vgain, cmass)
            disr = hit & ~can_eat_virus
            total = jnp.sum(jnp.where(win_cell, cmass, 0), axis=0,
                            keepdims=True)
            cur = jnp.maximum((total.astype(jnp.float32)
                               / C.CELL_POP_REDUCTION).astype(jnp.int32),
                              C.CELL_MIN_SIZE)
            cur = cur + (total - cur) % C.CELL_POP_SIZE
            pop_mass = total - cur
            num_new0 = (pop_mass + C.CELL_POP_SIZE - 1) // C.CELL_POP_SIZE
            num_new = jnp.where(
                disr, jnp.minimum(num_new0, jnp.maximum(
                    C.PLAYER_CELL_LIMIT - n_start, 0)), 0)
            cmass = jnp.where(win_cell & disr, cur, cmass)
            crecomb = jnp.where(win_cell & disr,
                                elapsed + C.RECOMBINE_TICKS, crecomb)
            hit_cvx = jnp.sum(jnp.where(win_cell, cvx, 0.0), axis=0,
                              keepdims=True)
            hit_cvy = jnp.sum(jnp.where(win_cell, cvy, 0.0), axis=0,
                              keepdims=True)
            hit_vx = jnp.sum(jnp.where(win_virus, vx_, 0.0), axis=0,
                             keepdims=True)
            hit_vy = jnp.sum(jnp.where(win_virus, vy_, 0.0), axis=0,
                             keepdims=True)
            valive = valive & ~(win_virus & hit)

        # --- pellets (SPEC M1): chunked over Np ---------------------------
        radc = _radius(cmass)
        food_eaten = food_eaten_in
        highest = highest_in
        eaten_pc = jnp.zeros((Cc, E), jnp.int32)
        PCHUNK = 128
        if phases >= 4:
            n_chunks = (Np + PCHUNK - 1) // PCHUNK
            pad = n_chunks * PCHUNK - Np
            pal_int = _bint(palive)
            if pad:
                px_p = jnp.concatenate(
                    [px, jnp.zeros((pad, E), px.dtype)], axis=0)
                py_p = jnp.concatenate(
                    [py, jnp.zeros((pad, E), py.dtype)], axis=0)
                pal_pi = jnp.concatenate(
                    [pal_int, jnp.zeros((pad, E), jnp.int32)], axis=0)
            else:
                px_p, py_p, pal_pi = px, py, pal_int

            def chunk_elig(k):
                cpx = jax.lax.slice_in_dim(px_p, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=0)
                cpy = jax.lax.slice_in_dim(py_p, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=0)
                cpa = jax.lax.slice_in_dim(pal_pi, k * PCHUNK,
                                           (k + 1) * PCHUNK, axis=0)
                # (Cc, PCHUNK, E)
                pdx = cx[:, None, :] - cpx[None, :, :]
                pdy = cy[:, None, :] - cpy[None, :, :]
                pd2 = pdx * pdx + pdy * pdy
                return (calive[:, None, :] & (cpa[None, :, :] > 0)
                        & ((radc * radc)[:, None, :] >= pd2))

            pmins = []
            for k in range(n_chunks):
                elig = chunk_elig(k)
                pkey = jnp.where(elig, rank[:, None, :], _BIG_I)
                pmins.append(jnp.min(pkey, axis=0))       # (PCHUNK, E)
            for k in range(n_chunks):
                elig = chunk_elig(k)
                win = elig & (rank[:, None, :] == pmins[k][None, :, :])
                eaten_pc = eaten_pc + jnp.sum(_bint(win), axis=1)
            pmin = jnp.concatenate(pmins, axis=0)[:Np]
            palive = palive & (pmin == _BIG_I)
            cmass = cmass + eaten_pc * C.PELLET_MASS
            food_eaten = food_eaten_in + jnp.sum(eaten_pc, axis=0,
                                                 keepdims=True)
            pm_now = jnp.sum(jnp.where(calive, cmass, 0), axis=0,
                             keepdims=True)
            highest = jnp.maximum(highest_in, pm_now)

        # --- auto-split + foods + feed + split (phase 5) ------------------
        do_actions = phases >= 5
        if do_actions:
            over = calive & (cmass >= C.MAX_MASS_IN_THE_GAME)
        else:
            over = jnp.zeros_like(calive)
        may = n_start < C.PLAYER_CELL_LIMIT               # (1, E)
        do_aspl = over & may
        clampm = over & ~may
        a_rem, a_nf = split_fields(cx, cy, cmass, tx, ty, elapsed)
        cmass = jnp.where(
            do_aspl, a_rem,
            jnp.where(clampm, C.NEW_MASS_IF_NO_SPLIT, cmass))
        crecomb = jnp.where(do_aspl, elapsed + C.RECOMBINE_TICKS, crecomb)
        n_auto = jnp.sum(_bint(do_aspl), axis=0, keepdims=True)

        if Nf > 0 and do_actions:
            rf = _radius(np.float32(C.FOOD_MASS))
            radc2 = _radius(cmass)
            fdx = cx[:, None, :] - fx[None, :, :]         # (Cc, Nf, E)
            fdy = cy[:, None, :] - fy[None, :, :]
            fd2 = fdx * fdx + fdy * fdy
            rm2 = jnp.maximum(radc2[:, None, :], rf)
            can_f = cmass[:, None, :] > np.int32(
                C.FOOD_MASS * C.CELL_EAT_MARGIN)
            felig = (calive[:, None, :] & falive[None, :, :] & can_f
                     & (rm2 * rm2 >= fd2))
            fkey = jnp.where(felig, rank[:, None, :], _BIG_I)
            fmin = jnp.min(fkey, axis=0)                  # (Nf, E)
            fwin = felig & (fkey == fmin[None, :, :])
            eaten_fc = jnp.sum(_bint(fwin), axis=1)
            falive = falive & (fmin == _BIG_I)
            cmass = cmass + eaten_fc * C.FOOD_MASS
            food_eaten = food_eaten + jnp.sum(eaten_fc, axis=0,
                                              keepdims=True)

        # feed emission
        feed_cd = jnp.maximum(feed_cd_in - 1, 0)
        do_feed = (action_eff == 1) & (feed_cd == 0)
        if not do_actions:
            do_feed = jnp.zeros_like(do_feed)
        emit = (calive & do_feed
                & (cmass >= C.CELL_MIN_SIZE + C.FOOD_MASS))
        if Nf > 0 and do_actions:
            edx = tx - cx
            edy = ty - cy
            en = jnp.maximum(jnp.sqrt(edx * edx + edy * edy), 1e-12)
            edx = edx / en
            edy = edy / en
            elx = cx + edx * radc
            ely = cy + edy * radc
            evx = edx * C.FOOD_SPEED
            evy = edy * C.FOOD_SPEED
            ekey = jnp.where(emit, rank, _BIG_I)
            eord = jnp.sum(_bint((ekey[None, :, :] < ekey[:, None, :])
                                 & emit[None, :, :]), axis=1)
            slot = (fnext + eord) % Nf                    # (Cc, E)
            fiota = jax.lax.broadcasted_iota(jnp.int32, (1, Nf, 1), 1)
            oh = emit[:, None, :] & (slot[:, None, :] == fiota)  # (Cc,Nf,E)
            wrote = jnp.max(_bint(oh), axis=0) > 0        # (Nf, E)
            ohf = jnp.where(oh, 1.0, 0.0)
            fx = jnp.where(wrote, jnp.sum(elx[:, None, :] * ohf, axis=0), fx)
            fy = jnp.where(wrote, jnp.sum(ely[:, None, :] * ohf, axis=0), fy)
            fvx = jnp.where(wrote, jnp.sum(evx[:, None, :] * ohf, axis=0),
                            fvx)
            fvy = jnp.where(wrote, jnp.sum(evy[:, None, :] * ohf, axis=0),
                            fvy)
            falive = falive | wrote
            fnext = fnext + jnp.sum(_bint(emit), axis=0, keepdims=True)
            cmass = jnp.where(emit, cmass - C.FOOD_MASS, cmass)
        feed_cd = jnp.where(do_feed, C.FEED_COOLDOWN, feed_cd)
        feed_cd = jnp.where(palive_p, feed_cd, feed_cd_in)

        # split
        split_cd = jnp.maximum(split_cd_in - 1, 0)
        do_split = (action_eff == 2) & (split_cd == 0)
        if not do_actions:
            do_split = jnp.zeros_like(do_split)
        limit = jnp.maximum(C.PLAYER_CELL_LIMIT - n_start - num_new - n_auto,
                            0)
        s_elig = calive & (cmass >= C.CELL_SPLIT_MINIMUM) & do_split
        skey = jnp.where(s_elig, rank, _BIG_I)
        sord = jnp.sum(_bint((skey[None, :, :] < skey[:, None, :])
                             & s_elig[None, :, :]), axis=1)
        chosen = s_elig & (sord < limit)
        s_rem, s_nf = split_fields(cx, cy, cmass, tx, ty, elapsed)
        cmass = jnp.where(chosen, s_rem, cmass)
        crecomb = jnp.where(chosen, elapsed + C.RECOMBINE_TICKS, crecomb)
        split_cd = jnp.where(do_split, C.SPLIT_COOLDOWN, split_cd)
        split_cd = jnp.where(palive_p, split_cd, split_cd_in)

        # --- place created cells (SPEC M8) --------------------------------
        if phases >= 3:
            K = C.PLAYER_CELL_LIMIT
            kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)   # (K, 1)
            d_mask = disr & (kk < num_new)                # (K, E)
            cth, sth = _dir_cos_sin(hit_cvx, hit_cvy)     # (1, E)
            c2 = cth * cth - sth * sth
            s2 = 2.0 * cth * sth
            nnf = jnp.maximum(num_new, 1).astype(jnp.float32)
            phik = 2.0 * jnp.pi * kk.astype(jnp.float32) / nnf
            cphi = jnp.cos(phik)
            sphi = jnp.sin(phik)
            cos_ang = c2 * cphi - s2 * sphi               # (K, E)
            sin_ang = s2 * cphi + c2 * sphi
            pop_speed = _max_speed(np.float32(C.CELL_POP_SIZE))
            d_mass = jnp.maximum(jnp.minimum(
                pop_mass - C.CELL_POP_SIZE * kk, C.CELL_POP_SIZE), 1)

            def cat(*parts):
                return jnp.concatenate(parts, axis=0)

            a_ordkey = jnp.where(do_aspl, rank, _BIG_I)
            a_ord = jnp.sum(_bint((a_ordkey[None, :, :]
                                   < a_ordkey[:, None, :])
                                  & do_aspl[None, :, :]), axis=1)
            cand_mask = cat(_bint(d_mask), _bint(do_aspl),
                            _bint(chosen)) > 0            # (NEWK, E)
            cand_order = cat(
                jnp.where(d_mask, jnp.broadcast_to(kk, (K, E)), _BIG_I),
                jnp.where(do_aspl, num_new + a_ord, _BIG_I),
                jnp.where(chosen, num_new + n_auto + sord, _BIG_I))
            cand_x = cat(jnp.broadcast_to(hit_vx, (K, E)), a_nf["x"],
                         s_nf["x"])
            cand_y = cat(jnp.broadcast_to(hit_vy, (K, E)), a_nf["y"],
                         s_nf["y"])
            cand_vx = cat(jnp.broadcast_to(hit_cvx, (K, E)), a_nf["vx"],
                          s_nf["vx"])
            cand_vy = cat(jnp.broadcast_to(hit_cvy, (K, E)), a_nf["vy"],
                          s_nf["vy"])
            cand_svx = cat(cos_ang * pop_speed, a_nf["vx"], s_nf["vx"])
            cand_svy = cat(sin_ang * pop_speed, a_nf["vy"], s_nf["vy"])
            cand_mass = cat(d_mass, a_nf["mass"], s_nf["mass"])

            free = ~calive
            num_free = jnp.sum(_bint(free), axis=0, keepdims=True)
            free_rank = _cumsum0(_bint(free)) - 1         # (Cc, E)
            orderv = jnp.where(cand_mask, cand_order, _BIG_I)
            valid = cand_mask & (orderv < num_free)
            ids = next_id + orderv
            next_id = next_id + jnp.sum(_bint(valid), axis=0, keepdims=True)
            # (NEWK, Cc, E) one-hot: candidate claims matching free-rank slot
            oh2 = (valid[:, None, :] & free[None, :, :]
                   & (free_rank[None, :, :] == orderv[:, None, :]))
            claimed = jnp.max(_bint(oh2), axis=0) > 0     # (Cc, E)
            oh2f = jnp.where(oh2, 1.0, 0.0)

            def wr_f(old, vals):
                return jnp.where(claimed,
                                 jnp.sum(vals[:, None, :] * oh2f, axis=0),
                                 old)

            def wr_i(old, vals):
                return jnp.where(claimed,
                                 jnp.sum(jnp.where(oh2, vals[:, None, :], 0),
                                         axis=0), old)

            cx = wr_f(cx, cand_x)
            cy = wr_f(cy, cand_y)
            cvx = wr_f(cvx, cand_vx)
            cvy = wr_f(cvy, cand_vy)
            svx = wr_f(svx, cand_svx)
            svy = wr_f(svy, cand_svy)
            cmass = wr_i(cmass, jnp.maximum(cand_mass, C.CELL_MIN_SIZE))
            cid = wr_i(cid, ids)
            crecomb = jnp.where(claimed, elapsed + C.RECOMBINE_TICKS,
                                crecomb)
            calive = calive | claimed

        # --- recombine (SPEC M7) ------------------------------------------
        def rec_body(_, carry):
            cmass, calive_i = carry
            calive2 = calive_i > 0
            rk = rank_of(cid, calive2)
            can2 = calive2 & (elapsed >= crecomb)
            radm = _radius(cmass)
            dx = cx[None, :, :] - cx[:, None, :]
            dy = cy[None, :, :] - cy[:, None, :]
            d2 = dx * dx + dy * dy
            rs = radm[:, None, :] + radm[None, :, :]
            lw = rk[:, None, :] < rk[None, :, :]
            elig = (can2[:, None, :] & can2[None, :, :] & lw
                    & (rs * rs >= d2))
            keyr = jnp.where(elig, rk[:, None, :] * Cc + rk[None, :, :],
                             _BIG_I)
            bst = jnp.min(jnp.min(keyr, axis=1), axis=0, keepdims=True)
            has = bst < _BIG_I
            wpair = elig & (keyr == bst[None])
            wi = jnp.max(_bint(wpair), axis=1) > 0
            wj = jnp.max(_bint(wpair), axis=0) > 0
            gain = jnp.sum(jnp.where(wj, cmass, 0), axis=0, keepdims=True)
            cmass = jnp.where(wi & has, cmass + gain, cmass)
            calive2 = calive2 & ~(wj & has)
            return cmass, _bint(calive2)

        if phases >= 6:
            # skip when nothing can merge anywhere in the block
            rec_count = jnp.sum(_bint(calive & (elapsed >= crecomb)),
                                axis=0, keepdims=True)
            rec_possible = jnp.max(rec_count) >= 2

            def run_rec(carry):
                return jax.lax.fori_loop(0, Cc // 2, rec_body, carry)

            cmass, calive_i = jax.lax.cond(
                rec_possible, run_rec, lambda c: c, (cmass, _bint(calive)))
            calive = calive_i > 0

        # --- anti-team + decay --------------------------------------------
        last_decay = last_decay_in
        anti_team = anti_team_in
        if ms.mass_decay and phases >= 7:
            due = palive_p & (elapsed % 60 == 0)
            fall_off = elapsed - C.ANTI_TEAM_ACTIVATION_TICKS
            expired = vticks < fall_off
            vticks = jnp.where(due & expired, np.int32(-(2**30)), vticks)
            n_recent = jnp.sum(_bint(vticks != np.int32(-(2**30))), axis=0,
                               keepdims=True)
            anti_team = jnp.where(due & (n_recent > 0),
                                  jnp.power(1.1, (n_recent - 1)
                                            .astype(jnp.float32)),
                                  anti_team)
            do_decay = due & (elapsed - last_decay >= C.DECAY_TICKS)
            decayed = jnp.maximum(
                (cmass.astype(jnp.float32)
                 * (1.0 - C.PLAYER_DECAY_RATE * anti_team))
                .astype(jnp.int32), C.CELL_MIN_SIZE)
            cmass = jnp.where(do_decay & calive, decayed, cmass)
            last_decay = jnp.where(do_decay, elapsed, last_decay)

        # --- foods move + virus feeding (SPEC M4) -------------------------
        if Nf > 0 and phases >= 8:
            moving = falive & ((fvx != 0.0) | (fvy != 0.0))
            pfvx, pfvy = fvx, fvy
            nfvx, nfvy = _decel(fvx, fvy, C.FOOD_DECEL, dt)
            rf = _radius(np.float32(C.FOOD_MASS))
            nfx = fx + nfvx * dt
            nfy = fy + nfvy * dt
            nfx, nfy = clampb(nfx, nfy, rf)
            fx = jnp.where(moving, nfx, fx)
            fy = jnp.where(moving, nfy, fy)
            fvx = jnp.where(moving, nfvx, fvx)
            fvy = jnp.where(moving, nfvy, fvy)
            if Nv > 0:
                radv2 = _radius(vmass)
                cdx = fx[:, None, :] - vx_[None, :, :]    # (Nf, Nv, E)
                cdy = fy[:, None, :] - vy_[None, :, :]
                cd2 = cdx * cdx + cdy * cdy
                rmv = jnp.maximum(rf, radv2[None, :, :])
                coll = (moving[:, None, :] & valive[None, :, :]
                        & (rmv * rmv >= cd2))
                viota2 = jax.lax.broadcasted_iota(jnp.int32, (1, Nv, 1), 1)
                hitv = jnp.min(jnp.where(coll, viota2, _BIG_I), axis=1)
                fhit = hitv < _BIG_I                      # (Nf, E)
                hitm = fhit[:, None, :] & (hitv[:, None, :] == viota2)
                hcount = jnp.sum(_bint(hitm), axis=0)     # (Nv, E)
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

        # --- regeneration -------------------------------------------------
        if ms.pellet_regen and phases >= 9:
            due_r = (ticks % C.REGEN_PERIOD) == 0         # (1, E)
            n_alive = jnp.sum(_bint(palive), axis=0, keepdims=True)
            deficit = jnp.maximum(cfg.num_pellets - n_alive, 0)
            dead_order = _cumsum0(_bint(~palive)) - 1
            fill = due_r & ~palive & (dead_order < deficit)
            rp = _radius(np.float32(C.PELLET_MASS))
            piota = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
            nx_ = _uniform(0.0, W - 2 * rp, seed, 1, ticks, piota, 0) + rp
            ny_ = _uniform(0.0, H - 2 * rp, seed, 1, ticks, piota, 1) + rp
            px = jnp.where(fill, nx_, px)
            py = jnp.where(fill, ny_, py)
            palive = palive | fill
            if Nv > 0:
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
        o_cx[...] = jnp.where(calive, cx, 0.0)
        o_cy[...] = jnp.where(calive, cy, 0.0)
        o_cvx[...] = jnp.where(calive, cvx, 0.0)
        o_cvy[...] = jnp.where(calive, cvy, 0.0)
        o_svx[...] = jnp.where(calive, svx, 0.0)
        o_svy[...] = jnp.where(calive, svy, 0.0)
        o_cmass[...] = jnp.where(calive, cmass, 0)
        o_calive[...] = calive
        o_cid[...] = cid
        o_crecomb[...] = crecomb
        o_next_id[...] = next_id
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
        o_fnext[...] = fnext
        o_ticks[...] = ticks + 1
        o_seed[...] = seed

    return kernel


# ------------------------------------------------------------- wrapper
# (name, kind): "s" = per-env scalar -> (1, N); "p" = per-player (P=1) ->
# (1, N); "pk"/"pc" = (N,1,F) -> (F, N); "v2p" = (N,1,2) -> two (1, N);
# "v2c" = (N,1,F,2) -> two (F, N); "v2" = (N,F,2) -> two (F, N);
# "2d" = (N,F) -> (F, N)
_SPLIT_PLAN = [
    ("target", "v2p"),
    ("action", "p"), ("split_cooldown", "p"), ("feed_cooldown", "p"),
    ("elapsed_ticks", "p"), ("last_decay_tick", "p"),
    ("anti_team_decay", "p"),
    ("virus_eaten_ticks", "pk"), ("virus_eaten_ptr", "p"),
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
    """GameState (batched, P=1) -> flat list of (feature, N) arrays."""
    out = []
    for name, kind in _SPLIT_PLAN:
        x = getattr(states, name)
        if kind == "s":
            out.append(x[None, :])
        elif kind == "p":
            out.append(x.T)                        # (1, N)
        elif kind in ("pk", "pc"):
            out.append(jnp.transpose(x[:, 0, :]))  # (F, N)
        elif kind == "v2p":
            out.append(x[:, 0, 0][None, :])
            out.append(x[:, 0, 1][None, :])
        elif kind == "v2c":
            out.append(jnp.transpose(x[:, 0, :, 0]))
            out.append(jnp.transpose(x[:, 0, :, 1]))
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
    kw = {}
    i = 0
    for name, kind in _SPLIT_PLAN:
        if kind == "s":
            kw[name] = outs[i][0]
            i += 1
        elif kind == "p":
            kw[name] = outs[i].T
            i += 1
        elif kind in ("pk", "pc"):
            kw[name] = jnp.transpose(outs[i])[:, None, :]
            i += 1
        elif kind == "v2p":
            kw[name] = jnp.stack([outs[i][0], outs[i + 1][0]],
                                 axis=-1)[:, None, :]
            i += 2
        elif kind == "v2c":
            kw[name] = jnp.stack([jnp.transpose(outs[i]),
                                  jnp.transpose(outs[i + 1])],
                                 axis=-1)[:, None]
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
    """The fused path covers single-player configs (no bots)."""
    return cfg.num_players == 1


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def fused_engine_tick(cfg: EnvConfig, states: GameState,
                      block_envs: int = 128,
                      interpret: bool = False,
                      phases: int = 99) -> GameState:
    """One engine tick over a BATCH of envs via the fused kernel.

    states: a vmapped GameState with leading env axis N. block_envs should
    be a multiple of 128 (the lane width) that divides N.
    """
    assert supports(cfg), "fused tick requires num_players == 1"
    N = states.ticks.shape[0]
    E = min(block_envs, N)
    assert N % E == 0, (N, E)

    ins = _to_kernel_arrays(states)

    def spec_for(x):
        blk = x.shape[:-1] + (E,)
        nd = x.ndim
        return pl.BlockSpec(blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,))

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
