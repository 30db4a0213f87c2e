"""Cell movement and same-player collision relaxation.

Vectorized over (P players, Cc cell slots); an outer vmap adds the env batch
axis. Reference semantics: move_player (Engine.hpp:609-630),
check_player_self_collisions (Engine.hpp:763-794), prevent_overlap
(Engine.hpp:857-888), elastic_collision_between_balls (Engine.hpp:893-938),
avoid_static_overlap (Engine.hpp:701-749), separate_cells (Engine.hpp:803-848).

The reference runs 5 sequential Gauss-Seidel sweeps over cell pairs; SPEC M6
pins a vectorizable equivalent: 5 Jacobi iterations over a mutual-nearest
matching (each cell pairs with its lowest-rank touching partner; a pair is
active iff the choice is mutual), with the exact per-pair reference math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.engine import geometry as G

_BIG = jnp.int32(2**30)


def move_cells(target, pos, split_vel, mass, alive, arena_w, arena_h, dt):
    """Per-cell movement (Engine.hpp:609-630).

    Order per reference: velocity = 3*(target-pos) clamped to [0, v_max(mass)];
    pos += (vel + split_vel)*dt; split_vel decelerates by 80/s; boundary clamp.

    Returns (pos, vel, split_vel).
    """
    vel = 3.0 * (target[:, None, :] - pos)
    vel = G.clamp_speed(vel, G.max_speed(mass))
    pos = pos + (vel + split_vel) * dt
    split_vel = G.decelerate(split_vel, C.SPLIT_DECELERATION, dt)
    pos = G.boundary_clamp(pos, G.radius(mass), arena_w, arena_h)
    keep = alive[..., None]
    return (jnp.where(keep, pos, 0.0), jnp.where(keep, vel, 0.0),
            jnp.where(keep, split_vel, 0.0))


def _pair_geometry(pos, mass, alive):
    """Pairwise quantities within each player: d[p,i,j] = pos_j - pos_i."""
    diff = pos[:, None, :, :] - pos[:, :, None, :]          # (P, Cc, Cc, 2)
    # elementwise dx*dx + dy*dy (NOT reduce-sum): XLA-CPU contracts this
    # form to fma(dx, dx, dy*dy), which oracle.cpp mirrors with std::fmaf
    # (round-5 parity pin; the reduce form lowers differently)
    dx, dy = diff[..., 0], diff[..., 1]
    dist2 = dx * dx + dy * dy                               # (P, Cc, Cc)
    rad = G.radius(mass)
    rsum = rad[:, :, None] + rad[:, None, :]
    Cc = pos.shape[1]
    not_self = ~jnp.eye(Cc, dtype=bool)[None]
    both = alive[:, :, None] & alive[:, None, :] & not_self
    touch = both & (rsum * rsum >= dist2)
    return diff, dist2, rad, touch


def _mutual_match_matrix(touch, rank):
    """Partner selection (SPEC M6) in gather-free matrix form: pair (i,j) is
    active iff touching and each is the other's lowest-rank touching partner.

    Returns M (P, Cc, Cc) bool — the mutual-match adjacency (symmetric, each
    row/column has at most one True).
    """
    key = jnp.where(touch, rank[:, None, :], _BIG)          # (P, i, j)
    minkey = jnp.min(key, axis=-1, keepdims=True)           # per i
    chose = touch & (key == minkey)                         # A[i,j]
    return chose & jnp.swapaxes(chose, 1, 2)


def _elastic(vel_a, vel_b, mass_a, mass_b, dxy, dist):
    """elastic_collision_between_balls (Engine.hpp:893-938): updates the
    velocity of the smaller-mass cell only (both when equal)."""
    n = dxy / jnp.maximum(dist, 1e-12)[..., None]
    t = jnp.stack([-n[..., 1], n[..., 0]], axis=-1)
    # elementwise dot products (first product fuses; oracle fmaf twin)
    dp_n1 = vel_a[..., 0] * n[..., 0] + vel_a[..., 1] * n[..., 1]
    dp_n2 = vel_b[..., 0] * n[..., 0] + vel_b[..., 1] * n[..., 1]
    dp_t1 = vel_a[..., 0] * t[..., 0] + vel_a[..., 1] * t[..., 1]
    dp_t2 = vel_b[..., 0] * t[..., 0] + vel_b[..., 1] * t[..., 1]
    m1 = mass_a.astype(jnp.float32)
    m2 = mass_b.astype(jnp.float32)
    msum = jnp.maximum(m1 + m2, 1.0)
    v1 = (dp_n1 * (m1 - m2) + 2.0 * m2 * dp_n2) / msum
    v2 = (dp_n2 * (m2 - m1) + 2.0 * m1 * dp_n1) / msum
    new_a = t * dp_t1[..., None] + n * v1[..., None]
    new_b = t * dp_t2[..., None] + n * v2[..., None]
    a_upd = mass_a <= mass_b
    b_upd = mass_a >= mass_b
    vel_a = jnp.where(a_upd[..., None], new_a, vel_a)
    vel_b = jnp.where(b_upd[..., None], new_b, vel_b)
    return vel_a, vel_b


def _l1_ratio(dxy):
    """x_ratio = dx/(|dx|+|dy|), y_ratio = dy/(|dx|+|dy|) (Engine.hpp:716-717)."""
    denom = jnp.sum(jnp.abs(dxy), axis=-1, keepdims=True)
    return dxy / jnp.maximum(denom, 1e-12)


def _avoid_static_overlap(pos_a, vel_a, pos_b, vel_b, rad_a, rad_b,
                          arena_w, arena_h):
    """avoid_static_overlap (Engine.hpp:701-749), pairwise form.

    Pushes the pair apart along the L1-normalized axis by the overlap depth;
    cells pinned at a border move the full depth and zero that velocity
    component (exact float equality check as in the reference, which compares
    post-clamp coordinates)."""
    dxy = pos_b - pos_a
    dist = G.vec_norm(dxy)
    target_dist = rad_a + rad_b
    overlapping = dist <= target_dist
    ratio = _l1_ratio(dxy)
    depth = (target_dist - dist)[..., None]

    def border_scale(pos, rad, vel):
        at_lo = pos == jnp.stack([rad, rad], axis=-1)
        at_hi = pos == jnp.stack([arena_w - rad, arena_h - rad], axis=-1)
        at = at_lo | at_hi
        scale = jnp.where(at, 1.0, 0.5)
        vel = jnp.where(at, 0.0, vel)
        return scale, vel

    scale_a, vel_a2 = border_scale(pos_a, rad_a, vel_a)
    scale_b, vel_b2 = border_scale(pos_b, rad_b, vel_b)
    new_a = pos_a - ratio * depth * scale_a
    new_b = pos_b + ratio * depth * scale_b
    new_a = G.boundary_clamp(new_a, rad_a, arena_w, arena_h)
    new_b = G.boundary_clamp(new_b, rad_b, arena_w, arena_h)
    ow = overlapping[..., None]
    return (jnp.where(ow, new_a, pos_a), jnp.where(ow, vel_a2, vel_a),
            jnp.where(ow, new_b, pos_b), jnp.where(ow, vel_b2, vel_b))


def _separate_cells(pos_a, pos_b, mass_a, mass_b, rad_a, rad_b, target):
    """separate_cells (Engine.hpp:803-848): moves only the smaller cell by the
    full depth, direction decided by the mass/target-distance sign votes."""
    dxy = pos_b - pos_a
    dist = G.vec_norm(dxy)
    target_dist = rad_a + rad_b
    overlapping = dist <= target_dist
    ratio = _l1_ratio(dxy)
    depth = target_dist - dist

    dax, day = (target - pos_a)[..., 0], (target - pos_a)[..., 1]
    dbx, dby = (target - pos_b)[..., 0], (target - pos_b)[..., 1]
    diff_a = dax * dax + day * day
    diff_b = dbx * dbx + dby * dby
    sign1 = jnp.where(mass_a < mass_b, 1, -1)
    sign2 = jnp.where(diff_a >= diff_b, 1, -1)
    sign = jnp.where(sign1 == sign2, sign2, 0).astype(jnp.float32)

    dx, dy = dxy[..., 0], dxy[..., 1]
    # Engine.hpp:833-847 sign table
    move_x = jnp.where(dx >= 0, -1.0, 1.0) * ratio[..., 0] * depth * sign
    move_y = jnp.where(dy >= 0, -1.0, 1.0) * ratio[..., 1] * depth * sign
    move = jnp.stack([move_x, move_y], axis=-1)

    a_is_small = (mass_a < mass_b)[..., None]
    ow = overlapping[..., None]
    new_a = jnp.where(ow & a_is_small, pos_a + move, pos_a)
    new_b = jnp.where(ow & ~a_is_small, pos_b + move, pos_b)
    return new_a, new_b


def _prevent_overlap(pos_a, vel_a, svel_a, mass_a, pos_b, vel_b, svel_b,
                     mass_b, target, arena_w, arena_h, dt):
    """prevent_overlap (Engine.hpp:857-888), exact per-pair sequence:
    move both back one dt, elastic collision (normals from pre-move-back
    positions), move both forward one dt, then a static/separate fallback if
    still touching, then boundary clamp."""
    rad_a, rad_b = G.radius(mass_a), G.radius(mass_b)
    dxy0 = pos_b - pos_a
    dist0 = G.vec_norm(dxy0)

    pos_a = pos_a - (vel_a + svel_a) * dt
    pos_b = pos_b - (vel_b + svel_b) * dt
    vel_a, vel_b = _elastic(vel_a, vel_b, mass_a, mass_b, dxy0, dist0)
    pos_a = pos_a + (vel_a + svel_a) * dt
    pos_b = pos_b + (vel_b + svel_b) * dt

    dxy1 = pos_b - pos_a
    dist2_1 = (dxy1[..., 0] * dxy1[..., 0]
               + dxy1[..., 1] * dxy1[..., 1])
    still = G.touches(rad_a, rad_b, dist2_1)
    near_mass = jnp.abs(mass_a - mass_b) <= 10  # int compare (Engine.hpp:879)

    sa_pos_a, sa_vel_a, sa_pos_b, sa_vel_b = _avoid_static_overlap(
        pos_a, vel_a, pos_b, vel_b, rad_a, rad_b, arena_w, arena_h)
    sc_pos_a, sc_pos_b = _separate_cells(
        pos_a, pos_b, mass_a, mass_b, rad_a, rad_b, target)

    use_static = (still & near_mass)[..., None]
    use_sep = (still & ~near_mass)[..., None]
    pos_a = jnp.where(use_static, sa_pos_a, jnp.where(use_sep, sc_pos_a, pos_a))
    pos_b = jnp.where(use_static, sa_pos_b, jnp.where(use_sep, sc_pos_b, pos_b))
    vel_a = jnp.where(use_static, sa_vel_a, vel_a)
    vel_b = jnp.where(use_static, sa_vel_b, vel_b)

    pos_a = G.boundary_clamp(pos_a, rad_a, arena_w, arena_h)
    pos_b = G.boundary_clamp(pos_b, rad_b, arena_w, arena_h)
    return pos_a, vel_a, pos_b, vel_b


def self_collisions(pos, vel, split_vel, mass, alive, rank, target,
                    arena_w, arena_h, dt):
    """check_player_self_collisions (Engine.hpp:763-794) under SPEC M6.

    5 Jacobi iterations of mutually-matched prevent_overlap, then one
    avoid_static_overlap pass on any remaining matched overlaps.
    """
    P, Cc = mass.shape

    def apply_pairs(pos, vel, pair_fn):
        # Gather-free matrix form: evaluate the pair update for every ordered
        # pair (i as "a", j as "b", rank_i < rank_j) by broadcasting, then
        # select with the mutual-match mask. Each cell is in at most one
        # matched pair, so masked sums recover its update exactly.
        _, _, _, touch = _pair_geometry(pos, mass, alive)
        M = _mutual_match_matrix(touch, rank)
        Mlow = M & (rank[:, :, None] < rank[:, None, :])    # (P, i, j)

        pos_a = pos[:, :, None, :]                          # (P, i, 1, 2)
        vel_a = vel[:, :, None, :]
        svel_a = split_vel[:, :, None, :]
        mass_a = mass[:, :, None]
        pos_b = pos[:, None, :, :]                          # (P, 1, j, 2)
        vel_b = vel[:, None, :, :]
        svel_b = split_vel[:, None, :, :]
        mass_b = mass[:, None, :]
        tgt = target[:, None, None, :]

        new_pa, new_va, new_pb, new_vb = pair_fn(
            pos_a, vel_a, svel_a, mass_a, pos_b, vel_b, svel_b, mass_b, tgt)

        ml = Mlow[..., None].astype(pos.dtype)
        upd_a_pos = jnp.sum(new_pa * ml, axis=2)            # i's a-side update
        upd_a_vel = jnp.sum(new_va * ml, axis=2)
        upd_b_pos = jnp.sum(new_pb * ml, axis=1)            # j's b-side update
        upd_b_vel = jnp.sum(new_vb * ml, axis=1)
        has_a = jnp.any(Mlow, axis=2)[..., None]
        has_b = jnp.any(Mlow, axis=1)[..., None]

        new_pos = jnp.where(has_a, upd_a_pos,
                            jnp.where(has_b, upd_b_pos, pos))
        new_vel = jnp.where(has_a, upd_a_vel,
                            jnp.where(has_b, upd_b_vel, vel))
        return new_pos, new_vel

    def prevent_fn(pa, va, sa, ma, pb, vb, sb, mb, tgt):
        return _prevent_overlap(pa, va, sa, ma, pb, vb, sb, mb, tgt,
                                arena_w, arena_h, dt)

    def static_fn(pa, va, sa, ma, pb, vb, sb, mb, tgt):
        ra, rb = G.radius(ma), G.radius(mb)
        return _avoid_static_overlap(pa, va, pb, vb, ra, rb, arena_w, arena_h)

    def body(_, carry):
        p, v = carry
        return apply_pairs(p, v, prevent_fn)

    pos, vel = jax.lax.fori_loop(0, 5, body, (pos, vel))
    pos, vel = apply_pairs(pos, vel, static_fn)
    keep = alive[..., None]
    return jnp.where(keep, pos, 0.0), jnp.where(keep, vel, 0.0)
