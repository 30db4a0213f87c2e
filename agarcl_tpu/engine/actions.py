"""Player actions: split / feed / auto-split / virus-pop creation, recombining,
mass decay and anti-team — all as masked array transforms.

Reference semantics: maybe_emit_food/emit_foods (Engine.hpp:1027-1054),
maybe_split/cell_split/player_split (Engine.hpp:1056-1107), may_be_auto_split
(Engine.hpp:592-601), disrupt (Engine.hpp:1263-1294), recombine_cells
(Engine.hpp:1160-1179), maybe_activate_anti_team/mass_decay
(Engine.hpp:550-584).

Cell slot allocation follows SPEC M8: new cells take the lowest free slots in
creation order with fresh monotonically-increasing ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.engine import geometry as G

_BIG_I = jnp.int32(2**30)
_EMPTY_TICK = jnp.int32(-(2**30))


# ---------------------------------------------------------------------------
# slot allocation
# ---------------------------------------------------------------------------

def place_new_cells(cells, new, next_cell_id):
    """Insert candidate cells into free slots (SPEC M8).

    cells: dict with pos (P,Cc,2), vel, split_vel, mass (P,Cc), alive, id,
           recombine_at.
    new:   dict with mask (P,K) bool, order (P,K) i32 (creation order within
           player: 0.. for selected, big otherwise), pos (P,K,2), vel,
           split_vel, mass (P,K), recombine_at (P,K).

    Returns (cells, next_cell_id). Candidates beyond the free-slot count are
    dropped in creation order.
    """
    alive = cells["alive"]
    P, Cc = alive.shape
    K = new["mask"].shape[1]

    free = ~alive
    num_free = jnp.sum(free, axis=1, keepdims=True)          # (P,1)
    # rank of each free slot among free slots, ascending slot order
    free_rank = jnp.cumsum(free, axis=1) - 1                 # (P,Cc)

    order = jnp.where(new["mask"], new["order"], _BIG_I)
    valid = new["mask"] & (order < num_free)

    # fresh ids in (pid, creation-order) order
    counts = jnp.sum(valid, axis=1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    ids = next_cell_id + offsets[:, None] + order
    next_cell_id = next_cell_id + jnp.sum(counts).astype(jnp.int32)

    # candidate k claims the free slot whose free-rank equals its order
    onehot = (valid[:, :, None] & free[:, None, :]
              & (free_rank[:, None, :] == order[:, :, None]))  # (P,K,Cc)

    def write(old, vals, is_vec):
        if is_vec:
            w = jnp.sum(onehot[..., None] * vals[:, :, None, :], axis=1)
            claimed = jnp.any(onehot, axis=1)[..., None]
        else:
            w = jnp.sum(jnp.where(onehot, vals[:, :, None], 0), axis=1)
            claimed = jnp.any(onehot, axis=1)
        return jnp.where(claimed, w.astype(old.dtype), old)

    out = dict(cells)
    out["pos"] = write(cells["pos"], new["pos"], True)
    out["vel"] = write(cells["vel"], new["vel"], True)
    out["split_vel"] = write(cells["split_vel"], new["split_vel"], True)
    out["mass"] = write(cells["mass"], jnp.maximum(new["mass"],
                                                   C.CELL_MIN_SIZE), False)
    out["id"] = write(cells["id"], ids, False)
    out["recombine_at"] = write(cells["recombine_at"], new["recombine_at"],
                                False)
    out["alive"] = alive | jnp.any(onehot, axis=1)
    return out, next_cell_id


# ---------------------------------------------------------------------------
# splitting
# ---------------------------------------------------------------------------

def split_fields(pos, mass, target, elapsed, arena_w, arena_h):
    """cell_split (Engine.hpp:1067-1093) field computation.

    Given a splitting cell, returns (remaining_mass, new-cell fields dict).
    Reference order: halve mass first, then geometry uses the *remaining*
    radius; new-cell velocity and splitting velocity are both
    dir * split_speed(split_mass).
    """
    split_mass = mass // 2
    remaining = jnp.maximum(mass - split_mass, C.CELL_MIN_SIZE)
    rad = G.radius(remaining)
    d = G.normed(target - pos)
    loc = pos + d * rad[..., None]
    loc = G.boundary_clamp(loc, rad, arena_w, arena_h)
    vel = d * G.split_speed(split_mass)[..., None]
    recomb = (elapsed + C.RECOMBINE_TICKS)
    return remaining, dict(pos=loc, vel=vel, split_vel=vel, mass=split_mass,
                           recombine_at=recomb)


def auto_split(cells, target, elapsed, n_cells_start, arena_w, arena_h):
    """may_be_auto_split (Engine.hpp:592-601): cells >= 22500 split toward the
    player target when the player's tick-start cell count is below the limit,
    else clamp to 22000. Not bounded by create_limit (reference quirk).

    Returns (cells, new-candidates dict, created_count (P,)).
    """
    P, Cc = cells["mass"].shape
    alive = cells["alive"]
    over = alive & (cells["mass"] >= C.MAX_MASS_IN_THE_GAME)
    may = (n_cells_start < C.PLAYER_CELL_LIMIT)[:, None]
    do_split = over & may
    clamp = over & ~may

    tgt = jnp.broadcast_to(target[:, None, :], cells["pos"].shape)
    el = jnp.broadcast_to(elapsed[:, None], cells["mass"].shape)
    remaining, nf = split_fields(cells["pos"], cells["mass"], tgt, el,
                                 arena_w, arena_h)

    cells = dict(cells)
    cells["mass"] = jnp.where(
        do_split, remaining,
        jnp.where(clamp, jnp.int32(C.NEW_MASS_IF_NO_SPLIT), cells["mass"]))
    cells["recombine_at"] = jnp.where(do_split, el + C.RECOMBINE_TICKS,
                                      cells["recombine_at"])

    order = _selection_order(do_split, _cell_rank(cells["id"], alive))
    new = dict(mask=do_split, order=order, pos=nf["pos"], vel=nf["vel"],
               split_vel=nf["split_vel"], mass=nf["mass"],
               recombine_at=nf["recombine_at"])
    return cells, new, jnp.sum(do_split, axis=1).astype(jnp.int32)


def player_split(cells, target, action, split_cooldown, elapsed, create_limit,
                 arena_w, arena_h):
    """maybe_split + player_split (Engine.hpp:1056-1107).

    Cooldown decrements every tick; on action==split with zero cooldown, the
    first create_limit eligible cells (mass >= 50) split in rank order and the
    cooldown resets to 30 even if nothing split (SPEC Q6/Q7). create_limit is
    clamped to >= 0 (reference would loop past a negative limit).

    Returns (cells, new-candidates, split_cooldown).
    """
    split_cooldown = jnp.maximum(split_cooldown - 1, 0)
    do_act = (action == 2) & (split_cooldown == 0)
    limit = jnp.maximum(create_limit, 0)

    alive = cells["alive"]
    eligible = (alive & (cells["mass"] >= C.CELL_SPLIT_MINIMUM)
                & do_act[:, None])
    rank = _cell_rank(cells["id"], alive)
    order = _selection_order(eligible, rank)
    chosen = eligible & (order < limit[:, None])

    tgt = jnp.broadcast_to(target[:, None, :], cells["pos"].shape)
    el = jnp.broadcast_to(elapsed[:, None], cells["mass"].shape)
    remaining, nf = split_fields(cells["pos"], cells["mass"], tgt, el,
                                 arena_w, arena_h)

    cells = dict(cells)
    cells["mass"] = jnp.where(chosen, remaining, cells["mass"])
    cells["recombine_at"] = jnp.where(chosen, el + C.RECOMBINE_TICKS,
                                      cells["recombine_at"])
    new = dict(mask=chosen, order=order, pos=nf["pos"], vel=nf["vel"],
               split_vel=nf["split_vel"], mass=nf["mass"],
               recombine_at=nf["recombine_at"])
    split_cooldown = jnp.where(do_act, jnp.int32(C.SPLIT_COOLDOWN),
                               split_cooldown)
    return cells, new, split_cooldown


# ---------------------------------------------------------------------------
# virus pop (disrupt)
# ---------------------------------------------------------------------------

def disrupt_candidates(cells, ev, virus_pos, n_cells_start, elapsed):
    """disrupt (Engine.hpp:1263-1294) as a (P, PLAYER_CELL_LIMIT) candidate
    table.

    ev: the event dict from eating.virus_events. Applies the popping cell's
    mass reduction in-place and returns pop-cell candidates. The
    splitting-velocity angle keeps the reference's doubled-direction quirk
    (SPEC Q3).
    """
    P, Cc = cells["mass"].shape
    K = C.PLAYER_CELL_LIMIT
    pidx = jnp.arange(P)
    cslot = ev["cell_slot"]
    do = ev["disrupt"]

    total = cells["mass"][pidx, cslot]                       # (P,)
    cur = jnp.maximum((total.astype(jnp.float32)
                       / C.CELL_POP_REDUCTION).astype(jnp.int32),
                      C.CELL_MIN_SIZE)
    cur = cur + (total - cur) % jnp.int32(C.CELL_POP_SIZE)
    pop_mass = total - cur
    num_new = (pop_mass + C.CELL_POP_SIZE - 1) // C.CELL_POP_SIZE
    create_limit = jnp.maximum(C.PLAYER_CELL_LIMIT - n_cells_start, 0)
    num_new = jnp.where(do, jnp.minimum(num_new, create_limit), 0)

    # popping cell: halved mass + recombine reset
    hit_oh = do[:, None] & (jnp.arange(Cc) == cslot[:, None])
    cells = dict(cells)
    cells["mass"] = jnp.where(hit_oh, cur[:, None], cells["mass"])
    cells["recombine_at"] = jnp.where(
        hit_oh, (elapsed + C.RECOMBINE_TICKS)[:, None], cells["recombine_at"])

    cell_vel = cells["vel"][pidx, cslot]                     # (P,2)
    theta = G.direction(cell_vel)                            # (P,)
    k = jnp.arange(K, dtype=jnp.float32)[None, :]            # (1,K)
    nn = jnp.maximum(num_new, 1).astype(jnp.float32)[:, None]
    ang = theta[:, None] + (theta[:, None] + 2.0 * jnp.pi * k / nn)
    pop_speed = G.max_speed(jnp.float32(C.CELL_POP_SIZE))
    svel = jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1) * pop_speed

    kk = jnp.arange(K, dtype=jnp.int32)[None, :]
    mass_k = jnp.minimum(pop_mass[:, None] - C.CELL_POP_SIZE * kk,
                         C.CELL_POP_SIZE)
    mask = do[:, None] & (kk < num_new[:, None])
    vpos = virus_pos[ev["virus_slot"]]                       # (P,2)

    new = dict(
        mask=mask,
        order=jnp.where(mask, kk, _BIG_I),
        pos=jnp.broadcast_to(vpos[:, None, :], (P, K, 2)),
        vel=jnp.broadcast_to(cell_vel[:, None, :], (P, K, 2)),
        split_vel=svel,
        mass=jnp.maximum(mass_k, 1),
        recombine_at=jnp.broadcast_to((elapsed + C.RECOMBINE_TICKS)[:, None],
                                      (P, K)),
    )
    return cells, new, num_new


# ---------------------------------------------------------------------------
# feeding (ejected mass)
# ---------------------------------------------------------------------------

def emit_foods(cells, target, action, feed_cooldown, food_pos, food_vel,
               food_alive, food_next, rank):
    """maybe_emit_food + emit_foods (Engine.hpp:1027-1054).

    Each sufficiently large cell (mass >= 35) of a feeding player ejects one
    10-mass food at its rim toward the target at speed 100, losing 10 mass.
    Foods land in ring-buffer slots in (pid, rank) order (SPEC Q14).
    """
    P, Cc = cells["mass"].shape
    Nf = food_alive.shape[0]
    feed_cooldown = jnp.maximum(feed_cooldown - 1, 0)
    do_act = (action == 1) & (feed_cooldown == 0)

    emit = (cells["alive"] & do_act[:, None]
            & (cells["mass"] >= C.CELL_MIN_SIZE + C.FOOD_MASS))
    d = G.normed(target[:, None, :] - cells["pos"])
    loc = cells["pos"] + d * G.radius(cells["mass"])[..., None]
    vel = d * C.FOOD_SPEED

    # global creation order by (pid, rank)
    key = (jnp.arange(P, dtype=jnp.int32)[:, None] * Cc + rank).reshape(-1)
    m = emit.reshape(-1)
    cnt_before = jnp.sum(m[None, :] & (key[None, :] < key[:, None]), axis=1)
    gorder = jnp.where(m, cnt_before, _BIG_I)
    slot = (food_next + gorder) % jnp.int32(Nf)

    # one-hot write, later order wins on (theoretical) slot collisions
    oh = m[:, None] & (slot[:, None] == jnp.arange(Nf, dtype=jnp.int32))
    prio = jnp.where(oh, gorder[:, None] + 1, 0)
    winner = jnp.argmax(prio, axis=0)
    written = jnp.any(oh, axis=0)
    loc_f = loc.reshape(-1, 2)
    vel_f = vel.reshape(-1, 2)
    food_pos = jnp.where(written[:, None], loc_f[winner], food_pos)
    food_vel = jnp.where(written[:, None], vel_f[winner], food_vel)
    food_alive = food_alive | written
    food_next = food_next + jnp.sum(m).astype(jnp.int32)

    cells = dict(cells)
    cells["mass"] = jnp.where(emit, cells["mass"] - C.FOOD_MASS,
                              cells["mass"])
    feed_cooldown = jnp.where(do_act, jnp.int32(C.FEED_COOLDOWN),
                              feed_cooldown)
    return cells, food_pos, food_vel, food_alive, food_next, feed_cooldown


# ---------------------------------------------------------------------------
# recombining
# ---------------------------------------------------------------------------

def recombine(cells, elapsed):
    """recombine_cells (Engine.hpp:1160-1179) under SPEC M7.

    Repeatedly merges, per player, the lowest-(rank_i, rank_j) touching pair
    whose recombine timers have both expired, into the lower-rank cell, until
    fixed point.
    """
    P, Cc = cells["mass"].shape

    def eligible_pairs(mass, alive, recomb):
        can = alive & (elapsed[:, None] >= recomb)
        rank = _cell_rank(cells["id"], alive)
        rad = G.radius(mass)
        diff = cells["pos"][:, None, :, :] - cells["pos"][:, :, None, :]
        dist2 = jnp.sum(diff * diff, axis=-1)
        rsum = rad[:, :, None] + rad[:, None, :]
        rsum_e = rsum + C.RECOMBINE_TOUCH_EPS
        touch = rsum_e * rsum_e >= dist2
        lower = rank[:, :, None] < rank[:, None, :]
        elig = can[:, :, None] & can[:, None, :] & touch & lower
        key = jnp.where(elig, rank[:, :, None] * Cc + rank[:, None, :], _BIG_I)
        return elig, key

    def cond(carry):
        mass, alive, recomb, it = carry
        elig, _ = eligible_pairs(mass, alive, recomb)
        return jnp.any(elig) & (it < Cc)

    def body(carry):
        mass, alive, recomb, it = carry
        elig, key = eligible_pairs(mass, alive, recomb)
        flatk = key.reshape(P, Cc * Cc)
        best = jnp.min(flatk, axis=1)                        # (P,)
        has = best < _BIG_I
        bidx = jnp.argmin(flatk, axis=1)
        bi = (bidx // Cc).astype(jnp.int32)
        bj = (bidx % Cc).astype(jnp.int32)
        iota = jnp.arange(Cc, dtype=jnp.int32)[None, :]
        oh_i = has[:, None] & (iota == bi[:, None])
        oh_j = has[:, None] & (iota == bj[:, None])
        pidx = jnp.arange(P)
        gain = jnp.where(has, mass[pidx, bj], 0)
        mass = jnp.where(oh_i, mass + gain[:, None], mass)
        alive = alive & ~oh_j
        return mass, alive, recomb, it + 1

    mass, alive, recomb, _ = jax.lax.while_loop(
        cond, body,
        (cells["mass"], cells["alive"], cells["recombine_at"], jnp.int32(0)))
    cells = dict(cells)
    cells["mass"], cells["alive"] = mass, alive
    return cells


# ---------------------------------------------------------------------------
# decay / anti-team
# ---------------------------------------------------------------------------

def decay_and_anti_team(cells, elapsed, last_decay, anti_team,
                        virus_ticks, player_alive):
    """Engine.hpp:536-584: every 60 player ticks, expire old virus-eat events,
    refresh anti_team = 1.1^(n-1) when n > 0 (a stale value persists when the
    window empties — reference early-returns), then decay every cell by
    (1 - 0.002*anti_team), floored at 25 (truncating like the uint cast).
    """
    due = player_alive & (elapsed % 60 == 0)
    fall_off = elapsed[:, None] - C.ANTI_TEAM_ACTIVATION_TICKS
    expired = virus_ticks < fall_off
    virus_ticks = jnp.where(due[:, None] & expired, _EMPTY_TICK, virus_ticks)
    n = jnp.sum(virus_ticks != _EMPTY_TICK, axis=1)
    anti_team = jnp.where(due & (n > 0),
                          jnp.power(1.1, (n - 1).astype(jnp.float32)),
                          anti_team)

    do_decay = due & (elapsed - last_decay >= C.DECAY_TICKS)
    decayed = jnp.maximum(
        (cells["mass"].astype(jnp.float32)
         * (1.0 - C.PLAYER_DECAY_RATE * anti_team[:, None])).astype(jnp.int32),
        C.CELL_MIN_SIZE)
    cells = dict(cells)
    cells["mass"] = jnp.where(do_decay[:, None] & cells["alive"], decayed,
                              cells["mass"])
    last_decay = jnp.where(do_decay, elapsed, last_decay)
    return cells, last_decay, anti_team, virus_ticks


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _cell_rank(cell_id, alive):
    key = jnp.where(alive, cell_id, _BIG_I)
    lower = key[:, :, None] > key[:, None, :]
    return jnp.sum(lower, axis=-1).astype(jnp.int32)


def _selection_order(mask, rank):
    """Order of each selected cell among its player's selected cells by rank:
    order[p,c] = #selected cells of p with lower rank; _BIG_I if unselected."""
    sel = mask[:, :, None] & mask[:, None, :]
    lower = rank[:, None, :] < rank[:, :, None]
    cnt = jnp.sum(sel & lower, axis=2).astype(jnp.int32)
    return jnp.where(mask, cnt, _BIG_I)
