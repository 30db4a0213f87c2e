"""Order-pinned, mask-parallel eating resolution.

Replaces the reference's sequential mutate-as-you-scan eating
(/root/reference/agario/engine/Engine.hpp:962-1025,1181-1294 and
players_collision at :150-200 with collision_detection.hpp) with order-free
resolutions pinned in SPEC M1-M5: contested prey always goes to the lowest
(pid, cell-rank) eligible eater.

All functions take/return plain arrays (state plumbing lives in tick.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.engine import geometry as G

_BIG_I = jnp.int32(2**30)


def order_key(rank, Cc):
    """(P,Cc) i32 global resolution key: pid * Cc + rank (SPEC M1)."""
    P = rank.shape[0]
    pid = jnp.arange(P, dtype=jnp.int32)[:, None]
    return pid * jnp.int32(Cc) + rank


def eat_pellets(cell_pos, cell_mass, cell_alive, rank, pellet_pos,
                pellet_alive):
    """Pellet eating (Engine.hpp:976-1000) under SPEC M1.

    A pellet is eaten when it lies inside a live cell's radius (`collides_with`
    = center-in-larger-radius, Ball.hpp:31-34; `can_eat` vs mass-1 pellets is
    always true for cells >= 25). Winner = lowest (pid, rank) cell; each win
    is +1 mass (PELLET_MASS).

    Returns (eaten_per_cell (P,Cc) i32, pellet_alive (Np,) bool).
    """
    P, Cc = cell_mass.shape
    rad = G.radius(cell_mass)                                # (P, Cc)
    diff = cell_pos[:, :, None, :] - pellet_pos[None, None, :, :]
    dist2 = (diff[..., 0] * diff[..., 0]
             + diff[..., 1] * diff[..., 1])                    # (P, Cc, Np)
    eligible = (cell_alive[:, :, None] & pellet_alive[None, None, :]
                & (rad[:, :, None] ** 2 >= dist2))
    key = jnp.where(eligible, order_key(rank, Cc)[:, :, None], _BIG_I)
    flat = key.reshape(P * Cc, -1)
    min_key = jnp.min(flat, axis=0)                          # (Np,)
    eaten = min_key < _BIG_I
    winner = eligible & (key == min_key[None, None, :])
    eaten_per_cell = jnp.sum(winner, axis=-1).astype(jnp.int32)
    return eaten_per_cell, pellet_alive & ~eaten


def eat_foods(cell_pos, cell_mass, cell_alive, rank, food_pos, food_alive):
    """Ejected-mass eating (Engine.hpp:1011-1025) under SPEC M5.

    Returns (eaten_per_cell (P,Cc) i32, food_alive (Nf,) bool).
    """
    P, Cc = cell_mass.shape
    rad = G.radius(cell_mass)
    rad_food = G.radius(jnp.float32(C.FOOD_MASS))
    diff = cell_pos[:, :, None, :] - food_pos[None, None, :, :]
    dist2 = (diff[..., 0] * diff[..., 0]
             + diff[..., 1] * diff[..., 1])
    rm = jnp.maximum(rad[:, :, None], rad_food)
    can_eat = cell_mass[:, :, None] > jnp.int32(C.FOOD_MASS * C.CELL_EAT_MARGIN)
    eligible = (cell_alive[:, :, None] & food_alive[None, None, :]
                & can_eat & (rm * rm >= dist2))
    key = jnp.where(eligible, order_key(rank, Cc)[:, :, None], _BIG_I)
    min_key = jnp.min(key.reshape(P * Cc, -1), axis=0)
    eaten = min_key < _BIG_I
    winner = eligible & (key == min_key[None, None, :])
    eaten_per_cell = jnp.sum(winner, axis=-1).astype(jnp.int32)
    return eaten_per_cell, food_alive & ~eaten


def virus_events(cell_pos, cell_mass, cell_alive, rank, virus_pos, virus_mass,
                 virus_alive, can_eat_virus):
    """Virus collision selection (Engine.hpp:1223-1252) under SPEC M2.

    can_eat_virus: (P,) bool — player had >= NUM_CELLS_TO_SPLIT cells at tick
    start (Engine.hpp:508, SPEC Q2).

    Per player, select the eligible (cell, virus) pair minimizing
    (cell rank, virus slot); per virus, only the lowest-pid player's event
    stands. Returns a dict with per-player event info:
      hit (P,) bool, cell_slot (P,) i32, virus_slot (P,) i32,
      virus_mass_gain (P,) i32 (only when eating), disrupt (P,) bool,
      and the updated virus_alive mask.
    """
    P, Cc = cell_mass.shape
    Nv = virus_mass.shape[0]
    rad_c = G.radius(cell_mass)
    rad_v = G.radius(virus_mass)
    diff = cell_pos[:, :, None, :] - virus_pos[None, None, :, :]
    dist2 = (diff[..., 0] * diff[..., 0]
             + diff[..., 1] * diff[..., 1])                    # (P, Cc, Nv)
    rm = jnp.maximum(rad_c[:, :, None], rad_v[None, None, :])
    can_eat = (cell_mass[:, :, None].astype(jnp.float32)
               > virus_mass[None, None, :].astype(jnp.float32) * C.CELL_EAT_MARGIN)
    eligible = (cell_alive[:, :, None] & virus_alive[None, None, :]
                & can_eat & (rm * rm >= dist2))

    # per-player best pair: key = rank * Nv + virus_slot
    vslot = jnp.arange(Nv, dtype=jnp.int32)[None, None, :]
    pair_key = jnp.where(eligible, rank[:, :, None] * jnp.int32(Nv) + vslot,
                         _BIG_I)
    flat = pair_key.reshape(P, Cc * Nv)
    best = jnp.min(flat, axis=-1)                            # (P,)
    hit = best < _BIG_I
    best_cell = jnp.argmin(jnp.min(pair_key, axis=2), axis=1).astype(jnp.int32)
    best_virus = jnp.where(hit, best % jnp.int32(Nv), 0)

    # per-virus: lowest pid wins (SPEC M2)
    pid = jnp.arange(P, dtype=jnp.int32)
    claim = hit[:, None] & (best_virus[:, None] == jnp.arange(Nv)[None, :])
    claim_pid = jnp.where(claim, pid[:, None], _BIG_I)
    win_pid = jnp.min(claim_pid, axis=0)                     # (Nv,)
    won = hit & (win_pid[best_virus] == pid)

    virus_removed = jnp.any(claim & (claim_pid == win_pid[None, :]), axis=0)
    gain = jnp.where(won & can_eat_virus, virus_mass[best_virus], 0)
    return dict(
        hit=won,
        cell_slot=best_cell,
        virus_slot=best_virus,
        mass_gain=gain.astype(jnp.int32),
        disrupt=won & ~can_eat_virus,
        virus_alive=virus_alive & ~virus_removed,
    )


def cross_player_eat(cell_pos, cell_mass, cell_alive, rank):
    """players_collision (Engine.hpp:150-200) under SPEC M3.

    cell i eats cell j iff different pid, both alive, collides_with
    (center-in-larger-radius), mass_i > CELL_EAT_REQUIREMENT and
    mass_i > 1.1*mass_j (Entities.hpp:147-152). Contested prey goes to the
    lowest (pid, rank) eater; gains use snapshot masses; eaten cells may still
    eat this tick (chains).

    Returns (gain_per_cell (P,Cc) i32, eaten (P,Cc) bool,
             eaten_count_per_player (P,) i32 — cells_eaten stat credit).
    """
    P, Cc = cell_mass.shape
    N = P * Cc
    pos = cell_pos.reshape(N, 2)
    mass = cell_mass.reshape(N)
    alive = cell_alive.reshape(N)
    key = order_key(rank, Cc).reshape(N)
    pid = (jnp.arange(N, dtype=jnp.int32) // Cc)

    rad = G.radius(mass)
    diff = pos[None, :, :] - pos[:, None, :]                 # [i, j]
    dist2 = (diff[..., 0] * diff[..., 0]
             + diff[..., 1] * diff[..., 1])
    rm = jnp.maximum(rad[:, None], rad[None, :])
    can_eat = ((mass[:, None] > jnp.int32(C.CELL_EAT_REQUIREMENT))
               & (mass[:, None].astype(jnp.float32)
                  > mass[None, :].astype(jnp.float32) * C.CELL_EAT_MARGIN))
    eligible = (alive[:, None] & alive[None, :]
                & (pid[:, None] != pid[None, :])
                & can_eat & (rm * rm >= dist2))

    eat_key = jnp.where(eligible, key[:, None], _BIG_I)      # [i, j]
    min_key = jnp.min(eat_key, axis=0)                       # per prey j
    eaten = min_key < _BIG_I
    winner = eligible & (eat_key == min_key[None, :])        # [i, j]
    gain = jnp.sum(jnp.where(winner, mass[None, :], 0), axis=1)
    count = jnp.sum(winner, axis=1)

    gain_per_cell = gain.reshape(P, Cc).astype(jnp.int32)
    eaten_pc = eaten.reshape(P, Cc)
    count_pp = jnp.sum(count.reshape(P, Cc), axis=1).astype(jnp.int32)
    return gain_per_cell, eaten_pc, count_pp


def move_foods_and_feed_viruses(food_pos, food_vel, food_alive,
                                virus_pos, virus_vel, virus_mass, virus_hits,
                                virus_alive, arena_w, arena_h, dt, dead_slot,
                                spawn_vel_scale=10.0):
    """move_foods + maybe_hit_virus (Engine.hpp:632-687) under SPEC M4.

    Only moving foods (speed > 0) move/decelerate and can hit viruses. Each
    moving food hits its lowest-slot colliding live virus and is consumed.
    Hits accumulate per virus this tick; a virus whose total reaches
    NUMBER_OF_FOOD_HITS (7) resets (hits=0, mass=100) and launches a new virus
    from its location along the lowest-index hitting food's pre-deceleration
    velocity, advanced dt*10 and boundary-clamped (Engine.hpp:666-677).

    dead_slot: (–) i32 index of a free virus slot for the potential spawn
    (one spawn per tick is supported; multiple same-tick 7th-hit events are
    vanishingly rare and the extra spawns are dropped — documented deviation).

    Returns updated (food_pos, food_vel, food_alive, virus_pos, virus_vel,
    virus_mass, virus_hits, virus_alive).
    """
    Nf = food_alive.shape[0]
    Nv = virus_alive.shape[0]

    moving = food_alive & (G.vec_norm(food_vel) > 0.0)
    pre_vel = food_vel
    new_vel = G.decelerate(food_vel, C.FOOD_DECEL, dt)
    new_pos = food_pos + new_vel * dt
    rad_f = G.radius(jnp.float32(C.FOOD_MASS))
    new_pos = G.boundary_clamp(new_pos, jnp.full((Nf,), rad_f), arena_w,
                               arena_h)
    food_pos = jnp.where(moving[:, None], new_pos, food_pos)
    food_vel = jnp.where(moving[:, None], new_vel, food_vel)

    # food-virus collisions (collides_with: max radius)
    rad_v = G.radius(virus_mass)
    diff = food_pos[:, None, :] - virus_pos[None, :, :]
    dist2 = (diff[..., 0] * diff[..., 0]
             + diff[..., 1] * diff[..., 1])                    # (Nf, Nv)
    rm = jnp.maximum(rad_f, rad_v[None, :])
    collide = moving[:, None] & virus_alive[None, :] & (rm * rm >= dist2)

    vslot = jnp.arange(Nv, dtype=jnp.int32)[None, :]
    hit_virus = jnp.where(collide, vslot, _BIG_I).min(axis=1)  # (Nf,)
    food_hits = hit_virus < _BIG_I
    hit_matrix = food_hits[:, None] & (hit_virus[:, None] == vslot)  # (Nf, Nv)
    hits_count = jnp.sum(hit_matrix, axis=0).astype(jnp.int32)       # (Nv,)

    # Reference: per hit, if hits >= 7 then burst (reset hits=0, mass=100)
    # else hits+1, mass+10. Accumulating k same-tick hits sequentially:
    # burst iff hits + k > 7; afterwards hits = hits + k - 8, mass = 100+10*that.
    new_hits = virus_hits + hits_count
    burst = virus_alive & (new_hits > jnp.int32(C.NUMBER_OF_FOOD_HITS))
    post_hits = jnp.maximum(new_hits - jnp.int32(C.NUMBER_OF_FOOD_HITS + 1), 0)
    virus_hits = jnp.where(burst, post_hits, new_hits)
    virus_mass = jnp.where(
        burst,
        jnp.int32(C.VIRUS_INITIAL_MASS) + post_hits * jnp.int32(C.FOOD_MASS),
        virus_mass + hits_count * jnp.int32(C.FOOD_MASS))
    food_alive = food_alive & ~food_hits

    # spawn one new virus for the lowest-slot bursting virus
    any_burst = jnp.any(burst)
    burst_slot = jnp.argmax(burst).astype(jnp.int32)
    # lowest-index food that hit the bursting virus
    fidx = jnp.arange(Nf, dtype=jnp.int32)
    f_hit_b = food_hits & (hit_virus == burst_slot)
    src_food = jnp.min(jnp.where(f_hit_b, fidx, _BIG_I))
    src_food = jnp.where(src_food < _BIG_I, src_food, 0)
    spawn_vel = pre_vel[src_food]
    spawn_pos = virus_pos[burst_slot] + spawn_vel * (dt * spawn_vel_scale)
    rad_new = G.radius(jnp.float32(C.VIRUS_INITIAL_MASS))
    spawn_pos = G.boundary_clamp(spawn_pos, rad_new, arena_w, arena_h)

    do_spawn = any_burst & (dead_slot >= 0)
    slot_oh = (jnp.arange(Nv) == dead_slot) & do_spawn
    virus_pos = jnp.where(slot_oh[:, None], spawn_pos[None, :], virus_pos)
    virus_vel = jnp.where(slot_oh[:, None], spawn_vel[None, :], virus_vel)
    virus_mass = jnp.where(slot_oh, jnp.int32(C.VIRUS_INITIAL_MASS), virus_mass)
    virus_hits = jnp.where(slot_oh, 0, virus_hits)
    virus_alive = virus_alive | slot_oh

    return (food_pos, food_vel, food_alive, virus_pos, virus_vel, virus_mass,
            virus_hits, virus_alive)
