"""Vectorized scripted-opponent policies.

The four reference bots (/root/reference/agario/bots/) as branchless masked
selects over the (P players, Np pellets) state, evaluated inside the jitted
tick every BOT_ACTION_PERIOD ticks from the start-of-tick snapshot (SPEC Q12).

Bot types: 1=HungryBot (chase nearest pellet), 2=HungryShyBot (flee any player
within 25 — the reference's `mass()` temporary makes the mass test vacuous,
SPEC Q1 — else forage), 3=AggressiveBot (hunt the first player in pid order
within 20 with edible mass, else forage), 4=AggressiveShyBot (flee, else hunt,
else forage).
"""

from __future__ import annotations

import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu import prng
from agarcl_tpu.engine import geometry as G

_BIG = jnp.float32(3.4e38)
_BIG_I = jnp.int32(2**30)


def bot_decide(bot_types, centroid, pmass, palive, cell_pos, cell_mass,
               cell_alive, pellet_pos, pellet_alive, arena_w, arena_h,
               seed, tick):
    """Returns (target (P,2), action (P,), update_mask (P,)).

    bot_types: static (P,) int array (0 = RL agent, untouched).
    """
    P = centroid.shape[0]
    pid = jnp.arange(P, dtype=jnp.int32)
    is_bot = bot_types > 0

    # --- nearest pellet (Bot.hpp:92-129): dist > 0.01, else fallback ---
    d_pel = G.vec_norm(centroid[:, None, :] - pellet_pos[None, :, :])
    ok = pellet_alive[None, :] & (d_pel > 0.01)
    d_masked = jnp.where(ok, d_pel, _BIG)
    nearest = jnp.argmin(d_masked, axis=1)
    has_pellet = jnp.any(ok, axis=1)
    any_pellet = jnp.any(pellet_alive)
    rx = prng.uniform_range(0.0, arena_w, seed, prng.STREAM_BOT, tick, pid, 0)
    ry = prng.uniform_range(0.0, arena_h, seed, prng.STREAM_BOT, tick, pid, 1)
    rand_loc = jnp.stack([jnp.floor(rx), jnp.floor(ry)], axis=-1)
    pellet_target = jnp.where(
        has_pellet[:, None], pellet_pos[nearest],
        jnp.where(any_pellet, jnp.zeros((P, 2)), rand_loc))

    # --- pairwise player geometry ---
    dist = G.vec_norm(centroid[:, None, :] - centroid[None, :, :])  # (P,P)
    other = (pid[:, None] != pid[None, :]) & palive[None, :]

    # --- flee (HungryShyBot.hpp:24-49): any other player within SHY_RADIUS;
    # first in pid order wins; dead players' NaN centroids fail the check ---
    scary = other & (dist < C.SHY_RADIUS) & (pmass[None, :] > 0)
    flee_j = jnp.argmax(scary, axis=1)
    has_flee = jnp.any(scary, axis=1)
    flee_target = 2.0 * centroid - centroid[flee_j]

    # --- hunt (AggressiveBot.hpp:27-55): largest own cell; first player in
    # pid order within AGGRESSIVE_RADIUS with edible mass > 0 ---
    lm = jnp.where(cell_alive, cell_mass, -1)
    big_slot = jnp.argmax(lm, axis=1)                        # first max
    big_mass = jnp.take_along_axis(cell_mass, big_slot[:, None], 1)[:, 0]
    # edible[i, j, c]: largest cell of i can eat cell c of player j
    can = ((big_mass[:, None, None] > C.CELL_EAT_REQUIREMENT)
           & (big_mass[:, None, None].astype(jnp.float32)
              > cell_mass[None].astype(jnp.float32) * C.CELL_EAT_MARGIN)
           & cell_alive[None])
    edible_mass = jnp.sum(jnp.where(can, cell_mass[None], 0), axis=2)  # (P,P)
    near = other & (dist <= C.AGGRESSIVE_RADIUS) & (edible_mass > 0)
    hunt_j = jnp.argmin(jnp.where(near, pid[None, :], _BIG_I), axis=1)
    has_hunt = jnp.any(near, axis=1)
    # target_player (Bot.hpp:56-67): mass-weighted centroid of edible cells
    can_h = jnp.take_along_axis(
        can, hunt_j[:, None, None].repeat(can.shape[2], 2), axis=1)[:, 0]
    w = jnp.where(can_h, cell_mass[hunt_j], 0).astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    prey = jnp.sum(cell_pos[hunt_j] * w[..., None], axis=1) / wsum[:, None]
    hunt_target = centroid + 3.0 * (prey - centroid)

    bt = bot_types
    target = pellet_target
    use_hunt = (((bt == 3) | (bt == 4)) & has_hunt)[:, None]
    use_flee = (((bt == 2) | (bt == 4)) & has_flee)[:, None]
    target = jnp.where(use_hunt, hunt_target, target)
    target = jnp.where(use_flee, flee_target, target)

    update = is_bot & palive
    return target, jnp.zeros((P,), jnp.int32), update
