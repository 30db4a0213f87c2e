"""One engine tick as a pure function of GameState.

Phase order follows Engine::tick + tick_player
(/root/reference/agario/engine/Engine.hpp:208-240,495-542), with the
per-player sequential loop replaced by the simultaneous, order-pinned phase
schedule of SPEC.md:

  1  bot decisions (every BOT_ACTION_PERIOD ticks, start-of-tick snapshot)
  2  elapsed_ticks++ for live players
  3  movement + same-player collision relaxation
  4  virus events (eat / pop)           [Engine.hpp:508-514,1223-1252]
  5  pellet eating + stats              [Engine.hpp:515-518,976-1000]
  6  auto-split; food eating            [Engine.hpp:520-525]
  7  feed emission                      [Engine.hpp:527,1027-1054]
  8  player split                       [Engine.hpp:528,1056-1107]
  9  place created cells (pop, auto-split, split order)
  10 recombine                          [Engine.hpp:534,1160-1179]
  11 anti-team + mass decay             [Engine.hpp:536-584]
  12 cross-player eating                [Engine.hpp:226,150-200]
  13 food movement + virus feeding      [Engine.hpp:228,632-687]
  14 pellet/virus regeneration          [Engine.hpp:230-237]
  15 ticks++

Known phase-order deviation vs the reference's player-sequential loop: foods
emitted this tick cannot be eaten until the next tick (the reference lets a
later-pid player eat an earlier player's same-tick ejection).
"""

from __future__ import annotations

import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.engine import actions as A
from agarcl_tpu.engine import bots as B
from agarcl_tpu.engine import eating as E
from agarcl_tpu.engine import physics as PH
from agarcl_tpu.state import GameState


def engine_tick(cfg: EnvConfig, state: GameState) -> GameState:
    P, Cc = state.cell_mass.shape
    W, H = cfg.arena_width, cfg.arena_height
    dt = jnp.float32(cfg.dt)
    palive = state.player_alive()
    pellet_pos, pellet_alive = state.pellet_xy_alive(cfg)

    # --- 1. bots -----------------------------------------------------------
    target, action = state.target, state.action
    bot_types_t = cfg.bot_types()
    if any(bt > 0 for bt in bot_types_t):
        bt = jnp.asarray(bot_types_t, jnp.int32)
        btgt, bact, bupd = B.bot_decide(
            bt, state.player_centroid(), state.player_mass(), palive,
            state.cell_pos, state.cell_mass, state.cell_alive,
            pellet_pos, pellet_alive, W, H, state.seed,
            state.ticks)
        do = ((state.ticks % C.BOT_ACTION_PERIOD) == 0) & bupd
        target = jnp.where(do[:, None], btgt, target)
        action = jnp.where(do, bact, action)

    # dead players take no actions and tick no cooldowns (tick_player is only
    # called on live players, Engine.hpp:214-217)
    action_eff = jnp.where(palive, action, 0)

    # --- 2. elapsed --------------------------------------------------------
    elapsed = state.elapsed_ticks + palive.astype(jnp.int32)

    # --- 3. movement -------------------------------------------------------
    pos, vel, svel = PH.move_cells(target, state.cell_pos,
                                   state.cell_split_vel, state.cell_mass,
                                   state.cell_alive, W, H, dt)
    rank = state.cell_rank()
    pos, vel = PH.self_collisions(pos, vel, svel, state.cell_mass,
                                  state.cell_alive, rank, target, W, H, dt)

    cells = dict(pos=pos, vel=vel, split_vel=svel, mass=state.cell_mass,
                 alive=state.cell_alive, id=state.cell_id,
                 recombine_at=state.cell_recombine_at)

    # --- 4. virus events ---------------------------------------------------
    n_start = jnp.sum(cells["alive"], axis=1).astype(jnp.int32)
    can_eat_virus = n_start >= C.NUM_CELLS_TO_SPLIT  # SPEC Q2
    ev = E.virus_events(cells["pos"], cells["mass"], cells["alive"], rank,
                        state.virus_pos, state.virus_mass, state.virus_alive,
                        can_eat_virus)
    virus_alive = ev["virus_alive"]
    eat_oh = (ev["hit"] & ~ev["disrupt"])[:, None] & (
        jnp.arange(Cc) == ev["cell_slot"][:, None])
    cells["mass"] = cells["mass"] + jnp.where(eat_oh, ev["mass_gain"][:, None],
                                              0)
    viruses_eaten = state.viruses_eaten + ev["hit"].astype(jnp.int32)
    # ring-buffer push of the eat tick (Engine.hpp:512)
    K = state.virus_eaten_ticks.shape[1]
    push_slot = state.virus_eaten_ptr % K
    push_oh = ev["hit"][:, None] & (jnp.arange(K) == push_slot[:, None])
    virus_ticks = jnp.where(push_oh, elapsed[:, None],
                            state.virus_eaten_ticks)
    virus_ptr = state.virus_eaten_ptr + ev["hit"].astype(jnp.int32)

    cells, new_disrupt, n_disrupt = A.disrupt_candidates(
        cells, ev, state.virus_pos, n_start, elapsed)

    # --- 5. pellets --------------------------------------------------------
    eaten_pc, pellet_alive = E.eat_pellets(cells["pos"], cells["mass"],
                                           cells["alive"], rank,
                                           pellet_pos, pellet_alive)
    pellet_key = jnp.where(pellet_alive, state.pellet_key,
                           jnp.int32(-1))
    cells["mass"] = cells["mass"] + eaten_pc * C.PELLET_MASS
    food_eaten = state.food_eaten + jnp.sum(eaten_pc, axis=1)
    pmass_now = jnp.sum(jnp.where(cells["alive"], cells["mass"], 0), axis=1)
    highest_mass = jnp.maximum(state.highest_mass, pmass_now)

    # --- 6. auto-split + food eating --------------------------------------
    cells, new_auto, n_auto = A.auto_split(cells, target, elapsed, n_start,
                                           W, H)
    eaten_fc, food_alive = E.eat_foods(cells["pos"], cells["mass"],
                                       cells["alive"], rank, state.food_pos,
                                       state.food_alive)
    cells["mass"] = cells["mass"] + eaten_fc * C.FOOD_MASS
    food_eaten = food_eaten + jnp.sum(eaten_fc, axis=1)

    # --- 7. feed emission --------------------------------------------------
    (cells, food_pos, food_vel, food_alive, food_next,
     feed_cd) = A.emit_foods(cells, target, action_eff, state.feed_cooldown,
                             state.food_pos, food_vel=state.food_vel,
                             food_alive=food_alive,
                             food_next=state.food_next, rank=rank)
    feed_cd = jnp.where(palive, feed_cd, state.feed_cooldown)

    # --- 8. split ----------------------------------------------------------
    create_limit2 = (jnp.int32(C.PLAYER_CELL_LIMIT) - n_start
                     - n_disrupt - n_auto)
    cells, new_split, split_cd = A.player_split(
        cells, target, action_eff, state.split_cooldown, elapsed,
        create_limit2, W, H)
    split_cd = jnp.where(palive, split_cd, state.split_cooldown)

    # --- 9. place created cells (SPEC M8 order) ----------------------------
    next_id = state.next_cell_id
    cells, next_id = A.place_new_cells(cells, new_disrupt, next_id)
    cells, next_id = A.place_new_cells(cells, new_auto, next_id)
    cells, next_id = A.place_new_cells(cells, new_split, next_id)

    # --- 10. recombine -----------------------------------------------------
    cells = A.recombine(cells, elapsed)

    # --- 11. anti-team + decay --------------------------------------------
    last_decay, anti_team = state.last_decay_tick, state.anti_team_decay
    if cfg.mode_spec.mass_decay:
        cells, last_decay, anti_team, virus_ticks = A.decay_and_anti_team(
            cells, elapsed, last_decay, anti_team, virus_ticks, palive)

    # --- 12. cross-player eating ------------------------------------------
    if P > 1:
        rank2 = A._cell_rank(cells["id"], cells["alive"])
        gain, eaten, cnt = E.cross_player_eat(cells["pos"], cells["mass"],
                                              cells["alive"], rank2)
        cells["mass"] = cells["mass"] + gain
        cells["alive"] = cells["alive"] & ~eaten
        cells_eaten = state.cells_eaten + cnt
    else:
        cells_eaten = state.cells_eaten

    # --- 13. foods move + virus feeding -----------------------------------
    any_dead_v = jnp.any(~virus_alive)
    dead_slot = jnp.where(any_dead_v,
                          jnp.argmin(virus_alive).astype(jnp.int32), -1)
    (food_pos, food_vel, food_alive, virus_pos, virus_vel, virus_mass,
     virus_hits, virus_alive) = E.move_foods_and_feed_viruses(
        food_pos, food_vel, food_alive, state.virus_pos, state.virus_vel,
        state.virus_mass, state.virus_hits, virus_alive, W, H, dt, dead_slot)

    # --- 14. regeneration --------------------------------------------------
    if cfg.mode_spec.pellet_regen:
        from agarcl_tpu.engine import spawn as S
        (pellet_key, virus_pos, virus_vel, virus_mass,
         virus_hits, virus_alive) = S.regen(
            cfg, pellet_key, virus_pos, virus_vel,
            virus_mass, virus_hits, virus_alive, state.seed, state.ticks)

    # --- 15. assemble ------------------------------------------------------
    keepc = cells["alive"]
    return state.replace(
        target=target, action=action,
        split_cooldown=split_cd, feed_cooldown=feed_cd,
        elapsed_ticks=elapsed, last_decay_tick=last_decay,
        anti_team_decay=anti_team, virus_eaten_ticks=virus_ticks,
        virus_eaten_ptr=virus_ptr, food_eaten=food_eaten,
        highest_mass=highest_mass, cells_eaten=cells_eaten,
        viruses_eaten=viruses_eaten,
        cell_pos=cells["pos"], cell_vel=cells["vel"],
        cell_split_vel=jnp.where(keepc[..., None], cells["split_vel"], 0.0),
        cell_mass=jnp.where(keepc, cells["mass"], 0),
        cell_alive=keepc, cell_id=cells["id"],
        cell_recombine_at=cells["recombine_at"], next_cell_id=next_id,
        pellet_key=pellet_key,
        virus_pos=virus_pos, virus_vel=virus_vel, virus_mass=virus_mass,
        virus_hits=virus_hits, virus_alive=virus_alive,
        food_pos=food_pos, food_vel=food_vel, food_alive=food_alive,
        food_next=food_next,
        ticks=state.ticks + 1,
    )
