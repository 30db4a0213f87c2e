"""JSON environment snapshots, schema-compatible with the reference.

Save mirrors BaseEnvironment::save_env_state
(/root/reference/environment/envs/BaseEnvironment.hpp:213-318); load mirrors
Engine::load_env_state (/root/reference/agario/engine/Engine.hpp:247-348):
players are reconstructed by name ("HungryBot" etc. select the bot policy),
ticks reset to 0, the RNG is re-seeded from the stored seed. As in the
reference, recombine timers and virus food-hit counters are not serialized
(the format is lossy); freshly loaded cells may recombine immediately.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState, encode_pellet_key, zero_state

_BOT_NAMES = {0: None, 1: "HungryBot", 2: "HungryShyBot", 3: "AggressiveBot",
              4: "AggressiveShyBot"}
_NAME_TO_TYPE = {v: k for k, v in _BOT_NAMES.items() if v}


def save_env_state(cfg: EnvConfig, state: GameState, filename: str) -> None:
    s = _to_numpy(state)
    pp, pa = state.pellet_xy_alive(cfg)
    pellet_pos, pellet_alive = np.asarray(pp), np.asarray(pa)
    bot_types = cfg.bot_types()
    players = []
    agent_idx = 0
    for p in range(cfg.num_players):
        bt = bot_types[p]
        if bt:
            name = _BOT_NAMES[bt]
        else:
            name = f"agent{agent_idx}"
            agent_idx += 1
        cells = []
        for c in range(cfg.max_cells):
            if not s.cell_alive[p, c]:
                continue
            cells.append({
                "id": int(s.cell_id[p, c]),
                "x": float(s.cell_pos[p, c, 0]),
                "y": float(s.cell_pos[p, c, 1]),
                "mass": int(s.cell_mass[p, c]),
                "velocity_x": float(s.cell_vel[p, c, 0]),
                "velocity_y": float(s.cell_vel[p, c, 1]),
                "color": 0,
            })
        vticks = [int(t) for t in s.virus_eaten_ticks[p] if t > -(2**29)]
        players.append({
            "pid": p,
            "name": name,
            "target_x": float(s.target[p, 0]),
            "target_y": float(s.target[p, 1]),
            "is_bot": bool(bt),
            "dead": not bool(s.cell_alive[p].any()),
            "split_cooldown": int(s.split_cooldown[p]),
            "feed_cooldown": int(s.feed_cooldown[p]),
            "virus_eaten_ticks": sorted(vticks),
            "cells": cells,
            "anti_team_decay": float(s.anti_team_decay[p]),
            "elapsed_ticks": int(s.elapsed_ticks[p]),
            "last_decay_tick": int(s.last_decay_tick[p]),
            "food_eaten": int(s.food_eaten[p]),
            "highest_mass": int(s.highest_mass[p]),
            "cells_eaten": int(s.cells_eaten[p]),
            "viruses_eaten": int(s.viruses_eaten[p]),
            "top_position": 0,
        })

    data = {
        "num_agents": cfg.num_agents,
        "ticks_per_step": cfg.ticks_per_step,
        "arena_size": cfg.arena_size,
        "num_bots": cfg.num_bots,
        "reward_type": cfg.reward_type,
        "seed": int(s.seed),
        "c_death": cfg.c_death,
        "mode_number": cfg.mode,
        "pellet_regen": cfg.pellet_regen,
        "pellet_count": int(pellet_alive.sum()),
        "players": players,
        # explicit decoded coordinates (the reference schema; loading
        # re-quantizes to the key grid — lossless for our own snapshots)
        "pellets": [{"x": float(pellet_pos[i, 0]),
                     "y": float(pellet_pos[i, 1])}
                    for i in range(pellet_alive.shape[0])
                    if pellet_alive[i]],
        "viruses": [{"x": float(s.virus_pos[i, 0]),
                     "y": float(s.virus_pos[i, 1]),
                     "velocity_x": float(s.virus_vel[i, 0]),
                     "velocity_y": float(s.virus_vel[i, 1]),
                     "mass": float(s.virus_mass[i])}
                    for i in range(s.virus_alive.shape[0])
                    if s.virus_alive[i]],
        "foods": [{"x": float(s.food_pos[i, 0]),
                   "y": float(s.food_pos[i, 1]),
                   "velocity_x": float(s.food_vel[i, 0]),
                   "velocity_y": float(s.food_vel[i, 1])}
                  for i in range(s.food_alive.shape[0]) if s.food_alive[i]],
    }
    with open(filename, "w") as f:
        json.dump(data, f, indent=4)


def roster_from_snapshot(data: dict) -> tuple:
    """Derive the per-player bot-type roster from a snapshot's player list.

    Mirrors Engine::load_env_state's name dispatch
    (/root/reference/agario/engine/Engine.hpp:274-284): "HungryBot" etc.
    select the bot class, any other name is a plain agent. A player flagged
    is_bot whose name matches no bot class is an error (the reference would
    silently demote it to a policy-less Player, losing its behaviour).
    """
    types = []
    for pdata in data["players"]:
        name = pdata.get("name", "")
        bt = _NAME_TO_TYPE.get(name, 0)
        if pdata.get("is_bot", bool(bt)) and not bt:
            raise ValueError(
                f"snapshot player {name!r} is flagged is_bot but matches no "
                f"known bot class (expected one of {sorted(_NAME_TO_TYPE)})")
        types.append(bt)
    return tuple(types)


def load_env_state(cfg: EnvConfig, filename: str) -> GameState:
    """Rebuild a GameState from a snapshot file.

    The snapshot's player roster (derived from each player's name/is_bot via
    `roster_from_snapshot`, matching the reference's name dispatch) must agree
    slot-for-slot with cfg's roster — a mismatch raises rather than silently
    running a bot's cells under an agent policy. Entities beyond cfg
    capacities are dropped.
    """
    with open(filename) as f:
        data = json.load(f)

    file_roster = roster_from_snapshot(data)
    cfg_roster = cfg.bot_types()
    if file_roster != cfg_roster:
        names = {k: v or "agent" for k, v in _BOT_NAMES.items()}
        raise ValueError(
            "snapshot roster does not match the environment config: file has "
            f"{[names[t] for t in file_roster]}, config expects "
            f"{[names[t] for t in cfg_roster]} (num_agents={cfg.num_agents}, "
            f"mode={cfg.mode}, num_bots={cfg.num_bots})")
    if "mode_number" in data and int(data["mode_number"]) != cfg.mode:
        raise ValueError(
            f"snapshot mode_number={data['mode_number']} does not match the "
            f"environment config mode={cfg.mode} (the reference re-applies "
            "the file's mode on load, Engine.hpp:263)")

    state = zero_state(cfg)
    P, Cc = cfg.num_players, cfg.max_cells
    target = np.zeros((P, 2), np.float32)
    split_cd = np.zeros((P,), np.int32)
    feed_cd = np.zeros((P,), np.int32)
    elapsed = np.zeros((P,), np.int32)
    last_decay = np.zeros((P,), np.int32)
    anti_team = np.ones((P,), np.float32)
    vticks = np.full((P, cfg.virus_ticks_capacity), -(2**30), np.int32)
    vptr = np.zeros((P,), np.int32)
    stats = {k: np.zeros((P,), np.int32) for k in
             ("food_eaten", "cells_eaten", "viruses_eaten")}
    highest = np.full((P,), C.CELL_MIN_SIZE, np.int32)
    cpos = np.zeros((P, Cc, 2), np.float32)
    cvel = np.zeros((P, Cc, 2), np.float32)
    cmass = np.zeros((P, Cc), np.int32)
    calive = np.zeros((P, Cc), bool)
    cid = np.zeros((P, Cc), np.int32)
    max_id = 0

    for p, pdata in enumerate(data["players"][:P]):
        target[p] = (pdata["target_x"], pdata["target_y"])
        split_cd[p] = pdata["split_cooldown"]
        feed_cd[p] = pdata["feed_cooldown"]
        elapsed[p] = pdata["elapsed_ticks"]
        last_decay[p] = pdata["last_decay_tick"]
        anti_team[p] = pdata["anti_team_decay"]
        stats["food_eaten"][p] = pdata["food_eaten"]
        stats["cells_eaten"][p] = pdata["cells_eaten"]
        stats["viruses_eaten"][p] = pdata["viruses_eaten"]
        highest[p] = pdata["highest_mass"]
        ts = pdata.get("virus_eaten_ticks", [])[-cfg.virus_ticks_capacity:]
        for i, t in enumerate(ts):
            vticks[p, i] = t
        vptr[p] = len(ts)
        for c, cdata in enumerate(pdata["cells"][:Cc]):
            cpos[p, c] = (cdata["x"], cdata["y"])
            cvel[p, c] = (cdata["velocity_x"], cdata["velocity_y"])
            cmass[p, c] = cdata["mass"]
            calive[p, c] = True
            cid[p, c] = cdata["id"]
            max_id = max(max_id, int(cdata["id"]))

    Np = cfg.pellet_capacity
    ppos = np.zeros((Np, 2), np.float32)
    palive = np.zeros((Np,), bool)
    for i, pd in enumerate(data.get("pellets", [])[:Np]):
        ppos[i] = (pd["x"], pd["y"])
        palive[i] = True

    Nv = cfg.virus_capacity
    vpos = np.zeros((Nv, 2), np.float32)
    vvel = np.zeros((Nv, 2), np.float32)
    vmass = np.full((Nv,), C.VIRUS_INITIAL_MASS, np.int32)
    valive = np.zeros((Nv,), bool)
    for i, vd in enumerate(data.get("viruses", [])[:Nv]):
        vpos[i] = (vd["x"], vd["y"])
        vvel[i] = (vd["velocity_x"], vd["velocity_y"])
        vmass[i] = int(vd["mass"])
        valive[i] = True

    Nf = cfg.food_capacity
    fpos = np.zeros((Nf, 2), np.float32)
    fvel = np.zeros((Nf, 2), np.float32)
    falive = np.zeros((Nf,), bool)
    foods = data.get("foods", [])[:Nf]
    for i, fd in enumerate(foods):
        fpos[i] = (fd["x"], fd["y"])
        fvel[i] = (fd["velocity_x"], fd["velocity_y"])
        falive[i] = True

    return state.replace(
        target=jnp.asarray(target), split_cooldown=jnp.asarray(split_cd),
        feed_cooldown=jnp.asarray(feed_cd), elapsed_ticks=jnp.asarray(elapsed),
        last_decay_tick=jnp.asarray(last_decay),
        anti_team_decay=jnp.asarray(anti_team),
        virus_eaten_ticks=jnp.asarray(vticks), virus_eaten_ptr=jnp.asarray(vptr),
        food_eaten=jnp.asarray(stats["food_eaten"]),
        cells_eaten=jnp.asarray(stats["cells_eaten"]),
        viruses_eaten=jnp.asarray(stats["viruses_eaten"]),
        highest_mass=jnp.asarray(highest),
        cell_pos=jnp.asarray(cpos), cell_vel=jnp.asarray(cvel),
        cell_mass=jnp.asarray(cmass), cell_alive=jnp.asarray(calive),
        cell_id=jnp.asarray(cid),
        next_cell_id=jnp.int32(max_id + 1),
        pellet_key=encode_pellet_key(cfg, jnp.asarray(ppos),
                                     jnp.asarray(palive)),
        virus_pos=jnp.asarray(vpos), virus_vel=jnp.asarray(vvel),
        virus_mass=jnp.asarray(vmass), virus_alive=jnp.asarray(valive),
        food_pos=jnp.asarray(fpos), food_vel=jnp.asarray(fvel),
        food_alive=jnp.asarray(falive),
        food_next=jnp.int32(len(foods)),
        ticks=jnp.int32(0),  # Engine.hpp:346: ticks reset on load
        seed=jnp.uint32(data.get("seed", 0)),
    )


def _to_numpy(state: GameState):
    import jax
    return jax.tree.map(np.asarray, state)
