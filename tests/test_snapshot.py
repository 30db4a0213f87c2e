"""Snapshot roster fidelity (VERDICT round-1 item 5).

The reference reconstructs players from the file by name-dispatch to bot
classes (/root/reference/agario/engine/Engine.hpp:274-284); our load must
derive the roster the same way and refuse a file whose roster disagrees with
the environment config, instead of silently zipping players onto cfg slots.
A golden reference-shaped fixture (tests/fixtures/reference_snapshot_mode7.json)
exercises loading a file we did not write ourselves.
"""

import json
import os
import tempfile

import numpy as np
import pytest

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.gym_env import AgarioEnv
from agarcl_tpu.io.snapshot import (load_env_state, roster_from_snapshot,
                                    save_env_state)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_snapshot_mode7.json")


def test_roster_derivation_by_name():
    with open(FIXTURE) as f:
        data = json.load(f)
    assert roster_from_snapshot(data) == (0, 1)  # agent0 + HungryBot


def test_load_reference_fixture_mode7():
    cfg = EnvConfig(num_agents=1, mode=7, arena_size=350)
    assert cfg.bot_types() == (0, 1)
    state = load_env_state(cfg, FIXTURE)
    # agent cells restored (two cells, masses 61 + 30)
    assert int(state.cell_mass[0, 0]) == 61
    assert int(state.cell_mass[0, 1]) == 30
    assert bool(state.cell_alive[0, 1])
    # bot cell restored into the HungryBot slot
    assert int(state.cell_mass[1, 0]) == 44
    assert np.allclose(np.asarray(state.cell_pos[1, 0]), (301.5, 310.0))
    assert int(state.pellet_alive.sum()) == 5
    assert int(state.virus_alive.sum()) == 1
    assert int(state.food_alive.sum()) == 1
    assert int(state.ticks) == 0          # Engine.hpp:346 resets ticks
    assert int(state.seed) == 1234
    assert int(state.next_cell_id) == 22  # max cell id in file + 1


def test_load_fixture_via_gym_env_and_step():
    env = AgarioEnv(obs_type="ram", mode=7, arena_size=350,
                    num_pellets=500, num_viruses=10)
    env.reset(seed=3)
    env.load_env_state(FIXTURE)
    obs, reward, done, trunc, info = env.step(((0.5, 0.0), 0))
    assert np.all(np.isfinite(obs))


def test_roster_mismatch_raises():
    # cfg without the bot: mode 4 has no bots -> roster (0,) != file (0, 1)
    cfg = EnvConfig(num_agents=1, mode=4, arena_size=350)
    with pytest.raises(ValueError, match="roster"):
        load_env_state(cfg, FIXTURE)
    # wrong bot type: mode 8 expects HungryShyBot in the bot slot
    cfg = EnvConfig(num_agents=1, mode=8, arena_size=350)
    with pytest.raises(ValueError, match="roster"):
        load_env_state(cfg, FIXTURE)


def test_mode_mismatch_raises():
    with open(FIXTURE) as f:
        data = json.load(f)
    data["mode_number"] = 0
    data["num_bots"] = 1
    cfg = EnvConfig(num_agents=1, mode=0, num_bots=1, arena_size=350)
    # roster matches (agent + HungryBot = mode-0 roster with 1 bot) but the
    # fixture claims mode 7 -> patched file loads, original raises
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "snap.json")
        with open(f, "w") as fh:
            json.dump(data, fh)
        load_env_state(cfg, f)  # ok
    with pytest.raises(ValueError, match="mode_number"):
        load_env_state(cfg, FIXTURE)


def test_unknown_bot_name_raises():
    with open(FIXTURE) as f:
        data = json.load(f)
    data["players"][1]["name"] = "CleverBot"   # is_bot stays true
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "snap.json")
        with open(f, "w") as fh:
            json.dump(data, fh)
        cfg = EnvConfig(num_agents=1, mode=7, arena_size=350)
        with pytest.raises(ValueError, match="bot class"):
            load_env_state(cfg, f)


def test_save_then_load_roster_checked():
    """save_env_state writes names load accepts for a duel config."""
    env = AgarioEnv(obs_type="ram", mode=9, arena_size=350)
    env.reset(seed=11)
    env.step(((0.2, 0.2), 1))
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "snap.json")
        env.save_env_state(f)
        with open(f) as fh:
            data = json.load(fh)
        assert roster_from_snapshot(data) == (0, 3)  # AggressiveBot
        env.load_env_state(f)
