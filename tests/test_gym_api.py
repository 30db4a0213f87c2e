"""Gymnasium-wrapper API tests, modeled on the reference's Python suite
(/root/reference/tests/grid_env_test.py, screen_env_test.py) with the same
validity assertions (dtype, bounds, 'not all one value', shape matches the
observation space)."""

import os
import tempfile

import gymnasium as gym
import numpy as np
import pytest

from agarcl_tpu.gym_env import AgarioEnv, register_envs

CFG = dict(arena_size=100, num_pellets=60, num_viruses=3, num_bots=0,
           mode=3, number_steps=50)
NULL_ACTION = ((0.0, 0.0), 0)


def test_gym_make_registered():
    register_envs()
    env = gym.make("agario-grid-v0", arena_size=100, num_pellets=30,
                   num_viruses=0, num_bots=0, mode=3, grid_size=16)
    obs, info = env.reset(seed=1)
    assert obs.shape == env.observation_space.shape


def test_grid_state_validity():
    env = AgarioEnv(obs_type="grid", grid_size=32, **CFG)
    s, _ = env.reset(seed=2)
    assert isinstance(s, np.ndarray)
    assert s.dtype == np.int32
    assert s.shape == env.observation_space.shape
    assert s.min() >= -1
    assert s.max() < 1000
    assert s.min() < s.max()      # not all one value (grid_env_test.py:136)
    s.fill(0)                     # buffer must be owned/writable


def test_grid_steps_well_formed():
    env = AgarioEnv(obs_type="grid", grid_size=32, **CFG)
    env.reset(seed=3)
    for _ in range(10):
        s, r, done, trunc, info = env.step(NULL_ACTION)
        assert s.shape == env.observation_space.shape
        assert isinstance(r, float)
        assert isinstance(done, bool)
        if done:
            break


def test_screen_frames_not_empty_or_saturated():
    env = AgarioEnv(obs_type="screen", screen_len=32, **CFG)
    s, _ = env.reset(seed=4)
    for _ in range(3):
        s, r, done, trunc, info = env.step(((0.5, 0.1), 0))
    assert s.min() < s.max()      # screen_env_test.py:46-47
    assert s.shape == env.observation_space.shape


def test_ram_env():
    env = AgarioEnv(obs_type="ram", **CFG)
    s, _ = env.reset(seed=5)
    assert s.shape == env.observation_space.shape
    s2, r, done, trunc, info = env.step(NULL_ACTION)
    assert s2.shape == s.shape


def test_gobigger_env():
    env = AgarioEnv(obs_type="gobigger", **CFG)
    s, _ = env.reset(seed=6)
    s, r, done, trunc, info = env.step(NULL_ACTION)
    assert s.score >= 25.0
    assert len(s.clone_infos) >= 1


def test_episodic_cutoff():
    env = AgarioEnv(obs_type="ram", **{**CFG, "number_steps": 3})
    env.reset(seed=7)
    dones = []
    for _ in range(5):
        _, _, done, _, _ = env.step(NULL_ACTION)
        dones.append(done)
    assert dones[-1]              # env_type 0 cuts off at number_steps


def test_multi_agent_protocol():
    env = AgarioEnv(obs_type="ram", num_agents=2, **CFG)
    obs, _ = env.reset(seed=8)
    assert isinstance(obs, list) and len(obs) == 2
    obs, rewards, dones, truncs, info = env.step([NULL_ACTION, NULL_ACTION])
    assert len(obs) == 2 and len(rewards) == 2 and len(dones) == 2
    with pytest.raises(ValueError):
        env.step([NULL_ACTION])


def test_snapshot_roundtrip():
    env = AgarioEnv(obs_type="ram", **CFG)
    env.reset(seed=9)
    for _ in range(3):
        env.step(((0.5, 0.5), 0))
    mass_before = int(env.state.player_mass()[0])
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "snap.json")
        env.save_env_state(f)
        env.step(((1.0, 0.0), 0))
        env.load_env_state(f)
    assert int(env.state.player_mass()[0]) == mass_before
    env.step(NULL_ACTION)


def test_video_recording():
    env = AgarioEnv(obs_type="screen", screen_len=32, **CFG)
    env.reset(seed=10)
    env.enable_video_recorder()
    for _ in range(3):
        env.step(((0.3, 0.3), 0))
    with tempfile.TemporaryDirectory() as d:
        env.generate_video(d, "test.avi")
        files = os.listdir(d)
        assert files, "no video written"
        path = os.path.join(d, files[0])
        assert os.path.getsize(path) > 500
        with open(path, "rb") as fh:
            magic = fh.read(4)
        assert magic in (b"RIFF", b"GIF8")
