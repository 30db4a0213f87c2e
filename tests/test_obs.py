"""Observation-module tests: shapes, channel semantics, view windows —
modeled on the reference's observation-shape matrix tests
(/root/reference/environment/test/grid-env-test.hpp:43-87) plus semantic
checks the reference never had."""

import jax.numpy as jnp
import dataclasses

import numpy as np
import pytest

from agarcl_tpu import EnvConfig
from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
from agarcl_tpu.obs.ram import RamObsConfig, ram_frame, ram_size
from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
from agarcl_tpu.obs.gobigger import (GoBiggerObsConfig, gobigger_frame,
                                     to_player_states)

from tests.helpers import BASE, reset


@pytest.mark.parametrize("flags", [
    (True, True, True, True),
    (True, False, False, False),
    (False, False, False, True),
    (False, False, False, False),
])
def test_grid_channel_count(flags):
    cells, others, viruses, pellets = flags
    ocfg = GridObsConfig(grid_size=16, observe_cells=cells,
                         observe_others=others, observe_viruses=viruses,
                         observe_pellets=pellets)
    expected = 1 + cells + 2 * others + 2 * viruses + 2 * pellets
    assert ocfg.channels_per_frame == expected
    s = reset(BASE, 0)
    obs = grid_frame(BASE, ocfg, s)
    assert obs.shape == (1, expected, 16, 16)
    assert obs.dtype == jnp.int16   # saturating contract default
    assert grid_frame(BASE, dataclasses.replace(ocfg, out_dtype="int32"),
                      s).dtype == jnp.int32


def test_grid_oob_channel():
    """Channel 0 marks out-of-arena bins with -1 (GridEnvironment.hpp:240-248).
    An agent in the corner sees OOB; view 100 >> arena margin."""
    s = reset(BASE, 0)
    s = s.replace(cell_pos=s.cell_pos.at[0, 0].set(jnp.array([1.0, 1.0])))
    obs = np.asarray(grid_frame(BASE, GridObsConfig(grid_size=16), s))[0]
    assert (obs[0] == -1).any()
    assert (obs[0] == 0).any()
    # center of the grid is the player's position: in bounds
    assert obs[0, 8, 8] == 0


def test_grid_pellet_channels():
    s = reset(BASE, 0)
    pos = jnp.array([50.0, 50.0])
    # all pellets on one spot 10 units right of the player
    from agarcl_tpu.state import encode_pellet_key
    s = s.replace(
        cell_pos=s.cell_pos.at[0, 0].set(pos),
        pellet_key=encode_pellet_key(
            BASE, jnp.broadcast_to(pos + jnp.array([10.0, 0.0]),
                                   s.pellet_key.shape + (2,)),
            s.pellet_alive),
        virus_alive=jnp.zeros_like(s.virus_alive))
    ocfg = GridObsConfig(grid_size=16, observe_others=False,
                         observe_viruses=False, observe_cells=False)
    obs = np.asarray(grid_frame(BASE, ocfg, s))[0]
    presence, total = obs[1], obs[2]
    # view = clamp(2*25,100,300) = 100; dx=10 -> bin trunc(16*10/100+8)=9
    assert presence[9, 8] == 1
    assert total[9, 8] == 50          # all 50 pellets stacked
    assert presence.sum() == 1
    assert total.sum() == 50


def test_ram_obs_shape_and_content():
    ocfg = RamObsConfig()
    s = reset(BASE, 3)
    obs = np.asarray(ram_frame(BASE, ocfg, s))
    assert obs.shape == (1, ram_size(BASE, ocfg))
    assert np.isfinite(obs).all()
    # mass feature present
    assert (obs == 25.0).any()


def test_screen_frame_shapes():
    s = reset(BASE, 1)
    for agent_view, ch in ((True, 4), (False, 3)):
        ocfg = ScreenObsConfig(screen_len=32, agent_view=agent_view)
        obs = np.asarray(screen_frame(BASE, ocfg, s))
        assert obs.shape == (1, 32, 32, ch)
        assert obs.dtype == np.uint8


def test_screen_agent_view_semantics():
    s = reset(BASE, 1)
    pos = jnp.array([50.0, 50.0])
    s = s.replace(
        cell_pos=s.cell_pos.at[0, 0].set(pos),
        virus_pos=s.virus_pos.at[0].set(pos + jnp.array([15.0, 0.0])),
        virus_alive=jnp.zeros_like(s.virus_alive).at[0].set(True))
    obs = np.asarray(screen_frame(BASE, ScreenObsConfig(
        screen_len=64, agent_view=True), s))[0]
    assert (obs[..., 3] == 230).any()      # main player
    assert (obs[..., 2] == 255).any()      # virus
    assert (obs[..., 3] == 26).any()       # grid lines


def test_gobigger_structured_obs():
    s = reset(BASE, 2)
    pos = jnp.array([50.0, 50.0])
    s = s.replace(cell_pos=s.cell_pos.at[0, 0].set(pos))
    ocfg = GoBiggerObsConfig()
    frame = gobigger_frame(BASE, ocfg, s)
    assert frame["foods"].shape[0] == 1
    gs, players = to_player_states(BASE, ocfg, frame)
    ps = players[0]
    assert ps.score == 25.0
    assert len(ps.clone_infos) == 1
    clone = ps.clone_infos[0]
    assert abs(clone.position[0]) < 1e-3   # own cell at own centroid
    assert clone.score == 25.0
    # pellets within the 100-unit view window appear as foods
    ppos = np.asarray(s.pellet_xy_alive(BASE)[0])
    in_view = (np.abs(ppos - np.asarray(pos)) < 50.0).all(axis=1)
    assert len(ps.food_infos) >= max(0, in_view.sum() - 2)
    assert gs.team_num == 1


def test_gobigger_vecenv_batched():
    """VecEnv(obs_type='gobigger'): the structured dict frame vmaps over the
    env axis and each env's slice converts through the host rim
    (GoBiggerEnvironment.hpp:446-548 semantics, batched)."""
    from agarcl_tpu.obs.gobigger import batch_player_states
    from agarcl_tpu.vec import VecEnv

    ocfg = GoBiggerObsConfig()
    env = VecEnv(BASE, 4, obs_type="gobigger", obs_config=ocfg)
    states, obs = env.reset(5)
    assert obs["foods"].shape[:2] == (4, 1)          # (N, A, K, F)
    actions = np.zeros((4, 1, 3), np.float32)
    actions[:, :, :2] = 0.5
    states, obs, rewards, dones = env.step(states, actions)
    assert obs["clones"].shape[0] == 4
    assert rewards.shape == (4, 1)
    # per-env rim conversion matches the single-env converter
    for e in range(4):
        gs, players = batch_player_states(BASE, ocfg, obs, e)
        assert players[0].score >= 25.0
        assert len(players[0].clone_infos) >= 1
    # envs were seeded differently -> frames differ across the batch
    f = np.asarray(obs["foods_mask"])
    assert not (f[0] == f[1]).all() or not (f[0] == f[2]).all()
    # multi_step stacks the dict obs per step
    states, obs, rewards, dones = env.multi_step(states, actions, 3)
    assert obs["foods"].shape[:3] == (3, 4, 1)


def test_grid_rasterizer_matches_numpy_scatter():
    """The matmul/unroll rasterizer must agree bin-for-bin with a scalar
    numpy scatter implementing GridEnvironment.hpp:251-279 semantics
    (trunc binning; add / max / min-with-0-for-empty per channel)."""
    cfg = EnvConfig(num_agents=2, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=5, num_bots=2, mode=0)
    G = 32
    ocfg = GridObsConfig(grid_size=G)
    s = reset(cfg, seed=11)
    # make some cells/viruses share bins to exercise max/min tie paths
    s = s.replace(cell_mass=s.cell_mass.at[1, 0].set(77))
    got = np.asarray(grid_frame(cfg, ocfg, s))

    centroid = np.asarray(s.player_centroid())
    pmass = np.asarray(s.player_mass()).astype(np.float64)
    for a in range(cfg.num_agents):
        view = float(np.clip(2.0 * pmass[a], 100.0, 300.0))

        def bins(pos, alive):
            out = []
            for i in range(pos.shape[0]):
                if not alive[i]:
                    continue
                gx = int(np.trunc(G * (pos[i, 0] - centroid[a, 0]) / view
                                  + G / 2.0))
                gy = int(np.trunc(G * (pos[i, 1] - centroid[a, 1]) / view
                                  + G / 2.0))
                if 0 <= gx < G and 0 <= gy < G:
                    out.append((gx, gy, i))
            return out

        ppos_j, palive_j = s.pellet_xy_alive(cfg)
        ppos = np.asarray(ppos_j); palive = np.asarray(palive_j)
        add = np.zeros((G, G), np.int64)
        for gx, gy, _ in bins(ppos, palive):
            add[gx, gy] += 1
        np.testing.assert_array_equal(got[a, 1], np.minimum(add, 1))
        np.testing.assert_array_equal(got[a, 2], add)

        vpos = np.asarray(s.virus_pos); valive = np.asarray(s.virus_alive)
        vmass = np.asarray(s.virus_mass)
        vmax = np.zeros((G, G), np.int64)
        vadd = np.zeros((G, G), np.int64)
        for gx, gy, i in bins(vpos, valive):
            vmax[gx, gy] = max(vmax[gx, gy], vmass[i])
            vadd[gx, gy] += vmass[i]
        np.testing.assert_array_equal(got[a, 3], vmax)
        np.testing.assert_array_equal(got[a, 4], vadd)

        P, Cc = np.asarray(s.cell_mass).shape
        cpos = np.asarray(s.cell_pos).reshape(P * Cc, 2)
        cmass = np.asarray(s.cell_mass).reshape(P * Cc)
        calive = np.asarray(s.cell_alive).reshape(P * Cc)
        owner = np.repeat(np.arange(P), Cc)
        own = np.zeros((G, G), np.int64)
        for gx, gy, i in bins(cpos, calive & (owner == a)):
            own[gx, gy] += cmass[i]
        np.testing.assert_array_equal(got[a, 5], own)
        omin = np.full((G, G), 2**30, np.int64)
        omax = np.zeros((G, G), np.int64)
        for gx, gy, i in bins(cpos, calive & (owner != a)):
            omin[gx, gy] = min(omin[gx, gy], cmass[i])
            omax[gx, gy] = max(omax[gx, gy], cmass[i])
        omin[omin == 2**30] = 0
        np.testing.assert_array_equal(got[a, 6], omin)
        np.testing.assert_array_equal(got[a, 7], omax)


def test_screen_multi_agent():
    """screen_frame for num_agents > 1: the grid-line coverage broadcast
    used to raise for A=2 (on_v lacked its row axis); each agent renders
    from its own centroid."""
    cfg = EnvConfig(num_agents=2, ticks_per_step=2, arena_size=100,
                    num_pellets=30, num_viruses=2, num_bots=0, mode=3)
    s = reset(cfg, seed=4)
    ocfg = ScreenObsConfig(screen_len=32, agent_view=True)
    f = np.asarray(screen_frame(cfg, ocfg, s))
    assert f.shape == (2, 32, 32, 4)
    # each agent sees itself (alpha-230 main-player pixels)
    assert (f[0, :, :, 3] == 230).any()
    assert (f[1, :, :, 3] == 230).any()
    # and sees the other agent only if in view; frames differ
    assert not np.array_equal(f[0], f[1])


def test_gobigger_fused_step_parity():
    """gobigger structured obs through the fused step (interpret) == the
    vmapped XLA env_step, leaf for leaf — the fused backend's route for
    the 3.5M steps/s BASELINE row (bench.py --obs gobigger)."""
    import functools

    import jax
    import jax.numpy as jnp

    from agarcl_tpu.env import env_reset, env_step
    from agarcl_tpu.ops.fused_step import fused_env_step
    from agarcl_tpu.vec import make_obs_fn

    fn, nf = make_obs_fn(BASE, "gobigger", GoBiggerObsConfig())
    states = jax.vmap(functools.partial(env_reset, BASE))(
        jnp.arange(4, dtype=jnp.uint32) + 17)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0]], jnp.float32), (4, 1, 1))
    s_f, obs_f, r_f, d_f = fused_env_step(BASE, states, acts, obs_fn=fn,
                                          num_frames=nf, block_envs=4,
                                          interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, BASE, obs_fn=fn, num_frames=nf)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    for k in obs_f:
        # atol 1e-4: the fused tick's centroid sums reduce in a different
        # f32 order than the vmapped XLA tick's
        np.testing.assert_allclose(np.asarray(obs_f[k]),
                                   np.asarray(obs_x[k]), atol=1e-4,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-4)
