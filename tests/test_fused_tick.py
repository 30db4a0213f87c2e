"""Fused Pallas tick (interpret mode) vs the XLA tick: field-exact agreement
over multi-tick trajectories with splits, feeds, virus pops, decay, and
regen. (The C++ oracle covers the XLA tick; this closes the loop on the
fused fast path.)"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.engine.tick import engine_tick
from agarcl_tpu.ops.fused_tick import fused_engine_tick, supports

CFG = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                num_pellets=40, num_viruses=3, num_bots=0, mode=4)

INT_FIELDS = ("cell_mass", "cell_alive", "cell_id", "cell_recombine_at",
              "pellet_key", "virus_alive", "virus_mass", "virus_hits",
              "food_alive", "food_eaten", "highest_mass", "viruses_eaten",
              "elapsed_ticks", "last_decay_tick", "split_cooldown",
              "feed_cooldown", "ticks", "next_cell_id", "food_next",
              "virus_eaten_ptr")
F32_FIELDS = ("cell_pos", "cell_vel", "cell_split_vel",
              "virus_pos", "food_pos", "food_vel", "anti_team_decay")


def compare(ref, out, t):
    for f in INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(out, f)),
            err_msg=f"{f} mismatch at tick {t}")
    for f in F32_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(out, f)),
            atol=2e-3, err_msg=f"{f} mismatch at tick {t}")


def run_trajectory(cfg, n_ticks, seed=0, act_fn=None):
    assert supports(cfg)
    N = 4
    reset_b = jax.vmap(functools.partial(env_reset, cfg))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s_ref = reset_b(jnp.arange(N, dtype=jnp.uint32) + seed)
    s_out = s_ref
    rng = np.random.default_rng(seed)
    for t in range(n_ticks):
        if act_fn is not None:
            tgt, act = act_fn(t, rng, s_ref)
            s_ref = s_ref.replace(target=tgt, action=act)
            s_out = s_out.replace(target=tgt, action=act)
        s_ref = tick_b(s_ref)
        s_out = fused_engine_tick(cfg, s_out, 4, True)
        compare(s_ref, s_out, t)


def steer(t, rng, s):
    c = np.asarray(s.player_centroid())[:, 0]
    tgt = jnp.asarray(c + rng.uniform(-20, 20, c.shape), jnp.float32)
    act = jnp.asarray(rng.integers(0, 3, (c.shape[0], 1)), jnp.int32)
    return tgt[:, None, :], act


def test_fused_matches_xla_random_walk():
    run_trajectory(CFG, 12, seed=0, act_fn=steer)


def test_fused_matches_xla_no_viruses_mode3():
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=80,
                    num_pellets=30, num_viruses=0, num_bots=0, mode=3)
    run_trajectory(cfg, 12, seed=5, act_fn=steer)


def test_fused_matches_through_regen_boundary():
    """Cross tick 120 so regeneration fires in both paths identically."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=80,
                    num_pellets=16, num_viruses=2, num_bots=0, mode=4)
    N = 4
    reset_b = jax.vmap(functools.partial(env_reset, cfg))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s_ref = reset_b(jnp.arange(N, dtype=jnp.uint32))
    # jump near the regen boundary and kill some pellets
    kill = s_ref.pellet_key.at[:, :7].set(-1)
    s_ref = s_ref.replace(ticks=jnp.full((N,), 118, jnp.int32),
                          pellet_key=kill)
    s_out = s_ref
    for t in range(5):
        s_ref = tick_b(s_ref)
        s_out = fused_engine_tick(cfg, s_out, 4, True)
        compare(s_ref, s_out, t)
    # regen refilled (a couple may have been re-eaten by the agent)
    assert int(np.asarray(s_ref.pellet_alive).sum()) >= N * cfg.num_pellets - N


def test_fused_multi_tick_regen_after_in_call_eats():
    """Pellets eaten INSIDE the same multi-tick kernel call whose later tick
    crosses the regen boundary: the kernel's conservative maybe-deficit
    flag must still let regen fire (it is raised by in-call eats, not just
    by dead-at-entry slots)."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=60,
                    num_pellets=24, num_viruses=2, num_bots=0, mode=4)
    N = 4
    reset_b = jax.vmap(functools.partial(env_reset, cfg))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s = reset_b(jnp.arange(N, dtype=jnp.uint32) + 11)
    # park the agent ON a live pellet just before the boundary so ticks
    # 117-119 eat (raising the flag in-call) and tick 120 regenerates
    ppos = np.asarray(s.pellet_xy_alive(cfg)[0])
    tgt = jnp.asarray(ppos[:, 3], jnp.float32)
    cp = s.cell_pos.at[:, 0, 0, :].set(tgt)
    s = s.replace(ticks=jnp.full((N,), 117, jnp.int32), cell_pos=cp,
                  target=tgt[:, None, :])
    s_ref = s
    for _ in range(4):
        s_ref = tick_b(s_ref)
    s_out = fused_engine_tick(cfg, s, 4, True, n_ticks=4)
    compare(s_ref, s_out, "regen-after-eats")
    # something was actually eaten and then refilled
    assert int(np.asarray(s_ref.food_eaten).sum()) > 0
    assert int(np.asarray(s_ref.pellet_alive).sum()) == N * cfg.num_pellets


def test_fused_recombine_merge():
    """Two recombinable cells (timer expired, overlapping) must merge
    identically in the fused and XLA ticks — exercises the chunked
    recombine matching pass, including multi-pair states."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=80,
                    num_pellets=10, num_viruses=0, num_bots=0, mode=4)
    N = 4
    reset_b = jax.vmap(functools.partial(env_reset, cfg))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s = reset_b(jnp.arange(N, dtype=jnp.uint32) + 5)
    # four live cells per env: two overlapping recombinable pairs, one
    # pair still on cooldown
    base = np.asarray(s.cell_pos[:, 0, 0])                  # (N, 2)
    cp = s.cell_pos
    cm = s.cell_mass
    ca = s.cell_alive
    cr = s.cell_recombine_at
    cid = s.cell_id
    for k, (dx, dy) in enumerate(((0.0, 0.0), (1.0, 0.5), (12.0, 0.0),
                                  (12.5, 0.5))):
        cp = cp.at[:, 0, k, 0].set(base[:, 0] + dx)
        cp = cp.at[:, 0, k, 1].set(base[:, 1] + dy)
        cm = cm.at[:, 0, k].set(60 + 5 * k)
        ca = ca.at[:, 0, k].set(True)
        cid = cid.at[:, 0, k].set(10 + k)
    cr = cr.at[:, 0, 0].set(0).at[:, 0, 1].set(0)           # expired
    cr = cr.at[:, 0, 2].set(0).at[:, 0, 3].set(10 ** 6)     # one blocked
    s = s.replace(cell_pos=cp, cell_mass=cm, cell_alive=ca,
                  cell_recombine_at=cr, cell_id=cid,
                  elapsed_ticks=jnp.full((N, 1), 500, jnp.int32),
                  next_cell_id=jnp.full((N,), 50, jnp.int32))
    s_ref = s
    s_out = s
    for t in range(3):
        s_ref = tick_b(s_ref)
        s_out = fused_engine_tick(cfg, s_out, 4, True)
        compare(s_ref, s_out, t)
    # the expired overlapping pair merged; the blocked pair did not
    n_alive = np.asarray(s_ref.cell_alive).sum(axis=(1, 2))
    assert (n_alive < 4).all() and (n_alive >= 2).all()


def test_resident_refuses_respawn_main_during_obs():
    """ADVICE r4 (medium): a VecEnv built with respawn_main_during_obs
    must refuse resident state — the resident kernel path cannot apply
    the main-agent respawn/done-latch/c_death semantics _finish_step
    adds per step."""
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=0, num_bots=0, mode=4)
    env = VecEnv(cfg, 4, obs_type="ram", backend="fused",
                 respawn_main_during_obs=True, donate=False)
    assert not env.supports_resident()
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(4, dtype=jnp.uint32))
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        env.make_resident(states)


def test_fused_supports_gate():
    assert supports(CFG)
    assert supports(EnvConfig(num_agents=2))
    assert supports(EnvConfig(num_agents=1, num_bots=1, mode=0))
    # round 5: rosters up to 9 players ride the chunked cross-eat
    assert supports(EnvConfig(num_agents=2, num_bots=4, mode=0))
    assert supports(EnvConfig(num_agents=1, num_bots=8, mode=0))
    assert not supports(EnvConfig(num_agents=1, num_bots=9, mode=0))


def test_fused_env_step_matches_xla(monkeypatch):
    """fused_env_step (interpret mode) vs the vmapped XLA env_step: rewards,
    dones, and state must agree through actions/obs/respawn logic."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    ocfg = RamObsConfig()
    frame_fn = functools.partial(ram_frame, cfg, ocfg)
    N = 4
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    acts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (N, 1, 3)),
                       jnp.float32)
    acts = acts.at[..., 2].set(0.0)

    s_f, obs_f, r_f, d_f = FS.fused_env_step(cfg, states, acts,
                                             obs_fn=frame_fn, num_frames=1,
                                             block_envs=4, interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=frame_fn, num_frames=1)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(s_f.cell_mass),
                                  np.asarray(s_x.cell_mass))
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_x),
                               atol=5e-3)


def test_fused_autoreset(monkeypatch):
    """Fused-path auto_reset: a done env gets a fresh state in interpret
    mode."""
    import agarcl_tpu.ops.fused_step as FS
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=0, num_bots=0, mode=3)
    N = 4
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    # env 0 crosses the mode-3 mass cap -> done -> reset
    states = states.replace(cell_mass=states.cell_mass.at[0, 0, 0].set(23500))
    acts = jnp.zeros((N, 1, 3), jnp.float32)
    s2, obs, r, d = FS.fused_env_step(cfg, states, acts, block_envs=4,
                                      interpret=True, auto_reset=True)
    assert bool(d[0, 0])
    assert int(s2.player_mass()[0, 0]) == 25        # reset to spawn mass
    assert int(s2.player_mass()[1, 0]) >= 25        # others untouched
    assert int(s2.ticks[0]) == 0


def test_fused_ram_obs_parity():
    """fused_obs kernel (interpret) == vmapped ram_frame after steps with
    splits and eaten pellets."""
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
    from agarcl_tpu.ops.fused_obs import fused_ram_obs
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                    num_pellets=100, num_viruses=4, num_bots=0, mode=4)
    ocfg = RamObsConfig()
    env = VecEnv(cfg, 8, obs_type="ram", backend="xla", donate=False)
    states, _ = env.reset(5)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 1.0]], jnp.float32), (8, 1, 1))
    for _ in range(3):
        states, obs, r, d = env.step(states, acts)
    ref = jax.jit(jax.vmap(functools.partial(ram_frame, cfg, ocfg)))(states)
    got = fused_ram_obs(cfg, ocfg, states, block_envs=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_multi_step_returns_obs():
    """VecEnv.multi_step stacks a per-step observation (never dead-coded)."""
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=0, num_bots=0, mode=4)
    env = VecEnv(cfg, 4, obs_type="ram", backend="xla", donate=False)
    states, obs0 = env.reset(0)
    acts = jnp.zeros((4, 1, 3), jnp.float32)
    states, obs, r, d = env.multi_step(states, acts, 3)
    assert obs.shape[:2] == (3, 4)
    assert r.shape == (3, 4, 1) and d.shape == (3, 4, 1)
    assert np.all(np.isfinite(np.asarray(obs)))


def test_multi_step_obs_tuple_matches_stacked(monkeypatch):
    """multi_step(stack_obs=False) on the fused python-unroll path
    returns the same per-step frames as the stacked default, just as a
    k-tuple (the round-5 contract that skips the k*frame stack copy —
    ~3.5 ms/step on the 1.07-GB int32 grid stack at 8192 envs). Runs the
    fused backend in interpret mode by pinning fused_env_step's interpret
    flag (grid obs is not in-kernel-multi-eligible, so the unroll branch
    executes)."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.obs.grid import GridObsConfig
    from agarcl_tpu.vec import VecEnv

    orig = FS.fused_env_step
    monkeypatch.setattr(
        FS, "fused_env_step",
        functools.partial(orig, interpret=True))

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=24, num_viruses=0, num_bots=0, mode=4)
    ocfg = GridObsConfig(grid_size=16)
    env = VecEnv(cfg, 4, obs_type="grid", obs_config=ocfg,
                 backend="fused", block_envs=2, donate=False)
    states, _ = env.reset(3)
    acts = jnp.zeros((4, 1, 3), jnp.float32).at[..., 0].set(1.0)
    s1, obs_stacked, r1, d1 = env.multi_step(states, acts, 2)
    s2, obs_tuple, r2, d2 = env.multi_step(states, acts, 2,
                                           stack_obs=False)
    assert isinstance(obs_tuple, tuple) and len(obs_tuple) == 2
    np.testing.assert_array_equal(np.asarray(obs_stacked),
                                  np.asarray(jnp.stack(list(obs_tuple))))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_multi_step_matches_stepwise():
    """multi_step's stacked obs/rewards/dones must equal k sequential
    step() calls exactly (the fused backend python-unrolls instead of
    scanning; the op-graph backend keeps lax.scan — both must be pure
    restackings of the per-step results)."""
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=2, num_bots=0, mode=4)
    acts = jnp.zeros((4, 1, 3), jnp.float32).at[..., 0].set(0.5)
    env = VecEnv(cfg, 4, obs_type="ram", backend="xla", donate=False)
    st, _ = env.reset(3)
    st_scan, obs_scan, r_scan, d_scan = env.multi_step(st, acts, 3)
    st2, _ = env.reset(3)
    obs_l, r_l, d_l = [], [], []
    for _ in range(3):
        st2, o, r, d = env.step(st2, acts)
        obs_l.append(o)
        r_l.append(r)
        d_l.append(d)
    np.testing.assert_array_equal(np.asarray(obs_scan),
                                  np.asarray(jnp.stack(obs_l)))
    np.testing.assert_array_equal(np.asarray(r_scan),
                                  np.asarray(jnp.stack(r_l)))
    np.testing.assert_array_equal(np.asarray(d_scan),
                                  np.asarray(jnp.stack(d_l)))
    compare(st_scan, st2, "multi-step-scan")

    # the fused backend's unrolled multi_step is the same composition of
    # fused_env_step calls; check the composition itself in interpret mode
    import agarcl_tpu.ops.fused_step as FS
    st3, _ = env.reset(3)
    s_out = st3
    fr2, rs2 = [], []
    for _ in range(3):
        s_out, o2, r2, d2 = FS.fused_env_step(
            cfg, s_out, acts, obs_fn=env._frame_fn, num_frames=1,
            block_envs=4, interpret=True)
        fr2.append(o2)
        rs2.append(r2)
    np.testing.assert_allclose(np.asarray(obs_scan),
                               np.asarray(jnp.stack(fr2)), atol=5e-3)
    np.testing.assert_allclose(np.asarray(r_scan),
                               np.asarray(jnp.stack(rs2)), atol=1e-3)


def test_fused_screen_obs_parity():
    """fused_screen kernel (interpret) == vmapped screen_frame, pixel-exact,
    including a bot opponent (other-player class) and viruses."""
    from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
    from agarcl_tpu.ops.fused_screen import fused_screen_frame
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                    num_pellets=100, num_viruses=4, num_bots=1, mode=7)
    ocfg = ScreenObsConfig(screen_len=64, agent_view=True)
    env = VecEnv(cfg, 8, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(11)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0]], jnp.float32), (8, 1, 1))
    for _ in range(3):
        states, obs, r, d = env.step(states, acts)
    ref = jax.jit(jax.vmap(functools.partial(screen_frame, cfg, ocfg)))(
        states)
    got = fused_screen_frame(cfg, ocfg, states, block_envs=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # natural RGB mode exercises the rgb565-prequantized in-kernel palette
    # and the 3-channel bitcast slice
    nat = ScreenObsConfig(screen_len=64, agent_view=False)
    ref_n = jax.jit(jax.vmap(functools.partial(screen_frame, cfg, nat)))(
        states)
    got_n = fused_screen_frame(cfg, nat, states, block_envs=4, interpret=True)
    assert got_n.shape[-1] == 3
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(ref_n))


def test_fused_env_step_screen_obs():
    """fused_env_step with screen obs routes through the Pallas rasterizer
    (interpret mode) and matches the vmapped XLA env_step pixel-exactly."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    ocfg = ScreenObsConfig(screen_len=32, agent_view=True)
    frame_fn = functools.partial(screen_frame, cfg, ocfg)
    N = 8
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    acts = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32), (N, 1, 1))

    s_f, obs_f, r_f, d_f = FS.fused_env_step(
        cfg, states, acts, obs_fn=frame_fn, num_frames=ocfg.num_frames,
        block_envs=8, interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=frame_fn, num_frames=ocfg.num_frames)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_x))
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_x))


# ---------------------------------------------------------------------------
# multi-player fused path: bots + cross-player eating in-kernel
# ---------------------------------------------------------------------------

MP_INT_FIELDS = INT_FIELDS + ("cells_eaten", "action")
MP_F32_FIELDS = F32_FIELDS + ("target",)


def compare_mp(ref, out, t):
    for f in MP_INT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f)), np.asarray(getattr(out, f)),
            err_msg=f"{f} mismatch at tick {t}")
    for f in MP_F32_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, f)), np.asarray(getattr(out, f)),
            atol=2e-3, err_msg=f"{f} mismatch at tick {t}")


def run_trajectory_mp(cfg, n_ticks, seed=0, act_fn=None, boost=None):
    assert supports(cfg)
    N = 4
    reset_b = jax.vmap(functools.partial(env_reset, cfg))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s_ref = reset_b(jnp.arange(N, dtype=jnp.uint32) + seed)
    if boost is not None:
        s_ref = boost(s_ref)
    s_out = s_ref
    rng = np.random.default_rng(seed)
    for t in range(n_ticks):
        if act_fn is not None:
            tgt, act = act_fn(t, rng, s_ref)
            s_ref = s_ref.replace(target=tgt, action=act)
            s_out = s_out.replace(target=tgt, action=act)
        s_ref = tick_b(s_ref)
        s_out = fused_engine_tick(cfg, s_out, 4, True)
        compare_mp(s_ref, s_out, t)


def steer_agent0(t, rng, s):
    """Random-walk only the agent (player 0); bots keep their own targets."""
    tgt = np.array(s.target)
    act = np.array(s.action)
    c = np.asarray(s.player_centroid())[:, 0]
    tgt[:, 0] = c + rng.uniform(-20, 20, c.shape)
    act[:, 0] = rng.integers(0, 3, c.shape[0])
    return jnp.asarray(tgt, jnp.float32), jnp.asarray(act, jnp.int32)


@pytest.mark.parametrize("mode", [7, 8, 9, 10])
def test_fused_matches_xla_duel_modes(mode):
    """Duel vs each scripted bot type: in-kernel bot decisions and
    cross-player eating must match the XLA tick field-exactly."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=1, mode=mode)
    run_trajectory_mp(cfg, 15, seed=mode, act_fn=steer_agent0)


def test_fused_matches_xla_mode0_roster():
    """Mode 0 with two agents + one bot (3 players): contested pellets,
    bot updates, cross-eat."""
    cfg = EnvConfig(num_agents=2, ticks_per_step=4, arena_size=80,
                    num_pellets=30, num_viruses=2, num_bots=1, mode=0)

    def steer_all(t, rng, s):
        tgt = np.array(s.target)
        act = np.array(s.action)
        c = np.asarray(s.player_centroid())
        for a in range(2):
            tgt[:, a] = c[:, a] + rng.uniform(-15, 15, c[:, a].shape)
            act[:, a] = rng.integers(0, 3, c.shape[0])
        return jnp.asarray(tgt, jnp.float32), jnp.asarray(act, jnp.int32)

    run_trajectory_mp(cfg, 15, seed=3, act_fn=steer_all)


def _steer_all_agents(num_agents):
    def steer_all(t, rng, s):
        tgt = np.array(s.target)
        act = np.array(s.action)
        c = np.asarray(s.player_centroid())
        for a in range(num_agents):
            tgt[:, a] = c[:, a] + rng.uniform(-15, 15, c[:, a].shape)
            act[:, a] = rng.integers(0, 3, c.shape[0])
        return jnp.asarray(tgt, jnp.float32), jnp.asarray(act, jnp.int32)
    return steer_all


def test_fused_matches_xla_mode0_4bots():
    """Mode 0 full-game roster (agent + the reference's four scripted bot
    types, BaseEnvironment.hpp:381-397 = 5 players, PC=80): the CHUNKED
    cross-player eat (fused_tick.py x_chunked — PC > 48) must match the
    XLA tick field-exactly through bot play and contested resources."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=80,
                    num_pellets=30, num_viruses=2, num_bots=4, mode=0)
    run_trajectory_mp(cfg, 12, seed=5, act_fn=steer_agent0)


def test_fused_matches_xla_mode0_8bots():
    """9-player roster (agent + 8 bots — above the reference fixture's
    granularity, tests/__init__.py:5-14 runs 25): the largest fused
    roster; chunked cross-eat + all per-player phases at P=9."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=80,
                    num_pellets=24, num_viruses=2, num_bots=8, mode=0)
    run_trajectory_mp(cfg, 8, seed=11, act_fn=steer_agent0)


def test_fused_cross_eat_chunked_exact():
    """Force immediate cross-player eats on the CHUNKED path (P=5): a fat
    agent cell dropped onto bot spawns must eat identically to the XLA
    tick, including the pid-rank winner arbitration."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=20, num_viruses=0, num_bots=4, mode=0)

    def boost(s):
        bp = s.cell_pos[:, 1, 0]                      # bot 1 spawn (N, 2)
        cm = s.cell_mass.at[:, 0, 0].set(500)
        cp = s.cell_pos.at[:, 0, 0].set(bp)
        # bot 2 overlaps too: two prey resolved in one tick
        cp2 = cp.at[:, 2, 0].set(bp)
        return s.replace(cell_mass=cm, cell_pos=cp2)

    run_trajectory_mp(cfg, 5, seed=2, act_fn=steer_agent0, boost=boost)


def test_fused_cross_eat_exact():
    """Force an immediate cross-player eat: big agent overlapping the bot."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=20, num_viruses=0, num_bots=1, mode=7)

    def boost(s):
        # put a big agent cell on top of the bot's spawn
        bp = s.cell_pos[:, 1, 0]                      # (N, 2)
        cm = s.cell_mass.at[:, 0, 0].set(500)
        cp = s.cell_pos.at[:, 0, 0].set(bp)
        return s.replace(cell_mass=cm, cell_pos=cp)

    # 6 ticks: at tick 7 (this seed) a same-player relaxation pair sits on
    # the elastic/static branch boundary and sub-1e-5 f32 noise flips it —
    # the known cross-implementation sensitivity (see tests/test_parity.py
    # mode-6 tolerance); the eat itself resolves at tick 0 and is exact.
    run_trajectory_mp(cfg, 6, seed=1, act_fn=steer_agent0, boost=boost)


def test_fused_env_step_duel():
    """fused_env_step on a duel config: rewards/dones (done_on_death) match
    the vmapped XLA env_step."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=1, mode=7)
    ocfg = RamObsConfig()
    frame_fn = functools.partial(ram_frame, cfg, ocfg)
    N = 4
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    acts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (N, 1, 3)),
                       jnp.float32)
    acts = acts.at[..., 2].set(0.0)

    s_f, obs_f, r_f, d_f = FS.fused_env_step(cfg, states, acts,
                                             obs_fn=frame_fn, num_frames=1,
                                             block_envs=4, interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=frame_fn, num_frames=1)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_x))
    np.testing.assert_array_equal(np.asarray(s_f.cell_mass),
                                  np.asarray(s_x.cell_mass))
    np.testing.assert_allclose(np.asarray(obs_f), np.asarray(obs_x),
                               atol=5e-3)


def test_fused_ram_obs_parity_multiplayer():
    """fused_obs kernel (interpret) == vmapped ram_frame on a duel config
    (other-player block populated)."""
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
    from agarcl_tpu.ops.fused_obs import fused_ram_obs
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=2, ticks_per_step=4, arena_size=120,
                    num_pellets=100, num_viruses=4, num_bots=1, mode=0)
    ocfg = RamObsConfig()
    env = VecEnv(cfg, 8, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(7)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0], [-0.5, 0.2, 0.0]],
                                jnp.float32), (8, 1, 1))
    for _ in range(3):
        states, obs, r, d = env.step(states, acts)
    ref = jax.jit(jax.vmap(functools.partial(ram_frame, cfg, ocfg)))(states)
    got = fused_ram_obs(cfg, ocfg, states, block_envs=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_grid_obs_parity():
    """fused_grid kernel (interpret) == vmapped grid_frame, bin-exact,
    including a bot opponent (others min/max channels) and viruses."""
    from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
    from agarcl_tpu.ops.fused_grid import fused_grid_frame
    from agarcl_tpu.vec import VecEnv
    for mode, bots in ((4, 0), (7, 1)):
        cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                        num_pellets=100, num_viruses=4, num_bots=bots,
                        mode=mode)
        ocfg = GridObsConfig(grid_size=32)
        env = VecEnv(cfg, 8, obs_type="none", backend="xla", donate=False)
        states, _ = env.reset(13)
        acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0]], jnp.float32),
                        (8, 1, 1))
        for _ in range(3):
            states, obs, r, d = env.step(states, acts)
        ref = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, ocfg)))(
            states)
        got = fused_grid_frame(cfg, ocfg, states, block_envs=4,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused_grid_obs_bin_collisions():
    """Two viruses (and two other-player cells) forced into the SAME grid
    bin: exercises the kernel's slow path (max != sum when a bin holds >= 2
    entities) against the vmapped rasterizer."""
    from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
    from agarcl_tpu.ops.fused_grid import fused_grid_frame
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                    num_pellets=50, num_viruses=4, num_bots=1, mode=7)
    ocfg = GridObsConfig(grid_size=32)
    env = VecEnv(cfg, 4, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(3)
    c = states.player_centroid()[:, 0]                       # (4, 2)
    # two viruses 0.2 apart (same bin at any view), different masses; the
    # bot's two cells likewise co-binned near the main player
    vp = states.virus_pos
    vp = vp.at[:, 0].set(c + 10.0)
    vp = vp.at[:, 1].set(c + 10.2)
    states = states.replace(
        virus_pos=vp,
        virus_alive=states.virus_alive.at[:, :2].set(True),
        virus_mass=states.virus_mass.at[:, 0].set(120).at[:, 1].set(180),
        cell_pos=states.cell_pos.at[:, 1, 0].set(c - 8.0)
                                .at[:, 1, 1].set(c - 8.3),
        cell_alive=states.cell_alive.at[:, 1, :2].set(True),
        cell_mass=states.cell_mass.at[:, 1, 0].set(40)
                                  .at[:, 1, 1].set(90))
    ref = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, ocfg)))(states)
    got = fused_grid_frame(cfg, ocfg, states, block_envs=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the crafted state must actually produce distinct min/max somewhere
    assert (np.asarray(ref)[:, 0, -2] != np.asarray(ref)[:, 0, -1]).any()


def test_fused_tick_same_tick_double_burst():
    """Two viruses reaching their 7th food hit in the SAME tick: the fused
    kernel applies the pinned one-spawn-per-tick cap (SPEC M4) identically
    to the XLA tick — both bursters reset, exactly one spawn fires from the
    lowest-slot burster (unit-level twin: test_engine_advanced.py::
    test_same_tick_double_burst_single_spawn)."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=200,
                    num_pellets=10, num_viruses=3, num_bots=0, mode=4)
    N = 4
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    Nv = states.virus_mass.shape[1]
    assert Nv >= 4                        # capacity > num_viruses
    vp = states.virus_pos
    vp = vp.at[:, 0].set(jnp.asarray([50.0, 50.0]))
    vp = vp.at[:, 1].set(jnp.asarray([150.0, 50.0]))
    states = states.replace(
        virus_pos=vp,
        virus_mass=states.virus_mass.at[:, 0].set(170).at[:, 1].set(170),
        virus_hits=states.virus_hits.at[:, 0].set(7).at[:, 1].set(7),
        virus_alive=states.virus_alive.at[:, 0].set(True)
                                      .at[:, 1].set(True)
                                      .at[:, 2:].set(False),
        food_pos=states.food_pos.at[:, 1].set(vp[:, 0])
                                .at[:, 3].set(vp[:, 1]),
        food_vel=states.food_vel.at[:, 1].set(jnp.asarray([3.0, 0.0]))
                                .at[:, 3].set(jnp.asarray([0.0, -2.0])),
        food_alive=states.food_alive.at[:, 1].set(True).at[:, 3].set(True))
    tick_b = jax.jit(jax.vmap(functools.partial(engine_tick, cfg)))
    s_ref = tick_b(states)
    s_out = fused_engine_tick(cfg, states, 4, True)
    compare(s_ref, s_out, 0)
    # semantic checks on the shared result
    vh = np.asarray(s_ref.virus_hits)
    vm = np.asarray(s_ref.virus_mass)
    va = np.asarray(s_ref.virus_alive)
    assert (vh[:, 0] == 0).all() and (vh[:, 1] == 0).all()
    assert (vm[:, 0] == 100).all() and (vm[:, 1] == 100).all()
    assert (va[:, :3].sum(axis=1) == 3).all()       # exactly one spawn
    assert (va[:, 3:].sum(axis=1) == 0).all()


def test_fused_grid_obs_int16():
    """Opt-in int16 grid output: value-exact vs the int32 kernel where in
    range, saturating at 32767 where own-mass sums exceed int16."""
    from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
    from agarcl_tpu.ops.fused_grid import fused_grid_frame
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                    num_pellets=100, num_viruses=4, num_bots=0, mode=4)
    env = VecEnv(cfg, 8, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(13)
    # force an own-mass bin sum beyond int16: two co-binned 20k cells
    c = states.player_centroid()[:, 0]
    states = states.replace(
        cell_pos=states.cell_pos.at[:, 0, 0].set(c + 5.0)
                                .at[:, 0, 1].set(c + 5.0),
        cell_alive=states.cell_alive.at[:, 0, 1].set(True),
        cell_mass=states.cell_mass.at[:, 0, 0].set(20000)
                                  .at[:, 0, 1].set(20000))
    o32 = GridObsConfig(grid_size=32, out_dtype="int32")
    o16 = GridObsConfig(grid_size=32)   # int16 is the contract default
    ref32 = fused_grid_frame(cfg, o32, states, block_envs=4, interpret=True)
    got16 = fused_grid_frame(cfg, o16, states, block_envs=4, interpret=True)
    assert got16.dtype == jnp.int16
    r = np.asarray(ref32)
    g = np.asarray(got16)
    np.testing.assert_array_equal(g, np.clip(r, -32768, 32767))
    assert (r > 32767).any() and (g == 32767).any()          # saturation hit
    # the XLA grid_frame honors the same opt-in contract
    ref16 = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, o16)))(states)
    assert ref16.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(ref16), g)
    # int8 quarters the store; saturates at 127 (mass channels become
    # presence-ish), oob/presence/count channels stay exact
    o8 = GridObsConfig(grid_size=32, out_dtype="int8")
    got8 = fused_grid_frame(cfg, o8, states, block_envs=4, interpret=True)
    assert got8.dtype == jnp.int8
    g8 = np.asarray(got8)
    np.testing.assert_array_equal(g8, np.clip(r, -128, 127))
    assert (g8 == 127).any()
    ref8 = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, o8)))(states)
    np.testing.assert_array_equal(np.asarray(ref8), g8)


def test_fused_env_step_grid_obs():
    """fused_env_step with grid obs routes through the Pallas binning kernel
    (interpret mode) and matches the vmapped XLA env_step bin-exactly."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.grid import GridObsConfig, grid_frame

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    ocfg = GridObsConfig(grid_size=32)
    frame_fn = functools.partial(grid_frame, cfg, ocfg)
    N = 8
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    acts = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32), (N, 1, 1))

    s_f, obs_f, r_f, d_f = FS.fused_env_step(
        cfg, states, acts, obs_fn=frame_fn, num_frames=ocfg.num_frames,
        block_envs=8, interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=frame_fn, num_frames=ocfg.num_frames)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_x))
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_x))


def test_fused_respawn_main_during_obs():
    """fused_env_step(respawn_main_during_obs=True) matches the XLA env_step
    screen semantics (env.py:159-167): a main player killed mid-episode is
    respawned after the obs ticks, main_respawned fires, and the step is
    charged c_death."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.env import env_step

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=1,
                    reward_type=True)
    N = 8
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    # kill the main player in the odd envs
    dead = (jnp.arange(N) % 2).astype(bool)
    states = states.replace(
        cell_alive=states.cell_alive & ~dead[:, None, None],
        cell_mass=jnp.where(dead[:, None, None], 0, states.cell_mass))
    acts = jnp.tile(jnp.asarray([[0.3, 0.2, 0.0]], jnp.float32), (N, 1, 1))

    s_f, obs_f, r_f, d_f = FS.fused_env_step(
        cfg, states, acts, block_envs=8, interpret=True,
        respawn_main_during_obs=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, respawn_main_during_obs=True)))
    s_x, r_x, d_x = step_x(states, acts)

    assert np.all(np.asarray(s_f.player_alive()[:, 0]))  # all respawned
    assert np.array_equal(np.asarray(s_f.main_respawned),
                          np.asarray(dead))
    for name in ("cell_pos", "cell_mass", "cell_alive", "cell_id",
                 "main_respawned", "next_cell_id"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_f, name)), np.asarray(getattr(s_x, name)),
            err_msg=name)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_x))


def test_multi_tick_kernel_matches_chained_single_ticks():
    """fused_engine_tick(n_ticks=4) == four chained n_ticks=1 calls,
    field-exact, for a pellet mode and a duel mode (bots act on the tick
    counter inside the loop; dead-cell masking chains between in-kernel
    ticks exactly as the per-tick writeback)."""
    import dataclasses

    from agarcl_tpu.env import apply_actions

    for mode, bots in ((4, 0), (7, 1)):
        cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                        num_pellets=80, num_viruses=4, num_bots=bots,
                        mode=mode)
        states = jax.vmap(lambda s: env_reset(cfg, s))(
            jnp.arange(8, dtype=jnp.uint32) + 5)
        acts = jnp.tile(jnp.asarray([[0.6, -0.3, 2.0]], jnp.float32),
                        (8, cfg.num_agents, 1))
        states = jax.vmap(functools.partial(apply_actions, cfg))(states,
                                                                 acts)
        a = states
        for _ in range(4):
            a = fused_engine_tick(cfg, a, 8, True, 99, 1)
        b = fused_engine_tick(cfg, states, 8, True, 99, 4)
        for f in dataclasses.fields(a):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f.name)),
                np.asarray(getattr(b, f.name)),
                err_msg=f"mode {mode}: {f.name}")


def test_fused_odd_env_counts():
    """Env counts that don't divide the default block sizes fall back to
    smaller blocks instead of asserting (VecEnv users pick arbitrary N)."""
    from agarcl_tpu.obs.screen import ScreenObsConfig
    from agarcl_tpu.ops.fused_step import fused_env_step
    from agarcl_tpu.vec import make_obs_fn

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, mode=4)
    for n, obs in ((10, "screen"), (13, "grid"), (6, "ram")):
        states = jax.vmap(functools.partial(env_reset, cfg))(
            jnp.arange(n, dtype=jnp.uint32))
        acts = jnp.tile(jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32),
                        (n, 1, 1))
        ocfg = ScreenObsConfig(screen_len=32) if obs == "screen" else None
        fn, nf = make_obs_fn(cfg, obs, ocfg)
        s2, o2, r2, d2 = fused_env_step(cfg, states, acts, obs_fn=fn,
                                        num_frames=nf, interpret=True)
        assert np.isfinite(np.asarray(o2, np.float32)).all()
        assert o2.shape[0] == n


def test_fused_screen_frame_stacking():
    """num_frames=2 screen obs through the fused step == the XLA env_step:
    the last two ticks each contribute a frame (frame_index semantics,
    GridEnvironment.hpp:425-431)."""
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.screen import ScreenObsConfig
    from agarcl_tpu.ops.fused_step import fused_env_step
    from agarcl_tpu.vec import make_obs_fn

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    fn, nf = make_obs_fn(cfg, "screen",
                         ScreenObsConfig(screen_len=32, agent_view=True,
                                         num_frames=2))
    assert nf == 2
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(4, dtype=jnp.uint32) + 9)
    acts = jnp.tile(jnp.asarray([[0.7, -0.2, 0.0]], jnp.float32), (4, 1, 1))
    s_f, obs_f, r_f, d_f = fused_env_step(cfg, states, acts, obs_fn=fn,
                                          num_frames=nf, block_envs=4,
                                          interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=fn, num_frames=nf)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    assert obs_f.shape[1] == 2                     # (N, F, A, S, S, 4)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_x))
    # consecutive frames differ (the sim advanced between them)
    assert (np.asarray(obs_f[:, 0]) != np.asarray(obs_f[:, 1])).any()


def test_tick_emitted_obs_sections():
    """fused_engine_tick(grid_tab/screen_tab) emits the obs-kernel input
    sections from its post-tick VMEM state: grid sections must be
    bit-identical to _build_grid_table on the post-tick state, and the
    frames from both section sources must match exactly (screen sections
    are uncompacted, so only frames are compared there). Hardware twin:
    bench/tab_emit_tpu_check.py (grid +38.5% at 8192 envs)."""
    from agarcl_tpu.obs.grid import GridObsConfig
    from agarcl_tpu.obs.screen import ScreenObsConfig
    from agarcl_tpu.ops import fused_grid, fused_screen
    from agarcl_tpu.ops.fused_tick import fused_engine_tick

    for mode, bots in ((4, 0), (7, 1)):
        cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=120,
                        num_pellets=60, num_viruses=4, num_bots=bots,
                        reward_type=True, mode=mode)
        states = jax.vmap(functools.partial(env_reset, cfg))(
            jnp.arange(8, dtype=jnp.uint32) + 3)
        for _ in range(3):
            states = fused_engine_tick(cfg, states, 8, True, n_ticks=4)
        new_states, gsecs, ssecs = fused_engine_tick(
            cfg, states, 8, True, n_ticks=1, grid_tab=True, screen_tab=True)
        gref, _, _ = fused_grid._build_grid_table(cfg, 32, new_states,
                                                  sections=True)
        for k in gref:
            np.testing.assert_array_equal(
                np.asarray(gsecs[k]), np.asarray(gref[k]),
                err_msg=f"grid section {k} (mode {mode})")
        gocfg = GridObsConfig(grid_size=32)
        np.testing.assert_array_equal(
            np.asarray(fused_grid.fused_grid_frame_from_secs(
                cfg, gocfg, gsecs, block_envs=4, interpret=True)),
            np.asarray(fused_grid.fused_grid_frame(
                cfg, gocfg, new_states, block_envs=4, interpret=True)))
        socfg = ScreenObsConfig(screen_len=32, agent_view=True)
        np.testing.assert_array_equal(
            np.asarray(fused_screen.fused_screen_frame_from_secs(
                cfg, socfg, ssecs, block_envs=4, interpret=True)),
            np.asarray(fused_screen.fused_screen_frame(
                cfg, socfg, new_states, block_envs=4, interpret=True)))


@pytest.mark.parametrize("mode,bots", [(4, 0), (7, 1)])
def test_fused_multi_step_kernel_matches_stepwise(mode, bots):
    """The in-kernel multi-step (fused_env_multi_step: k env steps in ONE
    pallas call, actions applied in-kernel, per-step ram obs + step-info
    emission) must reproduce k sequential fused_env_step calls: obs,
    rewards, dones, and final state."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=bots,
                    reward_type=True, mode=mode)
    assert FS.supports_multi(cfg, "ram", False, False)
    ocfg = RamObsConfig()
    frame_fn = functools.partial(ram_frame, cfg, ocfg)
    N, K = 4, 3
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32) + 11)
    acts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (N, 1, 3)),
                       jnp.float32)
    acts = acts.at[..., 2].set(0.0)

    s_m, obs_m, r_m, d_m = FS.fused_env_multi_step(
        cfg, states, acts, K, obs_fn=frame_fn, block_envs=4, interpret=True)

    s_ref = states
    obs_l, r_l, d_l = [], [], []
    for _ in range(K):
        s_ref, o, r, d = FS.fused_env_step(cfg, s_ref, acts,
                                           obs_fn=frame_fn, num_frames=1,
                                           block_envs=4, interpret=True)
        obs_l.append(o)
        r_l.append(r)
        d_l.append(d)
    np.testing.assert_allclose(np.asarray(obs_m),
                               np.asarray(jnp.stack(obs_l)),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_m), np.asarray(jnp.stack(r_l)),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(d_m),
                                  np.asarray(jnp.stack(d_l)))
    np.testing.assert_array_equal(np.asarray(s_m.cell_mass),
                                  np.asarray(s_ref.cell_mass))
    np.testing.assert_array_equal(np.asarray(s_m.dones),
                                  np.asarray(s_ref.dones))
    compare(s_m, s_ref, "multi-step-kernel")


def test_fused_multi_step_kernel_mode3_done_accumulates():
    """done_on_max_mass (mode 3) must latch across the in-kernel steps the
    way the per-step dones carry does."""
    import agarcl_tpu.ops.fused_step as FS
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=0, num_bots=0, mode=3)
    assert FS.supports_multi(cfg, "none", False, False)
    N = 4
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32))
    states = states.replace(
        cell_mass=states.cell_mass.at[0, 0, 0].set(23500))
    acts = jnp.zeros((N, 1, 3), jnp.float32)
    s_m, obs_m, r_m, d_m = FS.fused_env_multi_step(
        cfg, states, acts, 3, obs_fn=None, block_envs=4, interpret=True)
    assert obs_m is None
    d = np.asarray(d_m)                      # (k, N, A)
    assert d[:, 0, 0].all()                  # latched every step
    assert not d[:, 1:, :].any()
    assert np.asarray(s_m.dones)[0, 0]


def test_vecenv_multi_step_uses_kernel_path():
    """VecEnv.multi_step on the fused backend routes eligible configs to
    fused_env_multi_step (gate check only — parity covered above)."""
    import agarcl_tpu.ops.fused_step as FS
    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=80,
                    num_pellets=20, num_viruses=0, num_bots=0, mode=4)
    assert FS.supports_multi(cfg, "ram", False, False)
    assert not FS.supports_multi(cfg, "ram", True, False)   # auto_reset
    assert not FS.supports_multi(cfg, "grid", False, False)
    assert not FS.supports_multi(
        EnvConfig(num_agents=1, num_bots=4, mode=0), "ram", False, False)


def test_fused_screen_multi_agent_parity():
    """Multi-agent screen frames (virtual env rows through the
    single-camera kernel, fused_screen._build_table(agents=A)) ==
    vmapped screen_frame per agent: each agent gets its own camera and
    main/other class split (obs/screen.py _class_map owner masks)."""
    from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
    from agarcl_tpu.ops.fused_screen import fused_screen_frame
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=2, ticks_per_step=4, arena_size=120,
                    num_pellets=60, num_viruses=4, num_bots=1, mode=7)
    ocfg = ScreenObsConfig(screen_len=32, agent_view=True)
    env = VecEnv(cfg, 4, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(21)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0], [-0.5, 0.3, 0.0]],
                                jnp.float32), (4, 1, 1))
    for _ in range(3):
        states, obs, r, d = env.step(states, acts)
    ref = jax.jit(jax.vmap(functools.partial(screen_frame, cfg, ocfg)))(
        states)
    got = fused_screen_frame(cfg, ocfg, states, block_envs=4,
                             interpret=True)
    assert got.shape == (4, 2) + ref.shape[2:]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the two agents' frames genuinely differ (different cameras)
    assert (np.asarray(got[:, 0]) != np.asarray(got[:, 1])).any()


def test_fused_grid_multi_agent_parity():
    """Multi-agent grid frames (virtual env rows,
    fused_grid._build_grid_table(agents=A)) == vmapped grid_frame: each
    agent gets its own view window, own-cells channel, and others
    min/max channels (obs/grid.py owner masks)."""
    from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
    from agarcl_tpu.ops.fused_grid import fused_grid_frame
    from agarcl_tpu.vec import VecEnv
    cfg = EnvConfig(num_agents=2, ticks_per_step=4, arena_size=120,
                    num_pellets=60, num_viruses=4, num_bots=1, mode=7)
    ocfg = GridObsConfig(grid_size=32)
    env = VecEnv(cfg, 4, obs_type="none", backend="xla", donate=False)
    states, _ = env.reset(23)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0], [-0.5, 0.3, 0.0]],
                                jnp.float32), (4, 1, 1))
    for _ in range(3):
        states, obs, r, d = env.step(states, acts)
    ref = jax.jit(jax.vmap(functools.partial(grid_frame, cfg, ocfg)))(
        states)
    got = fused_grid_frame(cfg, ocfg, states, block_envs=4, interpret=True)
    assert got.shape == (4, 2) + ref.shape[2:]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert (np.asarray(got[:, 0]) != np.asarray(got[:, 1])).any()


def test_fused_env_step_multi_agent_screen():
    """The full fused step with 2 agents + screen obs (per-agent tables
    through the Pallas rasterizer) == the vmapped XLA env_step."""
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.screen import ScreenObsConfig
    from agarcl_tpu.ops.fused_step import fused_env_step
    from agarcl_tpu.vec import make_obs_fn

    cfg = EnvConfig(num_agents=2, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    fn, nf = make_obs_fn(cfg, "screen",
                         ScreenObsConfig(screen_len=32, agent_view=True))
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(4, dtype=jnp.uint32) + 31)
    acts = jnp.tile(jnp.asarray([[0.7, -0.2, 0.0], [-0.6, 0.5, 0.0]],
                                jnp.float32), (4, 1, 1))
    s_f, obs_f, r_f, d_f = fused_env_step(cfg, states, acts, obs_fn=fn,
                                          num_frames=nf, block_envs=4,
                                          interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=fn, num_frames=nf)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_x))
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_x), atol=1e-4)


def test_fused_grid_frame_stacking():
    """num_frames=2 grid obs through the fused step == the XLA env_step
    (the num_frames gate on fused_grid was lifted; the step scan calls
    the rasterizer once per obs tick)."""
    from agarcl_tpu.env import env_step
    from agarcl_tpu.obs.grid import GridObsConfig
    from agarcl_tpu.ops.fused_step import fused_env_step
    from agarcl_tpu.vec import make_obs_fn

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0, mode=4)
    fn, nf = make_obs_fn(cfg, "grid",
                         GridObsConfig(grid_size=32, num_frames=2))
    assert nf == 2
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(4, dtype=jnp.uint32) + 9)
    acts = jnp.tile(jnp.asarray([[0.7, -0.2, 0.0]], jnp.float32), (4, 1, 1))
    s_f, obs_f, r_f, d_f = fused_env_step(cfg, states, acts, obs_fn=fn,
                                          num_frames=nf, block_envs=4,
                                          interpret=True)
    step_x = jax.jit(jax.vmap(functools.partial(
        env_step, cfg, obs_fn=fn, num_frames=nf)))
    s_x, obs_x, r_x, d_x = step_x(states, acts)
    assert obs_f.shape[1] == 2                     # (N, F, A, C, G, G)
    np.testing.assert_array_equal(np.asarray(obs_f), np.asarray(obs_x))
    assert (np.asarray(obs_f[:, 0]) != np.asarray(obs_f[:, 1])).any()


def test_resident_multi_step_parity():
    """The resident kernel-layout multi_step (ResidentState carrier, no
    GameState transposes between calls) produces the SAME obs, rewards,
    dones, and final state as the GameState-in/GameState-out path over
    several consecutive calls."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.vec import VecEnv

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0,
                    reward_type=True, mode=4)
    N, k = 4, 3
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32) + 5)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0]], jnp.float32),
                    (N, 1, 1))
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
    obs_fn = functools.partial(ram_frame, cfg, RamObsConfig())

    # reference: plain path, 2 consecutive calls
    s_ref = states
    ref = []
    for _ in range(2):
        s_ref, o, r, d = FS.fused_env_multi_step(cfg, s_ref, acts, k,
                                                 obs_fn=obs_fn,
                                                 block_envs=4,
                                                 interpret=True)
        ref.append((o, r, d))

    res = FS.to_resident(cfg, states)
    got = []
    for _ in range(2):
        res, o, r, d = FS.fused_env_multi_step_resident(
            cfg, res, acts, k, obs_fn=obs_fn, block_envs=4, interpret=True)
        got.append((o, r, d))
    for (o1, r1, d1), (o2, r2, d2) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    s_mat = FS.from_resident(cfg, states, res)
    for f in ("cell_pos", "cell_mass", "cell_alive", "pellet_key",
              "virus_pos", "food_pos", "ticks", "dones"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_ref, f)), np.asarray(getattr(s_mat, f)),
            err_msg=f)


def test_resident_multi_step_chunked_k():
    """k > 16 on the resident path chains <=10-step kernel calls inside
    one program; outputs equal k sequential 1-chunk calls."""
    import agarcl_tpu.ops.fused_step as FS
    from agarcl_tpu.vec import VecEnv

    cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                    num_pellets=40, num_viruses=2, num_bots=0,
                    reward_type=True, mode=4)
    N = 4
    env = VecEnv(cfg, N, obs_type="ram", backend="fused", donate=False,
                 block_envs=4)
    states = jax.vmap(functools.partial(env_reset, cfg))(
        jnp.arange(N, dtype=jnp.uint32) + 5)
    acts = jnp.tile(jnp.asarray([[0.6, -0.4, 0.0]], jnp.float32),
                    (N, 1, 1))
    from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
    obs_fn = functools.partial(ram_frame, cfg, RamObsConfig())

    res = FS.to_resident(cfg, states)
    o_parts, r_parts = [], []
    for ck in (10, 10, 3):
        res, o, r, d = FS.fused_env_multi_step_resident(
            cfg, res, acts, ck, obs_fn=obs_fn, block_envs=4,
            interpret=True)
        o_parts.append(np.asarray(o))
        r_parts.append(np.asarray(r))
    o_seq = np.concatenate(o_parts, axis=0)
    r_seq = np.concatenate(r_parts, axis=0)

    # same through the VecEnv chunking (one call, k=23) in interpret mode:
    # patch the kernel entry to interpret since VecEnv hardcodes False
    import agarcl_tpu.ops.fused_tick as FT
    orig = FT._multi_step_raw_core
    FT._multi_step_raw_core = functools.partial(orig.__wrapped__, interpret=True) \
        if hasattr(orig, "__wrapped__") else (
        lambda cfg_, raw, a_, n_, ro_, be_, interp_, loo_=0:
        orig(cfg_, raw, a_, n_, ro_, be_, True, loo_))
    try:
        res2 = FS.to_resident(cfg, states)
        res2, o2, r2, d2 = env.multi_step(res2, acts, 23)
    finally:
        FT._multi_step_raw_core = orig
    np.testing.assert_array_equal(o_seq, np.asarray(o2))
    np.testing.assert_allclose(r_seq, np.asarray(r2), atol=1e-5)
