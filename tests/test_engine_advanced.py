"""Deeper engine-path tests: virus feeding chains, anti-team decay,
auto-split, frame stacking — the mechanics the reference never tested
(SURVEY §4 gaps)."""

import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig
from agarcl_tpu import constants as C

from tests.helpers import BASE, reset, step_fn, tick_fn
from tests.test_engine_basic import kill_entities, no_regen_tick


def test_virus_feeding_chain_bursts():
    """7 accumulated food hits burst the virus: mass resets to 100 and a new
    virus launches along the food's direction (Engine.hpp:661-687)."""
    s = kill_entities(reset(BASE, 0), viruses=False)
    s = no_regen_tick(s)
    vpos = jnp.array([50.0, 50.0])
    s = s.replace(
        cell_pos=s.cell_pos.at[0, 0].set(jnp.array([5.0, 5.0])),
        target=s.target.at[0].set(jnp.array([5.0, 5.0])),
        virus_pos=s.virus_pos.at[0].set(vpos),
        virus_alive=jnp.zeros_like(s.virus_alive).at[0].set(True),
        virus_hits=s.virus_hits.at[0].set(6),   # one hit from bursting
        virus_mass=s.virus_mass.at[0].set(160))
    # moving foods shot at the virus; first one hits and increments to 7,
    # next tick a second food pushes it over -> burst
    fpos = jnp.stack([vpos - jnp.array([3.0, 0.0]),
                      vpos - jnp.array([6.0, 0.0])])
    fvel = jnp.broadcast_to(jnp.array([100.0, 0.0]), (2, 2))
    s = s.replace(food_pos=s.food_pos.at[:2].set(fpos),
                  food_vel=s.food_vel.at[:2].set(fvel),
                  food_alive=s.food_alive.at[:2].set(True))
    tick = tick_fn(BASE)
    for _ in range(3):
        s = tick(s)
    # burst: original virus back at 100 mass with hits 0, plus a new virus
    assert int(jnp.sum(s.virus_alive)) == 2
    assert int(s.virus_mass[0]) == C.VIRUS_INITIAL_MASS
    assert int(s.virus_hits[0]) == 0
    assert int(jnp.sum(s.food_alive)) == 0


def test_anti_team_accelerates_decay():
    """Eating 2+ viruses within the window sets anti_team = 1.1^(n-1) and
    speeds mass decay (Engine.hpp:550-584)."""
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=50, num_viruses=3, num_bots=0, mode=0)
    s = kill_entities(reset(cfg, 0))
    s = no_regen_tick(s)
    s = s.replace(
        cell_mass=s.cell_mass.at[0, 0].set(10000),
        elapsed_ticks=s.elapsed_ticks.at[0].set(59),
        virus_eaten_ticks=s.virus_eaten_ticks.at[0, 0].set(30).at[0, 1]
        .set(40).at[0, 2].set(50),
        virus_eaten_ptr=s.virus_eaten_ptr.at[0].set(3))
    s2 = tick_fn(cfg)(s)
    at = float(s2.anti_team_decay[0])
    assert abs(at - 1.1 ** 2) < 1e-5
    expected = int(10000 * (1 - 0.002 * 1.1 ** 2))
    assert int(s2.cell_mass[0, 0]) == expected


def test_auto_split_at_max_mass():
    s = kill_entities(reset(BASE, 0))
    s = no_regen_tick(s)
    s = s.replace(cell_mass=s.cell_mass.at[0, 0].set(C.MAX_MASS_IN_THE_GAME),
                  cell_pos=s.cell_pos.at[0, 0].set(jnp.array([50.0, 50.0])))
    s2 = tick_fn(BASE)(s)
    assert int(jnp.sum(s2.cell_alive[0])) == 2
    masses = np.asarray(s2.cell_mass[0])[np.asarray(s2.cell_alive[0])]
    assert masses.sum() == C.MAX_MASS_IN_THE_GAME
    assert set(masses) == {C.MAX_MASS_IN_THE_GAME // 2}


def test_auto_split_clamps_at_cell_limit():
    """A full-capacity player at max mass clamps to 22000 instead
    (Engine.hpp:592-601)."""
    s = kill_entities(reset(BASE, 0))
    s = no_regen_tick(s)
    P, Cc = s.cell_mass.shape
    pos = jnp.tile(jnp.array([[50.0, 50.0]]), (Cc, 1)) + \
        jnp.arange(Cc, dtype=jnp.float32)[:, None] * 8.0
    s = s.replace(
        cell_pos=s.cell_pos.at[0].set(pos),
        cell_mass=s.cell_mass.at[0].set(
            jnp.full((Cc,), C.MAX_MASS_IN_THE_GAME, jnp.int32)),
        cell_alive=s.cell_alive.at[0].set(jnp.ones((Cc,), bool)),
        cell_id=s.cell_id.at[0].set(jnp.arange(Cc, dtype=jnp.int32) + 1),
        cell_recombine_at=s.cell_recombine_at.at[0].set(
            jnp.full((Cc,), 10**6, jnp.int32)))
    s2 = tick_fn(BASE)(s)
    live_mass = np.asarray(s2.cell_mass[0])[np.asarray(s2.cell_alive[0])]
    assert (live_mass <= C.MAX_MASS_IN_THE_GAME).all()
    assert (live_mass == C.NEW_MASS_IF_NO_SPLIT).any()


def test_grid_frame_stacking():
    """num_frames=2: the step captures the last 2 ticks as separate frames."""
    from agarcl_tpu.gym_env import AgarioEnv
    env = AgarioEnv(obs_type="grid", arena_size=100, num_pellets=30,
                    num_viruses=0, num_bots=0, mode=3, grid_size=16,
                    num_frames=2)
    obs, _ = env.reset(seed=1)
    C_per = 8
    assert obs.shape == (16, 16, 2 * C_per)
    obs, r, d, t, info = env.step(((1.0, 0.0), 0))
    assert obs.shape == (16, 16, 2 * C_per)
    # both frames have OOB content (arena smaller than padded view)
    f0, f1 = obs[..., :C_per], obs[..., C_per:]
    assert (f0[..., 0] == -1).any() or (f1[..., 0] == -1).any()


def test_respawn_all_mode0():
    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                    num_pellets=50, num_viruses=3, num_bots=2, mode=0)
    s = reset(cfg, 0)
    # kill everyone
    s = s.replace(cell_alive=jnp.zeros_like(s.cell_alive))
    s, r, d = step_fn(cfg)(s, jnp.array([[0.0, 0.0, 0.0]]))
    assert bool(jnp.all(s.player_alive()))
    assert int(s.player_mass().min()) == C.CELL_MIN_SIZE
    assert not bool(d[0])


def test_same_tick_double_burst_single_spawn():
    """Two viruses reaching their 7th food hit in the SAME tick: both reset
    to mass 100, but only ONE spawn fires (the lowest-slot burster, using
    its lowest-index hitting food's pre-deceleration velocity) — the pinned
    one-spawn-per-tick cap (SPEC, engine/eating.py vs Engine.hpp:661-687
    which would spawn per burst)."""
    import jax

    from agarcl_tpu.engine import eating as E
    from agarcl_tpu.engine import geometry as G

    Nf, Nv = 8, 4
    W = H = 200.0
    dt = 1.0 / 30.0
    # viruses 0 and 1 live at 7 hits (one more hit bursts); slot 2 dead
    # (the free spawn slot); slot 3 live and unfed
    virus_pos = jnp.array([[50.0, 50.0], [150.0, 50.0],
                           [0.0, 0.0], [100.0, 150.0]], jnp.float32)
    virus_vel = jnp.zeros((Nv, 2), jnp.float32)
    virus_mass = jnp.array([170, 170, 0, 100], jnp.int32)
    virus_hits = jnp.array([7, 7, 0, 0], jnp.int32)
    virus_alive = jnp.array([True, True, False, True])
    # moving foods 1 and 3 sit on viruses 0 and 1 (food 0 is a live but
    # non-moving decoy so slot order != hit order)
    food_pos = jnp.zeros((Nf, 2), jnp.float32)
    food_pos = food_pos.at[0].set(jnp.array([10.0, 10.0]))
    food_pos = food_pos.at[1].set(virus_pos[0])
    food_pos = food_pos.at[3].set(virus_pos[1])
    food_vel = jnp.zeros((Nf, 2), jnp.float32)
    food_vel = food_vel.at[1].set(jnp.array([3.0, 0.0]))
    food_vel = food_vel.at[3].set(jnp.array([0.0, -2.0]))
    food_alive = jnp.zeros((Nf,), bool).at[0].set(True).at[1].set(
        True).at[3].set(True)

    (f_pos, f_vel, f_alive, v_pos, v_vel, v_mass, v_hits,
     v_alive) = jax.jit(E.move_foods_and_feed_viruses)(
        food_pos, food_vel, food_alive, virus_pos, virus_vel, virus_mass,
        virus_hits, virus_alive, W, H, dt, jnp.int32(2))

    v_mass, v_hits, v_alive = map(np.asarray, (v_mass, v_hits, v_alive))
    # both bursters reset: hits 7+1-8=0, mass 100
    assert v_hits[0] == 0 and v_hits[1] == 0
    assert v_mass[0] == C.VIRUS_INITIAL_MASS
    assert v_mass[1] == C.VIRUS_INITIAL_MASS
    # both hitting foods consumed, decoy alive
    assert not np.asarray(f_alive)[1] and not np.asarray(f_alive)[3]
    assert np.asarray(f_alive)[0]
    # exactly ONE spawn: dead slot 2 comes alive, nothing else appears
    assert np.asarray(v_alive).tolist() == [True, True, True, True]
    assert v_mass[2] == C.VIRUS_INITIAL_MASS and v_hits[2] == 0
    # the spawn belongs to the lowest-slot burster (virus 0): it launched
    # along food 1's PRE-deceleration velocity from virus 0's position
    spawn = np.asarray(v_pos)[2]
    expect = np.asarray(virus_pos)[0] + np.asarray([3.0, 0.0]) * dt * 10.0
    rad100 = float(np.asarray(G.radius(jnp.float32(C.VIRUS_INITIAL_MASS))))
    expect[0] = min(max(expect[0], rad100), W - rad100)
    expect[1] = min(max(expect[1], rad100), H - rad100)
    np.testing.assert_allclose(spawn, expect, rtol=1e-6)
    assert np.allclose(np.asarray(v_vel)[2], [3.0, 0.0])
