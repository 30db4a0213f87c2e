"""Functional environment core: reset / step as pure jittable functions.

Mirrors BaseEnvironment
(/root/reference/environment/envs/BaseEnvironment.hpp:34-428): action
application, the ticks_per_step engine loop, per-mode respawn/termination, and
mass / delta-mass rewards. Observation generation is layered on top by
`agarcl_tpu.obs` (the reference's _partial_observation hooks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.engine import spawn as S
from agarcl_tpu.engine.tick import engine_tick
from agarcl_tpu.state import GameState, zero_state


def env_reset(cfg: EnvConfig, seed) -> GameState:
    """Fresh game: world init + one 25-mass (or agent_mass) cell per player
    (BaseEnvironment::reset, Engine::initialize_game/respawn)."""
    state = zero_state(cfg)
    seed = jnp.asarray(seed, jnp.uint32)
    state = state.replace(seed=seed)

    pellet_key = S.initial_pellets(cfg, seed)
    virus_pos, virus_alive = S.initial_viruses(cfg, seed)
    state = state.replace(pellet_key=pellet_key,
                          virus_pos=virus_pos, virus_alive=virus_alive)

    P = cfg.num_players
    pid = jnp.arange(P, dtype=jnp.int32)
    loc = S.respawn_location(cfg, state.pellet_xy_alive(cfg)[0], seed,
                             jnp.int32(-1), pid)
    mass0 = max(C.CELL_MIN_SIZE, cfg.mode_spec.agent_mass)

    cell_pos = state.cell_pos.at[:, 0, :].set(loc)
    cell_mass = state.cell_mass.at[:, 0].set(mass0)
    cell_alive = state.cell_alive.at[:, 0].set(True)
    cell_id = state.cell_id.at[:, 0].set(pid + 1)
    return state.replace(cell_pos=cell_pos, cell_mass=cell_mass,
                         cell_alive=cell_alive, cell_id=cell_id,
                         next_cell_id=jnp.int32(P + 1))


def apply_actions(cfg: EnvConfig, state: GameState, actions) -> GameState:
    """take_actions (BaseEnvironment.hpp:141-176): for each live agent,
    target = centroid + 10*(dx, dy), action = a. Dead agents are skipped.

    actions: (A, 3) float array — columns (dx, dy, act in {0,1,2}).
    """
    A = cfg.num_agents
    actions = jnp.asarray(actions, jnp.float32).reshape(A, 3)
    centroid = state.player_centroid()[:A]
    alive = state.player_alive()[:A]
    tgt = centroid + C.TARGET_ACTION_SCALE * actions[:, :2]
    act = actions[:, 2].astype(jnp.int32)
    new_target = state.target.at[:A].set(
        jnp.where(alive[:, None], tgt, state.target[:A]))
    new_action = state.action.at[:A].set(
        jnp.where(alive, act, state.action[:A]))
    return state.replace(target=new_target, action=new_action)


def respawn_players(cfg: EnvConfig, state: GameState, mask) -> GameState:
    """Engine::respawn for every masked player (Engine.hpp:119-137 +
    Player::kill, Player.hpp:75-88): all cells cleared, cooldowns/anti-team/
    elapsed reset, one fresh cell of max(25, agent_mass) at a random (or
    squared-layout) location."""
    P = cfg.num_players
    pid = jnp.arange(P, dtype=jnp.int32)
    loc = S.respawn_location(cfg, state.pellet_xy_alive(cfg)[0], state.seed,
                             state.ticks, pid)
    mass0 = max(C.CELL_MIN_SIZE, cfg.mode_spec.agent_mass)

    m = mask
    mc = m[:, None]
    order = jnp.cumsum(m.astype(jnp.int32)) - 1
    new_ids = state.next_cell_id + order

    slot0 = jnp.zeros((P,), jnp.int32)
    oh0 = (jnp.arange(state.max_cells) == slot0[:, None]) & mc

    return state.replace(
        cell_pos=jnp.where(oh0[..., None], loc[:, None, :], state.cell_pos),
        cell_vel=jnp.where(mc[..., None], 0.0, state.cell_vel),
        cell_split_vel=jnp.where(mc[..., None], 0.0, state.cell_split_vel),
        cell_mass=jnp.where(oh0, mass0, jnp.where(mc, 0, state.cell_mass)),
        cell_alive=jnp.where(mc, oh0, state.cell_alive),
        cell_id=jnp.where(oh0, new_ids[:, None], state.cell_id),
        cell_recombine_at=jnp.where(mc, 0, state.cell_recombine_at),
        next_cell_id=state.next_cell_id + jnp.sum(m).astype(jnp.int32),
        split_cooldown=jnp.where(m, 0, state.split_cooldown),
        feed_cooldown=jnp.where(m, 0, state.feed_cooldown),
        elapsed_ticks=jnp.where(m, 0, state.elapsed_ticks),
        last_decay_tick=jnp.where(m, 0, state.last_decay_tick),
        anti_team_decay=jnp.where(m, 1.0, state.anti_team_decay),
        virus_eaten_ticks=jnp.where(mc, -(2**30), state.virus_eaten_ticks),
        virus_eaten_ptr=jnp.where(m, 0, state.virus_eaten_ptr),
    )


def agent_masses(cfg: EnvConfig, state: GameState) -> jax.Array:
    """(A,) f32 masses of RL agents (BaseEnvironment::masses)."""
    return state.player_mass()[:cfg.num_agents].astype(jnp.float32)


def env_step(cfg: EnvConfig, state: GameState, actions,
             respawn_main_during_obs: bool = False, obs_fn=None,
             num_frames: int = 1):
    """One environment step (BaseEnvironment::step, hpp:89-122).

    Runs ticks_per_step engine ticks, applies per-mode respawn/termination,
    and returns (state, rewards (A,), dones (A,)) — or, when obs_fn is given,
    (state, obs, rewards, dones) where obs stacks one frame per each of the
    last num_frames ticks (frame_index = tick - (ticks_per_step - num_frames),
    GridEnvironment.hpp:425-431; see obs/grid.py for the pinned
    interpretation). obs frames have shape (num_frames, *frame_shape).

    respawn_main_during_obs: screen-env semantics
    (ScreenEnvironment.hpp:233-243) — a dead main player is respawned when the
    observation is taken and the step is charged c_death.
    """
    A = cfg.num_agents
    ms = cfg.mode_spec
    state = apply_actions(cfg, state, actions)
    before = agent_masses(cfg, state)
    state = state.replace(main_respawned=jnp.zeros((), bool))

    def body(s, _):
        return engine_tick(cfg, s), None

    obs = None
    if obs_fn is None:
        state, _ = jax.lax.scan(body, state, None,
                                length=cfg.ticks_per_step)
    else:
        F = min(num_frames, cfg.ticks_per_step)
        state, _ = jax.lax.scan(body, state, None,
                                length=cfg.ticks_per_step - F)

        def body_obs(s, _):
            s = engine_tick(cfg, s)
            return s, obs_fn(s)

        state, obs = jax.lax.scan(body_obs, state, None, length=F)
        if num_frames > F:  # pad leading frames with zeros (short steps)
            pad = jax.tree.map(
                lambda x: jnp.zeros((num_frames - F,) + x.shape[1:],
                                    x.dtype), obs)
            obs = jax.tree.map(
                lambda p, o: jnp.concatenate([p, o], axis=0), pad, obs)

    main_respawned = state.main_respawned
    if respawn_main_during_obs:
        main_dead = ~state.player_alive()[0]
        state = jax.lax.cond(
            main_dead,
            lambda s: respawn_players(
                cfg, s, jnp.arange(cfg.num_players) == 0),
            lambda s: s, state)
        main_respawned = main_respawned | main_dead
        state = state.replace(main_respawned=main_respawned)

    dones = state.dones
    if ms.respawn_all:  # mode 0
        dead = ~state.player_alive()
        state = jax.lax.cond(
            jnp.any(dead),
            lambda s: respawn_players(cfg, s, dead),
            lambda s: s, state)
    elif ms.done_on_death:  # modes 7-10 (BaseEnvironment.hpp:103-114)
        any_dead = jnp.any(~state.player_alive())
        dones = dones.at[0].set(any_dead | main_respawned)

    rewards = agent_masses(cfg, state)
    if ms.done_on_max_mass:  # mode 3 (BaseEnvironment.hpp:126-138)
        dones = dones.at[0].set(
            dones[0] | jnp.any(rewards >= C.MODE3_MAX_MASS))
    if cfg.reward_type:
        penalty = jnp.where(main_respawned, jnp.float32(cfg.c_death), 0.0)
        rewards = rewards - (before - penalty)

    state = state.replace(dones=dones)
    if obs_fn is None:
        return state, rewards, dones
    return state, obs, rewards, dones


@functools.partial(jax.jit, static_argnums=0)
def jit_env_reset(cfg: EnvConfig, seed) -> GameState:
    return env_reset(cfg, seed)


@functools.partial(jax.jit, static_argnums=(0, 3))
def jit_env_step(cfg: EnvConfig, state, actions,
                 respawn_main_during_obs: bool = False):
    return env_step(cfg, state, actions, respawn_main_during_obs)
