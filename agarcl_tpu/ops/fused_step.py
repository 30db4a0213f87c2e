"""Batched env-step built on the fused Pallas tick.

The XLA env_step (env.py) is written per-env and vmapped; the fused tick is
inherently batched (one pallas_call over the whole env batch), so this module
provides the batched composition: apply actions -> ticks_per_step fused
ticks -> observations -> per-mode respawn/termination -> rewards. The
env-level pieces stay XLA ops (they are tiny next to the tick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agarcl_tpu import constants as C
from agarcl_tpu.config import EnvConfig
from agarcl_tpu.env import apply_actions, respawn_players
from agarcl_tpu.ops.fused_tick import fused_engine_tick, supports
from agarcl_tpu.state import GameState


def fused_env_step(cfg: EnvConfig, states: GameState, actions,
                   obs_fn=None, num_frames: int = 1,
                   block_envs: int = 128, interpret: bool = False,
                   auto_reset: bool = False,
                   respawn_main_during_obs: bool = False):
    """One env step over a BATCH of envs via the fused tick kernel.

    states: vmapped GameState (leading axis N); actions (N, A, 3).
    Returns (states, obs|None, rewards (N, A), dones (N, A)). With
    auto_reset, envs whose done flag fires are replaced by fresh resets
    (seeds derived on device). respawn_main_during_obs applies the
    screen-env semantics (env.py:159-167, ScreenEnvironment.hpp:233-243):
    a dead main player is respawned after the obs ticks and the step is
    charged c_death.
    """
    assert supports(cfg)
    A = cfg.num_agents
    ms = cfg.mode_spec
    N = states.ticks.shape[0]

    states = jax.vmap(functools.partial(apply_actions, cfg))(states, actions)
    before = states.player_mass()[:, :A].astype(jnp.float32)
    states = states.replace(main_respawned=jnp.zeros((N,), bool))

    def tick(s):
        return fused_engine_tick(cfg, s, block_envs, interpret)

    F = min(num_frames, cfg.ticks_per_step) if obs_fn is not None else 0
    # ram obs merges into the tick kernel itself (fused_engine_tick's
    # ram_obs output): the whole step is then ONE kernel call per frame
    # group with no separate obs-kernel state read
    from agarcl_tpu.obs.ram import ram_frame
    ram_ocfg = (obs_fn.args[1]
                if (obs_fn is not None
                    and isinstance(obs_fn, functools.partial)
                    and obs_fn.func is ram_frame) else None)
    if ram_ocfg is not None and F >= 1:
        if F == 1:
            states, frame = fused_engine_tick(
                cfg, states, block_envs, interpret,
                n_ticks=cfg.ticks_per_step, ram_obs=ram_ocfg)
            obs = frame[:, None]                         # (N, 1, A, R)
        else:
            n_pre = cfg.ticks_per_step - F
            if n_pre > 0:
                states = fused_engine_tick(cfg, states, block_envs,
                                           interpret, n_ticks=n_pre)

            def body_ram(s, _):
                s, frame = fused_engine_tick(cfg, s, block_envs, interpret,
                                             ram_obs=ram_ocfg)
                return s, frame
            states, obs = jax.lax.scan(body_ram, states, None, length=F)
            obs = jnp.swapaxes(obs, 0, 1)                # (N, F, A, R)
        # match the vmapped XLA frame axis order (N, A?, ...) — ram obs is
        # (N, F, A, R); downstream (vec.py) expects the same shape the
        # batched_obs scan produced before: (N, F, A, R). Nothing to do.
        return _finish_step(cfg, states, obs, before, N, A, ms,
                            respawn_main_during_obs, auto_reset)

    # grid/screen frames: the tick kernel emits the obs-kernel input
    # sections itself (grid_tab/screen_tab) from its post-tick VMEM state,
    # so the XLA table build — +2.1 ms/step (grid, 8192 envs) / +1.5 ms/step
    # (screen, 2048 envs) of state transposes + masking
    # (bench/obs_table_probe.py) — never runs
    from agarcl_tpu.obs.grid import grid_frame as _gframe
    from agarcl_tpu.obs.screen import screen_frame as _sframe
    tab_kind = None
    if obs_fn is not None and isinstance(obs_fn, functools.partial):
        from agarcl_tpu.ops import fused_grid, fused_screen
        if (obs_fn.func is _gframe
                and fused_grid.supports_emit(cfg, obs_fn.args[1])):
            tab_kind = "grid"
        elif (obs_fn.func is _sframe and fused_screen.supports_emit(cfg)
                and (not obs_fn.args[1].polygon_edges
                     or fused_screen.supports_polygon(obs_fn.args[1]))):
            tab_kind = "screen"
    if tab_kind is not None and F >= 1:
        ocfg = obs_fn.args[1]
        tab_kw = {f"{tab_kind}_tab": True}
        if tab_kind == "grid":
            def secs_obs(secs):
                return fused_grid.fused_grid_frame_from_secs(
                    cfg, ocfg, secs, block_envs=32, interpret=interpret)
        else:
            def secs_obs(secs):
                return fused_screen.fused_screen_frame_from_secs(
                    cfg, ocfg, secs, block_envs=8, interpret=interpret)
        if F == 1:
            states, secs = fused_engine_tick(
                cfg, states, block_envs, interpret,
                n_ticks=cfg.ticks_per_step, **tab_kw)
            obs = jax.tree.map(lambda x: x[:, None], secs_obs(secs))
        else:
            n_pre = cfg.ticks_per_step - F
            if n_pre > 0:
                states = fused_engine_tick(cfg, states, block_envs,
                                           interpret, n_ticks=n_pre)

            def body_tab(s, _):
                s, secs = fused_engine_tick(cfg, s, block_envs, interpret,
                                            **tab_kw)
                return s, secs_obs(secs)
            states, obs = jax.lax.scan(body_tab, states, None, length=F)
            obs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs)
        return _finish_step(cfg, states, obs, before, N, A, ms,
                            respawn_main_during_obs, auto_reset)

    # all obs-free ticks run inside ONE multi-tick kernel: the state then
    # round-trips HBM once instead of once per tick (the round trip alone
    # is ~1 ms per kernel call at 8192 envs, bench/tick_ablate.py). For the
    # single-frame case the "obs tick" folds into the same chain — obs only
    # needs the state AFTER the last tick, so the step runs ONE kernel call
    # instead of two
    n_pre = cfg.ticks_per_step - (F if F > 1 else 0)
    if n_pre > 0:
        states = fused_engine_tick(cfg, states, block_envs, interpret,
                                   n_ticks=n_pre)
    obs = None
    if obs_fn is not None:
        # ram frames go through the env-in-lanes Pallas kernel (fused_obs):
        # the vmapped XLA ram_frame costs more than the four engine ticks
        # combined (top_k + gathers + trailing size-2 layout padding)
        from agarcl_tpu.obs.grid import grid_frame
        from agarcl_tpu.obs.ram import ram_frame
        from agarcl_tpu.obs.screen import screen_frame
        batched_obs = jax.vmap(obs_fn)
        if (isinstance(obs_fn, functools.partial)
                and obs_fn.func is ram_frame):
            from agarcl_tpu.ops.fused_obs import fused_ram_obs
            ocfg = obs_fn.args[1]
            def batched_obs(s):
                return fused_ram_obs(cfg, ocfg, s, block_envs, interpret)
        elif (isinstance(obs_fn, functools.partial)
                and obs_fn.func is screen_frame):
            # screen frames: per-env-block Pallas rasterizer (fused_screen).
            # Its kernel unrolls over the env block, so it uses its own
            # small block size, not the tick's.
            from agarcl_tpu.ops import fused_screen
            # (polygon_edges rides the kernel too when the config fits
            # its half-plane fan math — supports_polygon; wavy-virus
            # polygon configs stay on the XLA path)
            if fused_screen.supports(cfg) and (
                    not obs_fn.args[1].polygon_edges
                    or fused_screen.supports_polygon(obs_fn.args[1])):
                ocfg = obs_fn.args[1]
                def batched_obs(s):
                    return fused_screen.fused_screen_frame(
                        cfg, ocfg, s, block_envs=8, interpret=interpret)
        elif (isinstance(obs_fn, functools.partial)
                and obs_fn.func is grid_frame):
            # grid frames: per-env-block MXU binning kernel (fused_grid)
            from agarcl_tpu.ops import fused_grid
            if fused_grid.supports(cfg, obs_fn.args[1]):
                ocfg = obs_fn.args[1]
                def batched_obs(s):
                    # BE=32: the whole kernel compute hides under the output
                    # store DMA at this block size (grid_floor_probe: full ==
                    # empty == 3.46 ms at 8192 envs int16)
                    return fused_grid.fused_grid_frame(
                        cfg, ocfg, s, block_envs=32, interpret=interpret)

        if F == 1:
            # no scan and no separate obs-tick call (folded above);
            # expand_dims for the frame axis is free
            obs = jax.tree.map(lambda x: x[:, None],
                               batched_obs(states))
        else:
            def body_obs(s, _):
                s = tick(s)
                return s, batched_obs(s)
            states, obs = jax.lax.scan(body_obs, states, None, length=F)
            # obs: (F, N, ...) -> (N, F, ...) to match the vmapped XLA path
            obs = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), obs)

    return _finish_step(cfg, states, obs, before, N, A, ms,
                        respawn_main_during_obs, auto_reset)


def supports_multi(cfg: EnvConfig, obs_type: str, auto_reset: bool,
                   respawn_main_during_obs: bool) -> bool:
    """Whether VecEnv.multi_step can run as ONE in-kernel multi-step call
    (fused_tick.fused_multi_step_call). Requires: fused-tick-able config,
    ram/none obs (emitted in-kernel per step), and no between-step XLA work
    the kernel can't do — mode-0 respawn_all, screen-env main respawn, or
    auto_reset all need per-step state surgery outside the kernel."""
    return (supports(cfg) and obs_type in ("ram", "none")
            and not auto_reset and not respawn_main_during_obs
            and not cfg.mode_spec.respawn_all)


def fused_env_multi_step(cfg: EnvConfig, states: GameState, actions,
                         k: int, obs_fn=None, block_envs: int = 128,
                         interpret: bool = False):
    """k whole env steps in ONE tick-kernel call — the in-kernel multi-step
    (fused_tick._make_kernel n_steps docstring). Applies the same actions at
    the start of every step (the VecEnv.multi_step contract), runs
    ticks_per_step ticks per step, and emits the per-step RAM frame plus
    per-step (mass, alive) rows; this rim reconstructs the per-step
    rewards/dones exactly as _finish_step does (BaseEnvironment.hpp:89-122
    semantics). Gate with supports_multi().

    Returns (states, obs (k, N, 1, A, R) | None, rewards (k, N, A),
    dones (k, N, A)) — the same stacking VecEnv's unrolled path produces.
    """
    from agarcl_tpu.obs.ram import ram_frame
    from agarcl_tpu.ops.fused_tick import fused_multi_step_call
    A = cfg.num_agents
    ms = cfg.mode_spec
    N = states.ticks.shape[0]
    ram_ocfg = (obs_fn.args[1]
                if (obs_fn is not None
                    and isinstance(obs_fn, functools.partial)
                    and obs_fn.func is ram_frame) else None)

    before0 = states.player_mass()[:, :A].astype(jnp.float32)    # (N, A)
    states = states.replace(main_respawned=jnp.zeros((N,), bool))
    states, obs, step_mass, step_alive = fused_multi_step_call(
        cfg, states, actions, k, ram_ocfg, block_envs, interpret)

    mass_a = step_mass[:, :, :A]                                 # (N, k, A)
    dones = jnp.broadcast_to(states.dones[:, None], (N, k, A))
    if ms.done_on_death:
        any_dead = jnp.any(~step_alive, axis=2)                  # (N, k)
        dones = dones.at[:, :, 0].set(any_dead)
    if ms.done_on_max_mass:
        # per-step accumulation through the state's dones carry
        # (_finish_step ORs into dones[:, 0] each step)
        hit = jnp.any(mass_a >= C.MODE3_MAX_MASS, axis=2)        # (N, k)
        cum = jnp.cumsum(hit.astype(jnp.int32), axis=1) > 0
        dones = dones.at[:, :, 0].set(dones[:, :, 0] | cum)

    rewards = mass_a
    if cfg.reward_type:
        prev = jnp.concatenate([before0[:, None], mass_a[:, :-1]], axis=1)
        rewards = mass_a - prev

    states = states.replace(dones=dones[:, -1])
    obs_out = (None if obs is None
               else jnp.swapaxes(obs, 0, 1)[:, :, None])         # (k,N,1,A,R)
    return (states, obs_out, jnp.swapaxes(rewards, 0, 1),
            jnp.swapaxes(dones, 0, 1))


from flax import struct


@struct.dataclass
class ResidentState:
    """Kernel-layout env state resident between multi_step calls.

    The GameState <-> kernel-layout transposes cost ~5.6 ms per
    multi-step call at 8192 envs (more than the 40 ticks of compute they
    wrap, bench/ms_block_probe.py); this carrier keeps the state as the
    raw `_to_kernel_arrays` tuple so consecutive VecEnv.multi_step calls
    never transpose. `last_mass` carries the previous step's post-step
    per-agent masses (the rim's `before` for delta-mass rewards) and
    `dones` the latched per-agent flags — the only GameState fields the
    multi-step rim reads. Materialize a full GameState with
    VecEnv.materialize()."""
    raw: tuple
    last_mass: jax.Array     # (N, A) f32
    dones: jax.Array         # (N, A) bool


def to_resident(cfg: EnvConfig, states: GameState) -> ResidentState:
    from agarcl_tpu.ops.fused_tick import _to_kernel_arrays
    A = cfg.num_agents
    return ResidentState(
        raw=tuple(_to_kernel_arrays(states)),
        last_mass=states.player_mass()[:, :A].astype(jnp.float32),
        dones=states.dones)


def from_resident(cfg: EnvConfig, template: GameState,
                  resident: ResidentState) -> GameState:
    """Materialize a GameState (template supplies the non-kernel fields
    and shapes; its array contents are ignored for kernel-carried
    fields)."""
    from agarcl_tpu.ops.fused_tick import _from_kernel_arrays
    out = _from_kernel_arrays(template, list(resident.raw))
    return out.replace(dones=resident.dones)


def fused_env_multi_step_resident(cfg: EnvConfig, resident: ResidentState,
                                  actions, k: int, obs_fn=None,
                                  block_envs: int = 128,
                                  interpret: bool = False):
    """fused_env_multi_step on resident kernel-layout state: the same
    rim (rewards/dones reconstruction, BaseEnvironment.hpp:89-122
    semantics) but no state transposes on either side of the kernel.
    Gate with supports_multi()."""
    from agarcl_tpu.obs.ram import ram_frame
    from agarcl_tpu.ops.fused_tick import _multi_step_raw_core
    A = cfg.num_agents
    P = cfg.num_players
    ms = cfg.mode_spec
    N = resident.last_mass.shape[0]
    ram_ocfg = (obs_fn.args[1]
                if (obs_fn is not None
                    and isinstance(obs_fn, functools.partial)
                    and obs_fn.func is ram_frame) else None)

    raw_out, obs_raw, info_raw = _multi_step_raw_core(
        cfg, resident.raw, actions, k, ram_ocfg, block_envs, interpret)

    si = jnp.transpose(info_raw).reshape(N, k, 2, P)
    mass_a = si[:, :, 0, :A]                                 # (N, k, A)
    step_alive = si[:, :, 1, :] > 0.0                        # (N, k, P)

    dones = jnp.broadcast_to(resident.dones[:, None], (N, k, A))
    if ms.done_on_death:
        any_dead = jnp.any(~step_alive, axis=2)              # (N, k)
        dones = dones.at[:, :, 0].set(any_dead)
    if ms.done_on_max_mass:
        hit = jnp.any(mass_a >= C.MODE3_MAX_MASS, axis=2)
        cum = jnp.cumsum(hit.astype(jnp.int32), axis=1) > 0
        dones = dones.at[:, :, 0].set(dones[:, :, 0] | cum)

    rewards = mass_a
    if cfg.reward_type:
        prev = jnp.concatenate([resident.last_mass[:, None],
                                mass_a[:, :-1]], axis=1)
        rewards = mass_a - prev

    obs = None
    if obs_raw is not None:
        R = obs_raw.shape[0] // (k * A)
        obs = jnp.swapaxes(
            jnp.transpose(obs_raw).reshape(N, k, A, R), 0, 1)[:, :, None]
    new_res = ResidentState(raw=raw_out, last_mass=mass_a[:, -1],
                            dones=dones[:, -1])
    return (new_res, obs, jnp.swapaxes(rewards, 0, 1),
            jnp.swapaxes(dones, 0, 1))


def _finish_step(cfg, states, obs, before, N, A, ms,
                 respawn_main_during_obs, auto_reset):
    """Post-obs step tail shared by the merged-ram and generic paths:
    respawn/termination per mode, rewards, auto-reset."""
    if respawn_main_during_obs:
        main_dead = ~states.player_alive()[:, 0]         # (N,)
        mask = main_dead[:, None] & (
            jnp.arange(cfg.num_players) == 0)[None, :]   # (N, P)
        states = jax.vmap(functools.partial(respawn_players, cfg))(states,
                                                                   mask)
        states = states.replace(
            main_respawned=states.main_respawned | main_dead)

    dones = states.dones
    if ms.respawn_all:
        dead = ~states.player_alive()                    # (N, P)
        states = jax.vmap(functools.partial(respawn_players, cfg))(states,
                                                                   dead)
    elif ms.done_on_death:
        any_dead = jnp.any(~states.player_alive(), axis=1)
        dones = dones.at[:, 0].set(any_dead | states.main_respawned)

    rewards = states.player_mass()[:, :A].astype(jnp.float32)
    if ms.done_on_max_mass:
        dones = dones.at[:, 0].set(
            dones[:, 0] | jnp.any(rewards >= C.MODE3_MAX_MASS, axis=1))
    if cfg.reward_type:
        penalty = jnp.where(states.main_respawned,
                            jnp.float32(cfg.c_death), 0.0)[:, None]
        rewards = rewards - (before - penalty)

    states = states.replace(dones=dones)
    if auto_reset:
        from agarcl_tpu import prng
        from agarcl_tpu.env import env_reset
        done_env = jnp.any(dones, axis=1)                # (N,)
        reset_seed = prng.hash_u32(states.seed, 7,
                                   states.ticks.astype(jnp.uint32), 0, 0)
        fresh = jax.vmap(functools.partial(env_reset, cfg))(reset_seed)
        states = jax.tree.map(
            lambda f, s: jnp.where(
                done_env.reshape((-1,) + (1,) * (s.ndim - 1)), f, s),
            fresh, states)
    return states, obs, rewards, dones
