"""Batched (vmapped) environments — the TPU replacement for the reference's
one-process-one-game model and its ThreadPool bot evaluator
(/root/reference/agario/bots/benchmark.cpp:134-171, SURVEY §2 item 7).

Thousands of lockstep games run per chip under one jit; `parallel.mesh`
shards the env axis across chips/hosts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.env import env_reset, env_step
from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
from agarcl_tpu.state import GameState


def make_obs_fn(cfg: EnvConfig, obs_type: str, obs_config=None):
    """Returns (frame_fn, num_frames) for an observation type
    ('none' | 'ram' | 'grid' | 'screen' | 'gobigger')."""
    if obs_type == "none":
        return None, 1
    if obs_type == "ram":
        ocfg = obs_config or RamObsConfig()
        return functools.partial(ram_frame, cfg, ocfg), 1
    if obs_type == "grid":
        ocfg = obs_config or GridObsConfig()
        return functools.partial(grid_frame, cfg, ocfg), ocfg.num_frames
    if obs_type == "screen":
        from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
        ocfg = obs_config or ScreenObsConfig()
        return functools.partial(screen_frame, cfg, ocfg), ocfg.num_frames
    if obs_type == "gobigger":
        # structured dict frame (a pytree of fixed-shape arrays + masks) —
        # vmaps/scan-stacks like any tensor obs; use
        # obs.gobigger.batch_player_states for the host-side rim conversion
        from agarcl_tpu.obs.gobigger import GoBiggerObsConfig, gobigger_frame
        ocfg = obs_config or GoBiggerObsConfig()
        return functools.partial(gobigger_frame, cfg, ocfg), 1
    raise ValueError(f"unknown obs_type {obs_type!r}")


class VecEnv:
    """N lockstep environments, jitted + vmapped.

    reset(seed) -> (obs, states); step(states, actions) ->
    (states, obs, rewards, dones). actions: (N, A, 3) float (dx, dy, act).
    With auto_reset=True, finished envs are re-seeded and reset in-step
    (episodic training loops); otherwise dones pass through (continual RL,
    the reference's default for gym env_type != 0).
    """

    def __init__(self, cfg: EnvConfig, num_envs: int, obs_type: str = "ram",
                 obs_config=None, auto_reset: bool = False,
                 respawn_main_during_obs: bool = False, donate: bool = True,
                 backend: str = "xla", block_envs: int = 128):
        """backend: "xla" (vmapped op-graph tick, any config) or "fused"
        (single-Pallas-kernel tick — rosters up to 9 players on TPU;
        4-70x the XLA path's throughput depending on roster size)."""
        self.cfg = cfg
        self.num_envs = num_envs
        self.obs_type = obs_type
        frame_fn, num_frames = make_obs_fn(cfg, obs_type, obs_config)
        self._frame_fn = frame_fn
        self.num_frames = num_frames
        self.auto_reset = auto_reset
        self.respawn_main_during_obs = respawn_main_during_obs
        self.backend = backend
        if backend == "fused":
            from agarcl_tpu.ops.fused_tick import supports
            assert supports(cfg), \
                "fused backend requires num_players <= 9"

        def _reset_one(seed):
            return env_reset(cfg, seed)

        def _step_one(state, actions):
            out = env_step(cfg, state, actions,
                           respawn_main_during_obs=respawn_main_during_obs,
                           obs_fn=frame_fn, num_frames=num_frames)
            if frame_fn is None:
                state, rewards, dones = out
                obs = None
            else:
                state, obs, rewards, dones = out
            if auto_reset:
                done_all = jnp.any(dones)
                # derive the fresh seed on device (no host transfer per step)
                from agarcl_tpu import prng
                reset_seed = prng.hash_u32(state.seed, 7,
                                           state.ticks.astype(jnp.uint32),
                                           0, 0)
                fresh = env_reset(cfg, reset_seed)
                state = jax.tree.map(
                    lambda f, s: jnp.where(
                        jnp.reshape(done_all, (1,) * s.ndim), f, s),
                    fresh, state)
            return state, obs, rewards, dones

        self._reset_b = jax.jit(jax.vmap(_reset_one))
        if backend == "fused":
            from agarcl_tpu.ops.fused_step import fused_env_step

            def step_b(s, a):
                return fused_env_step(
                    cfg, s, a, obs_fn=frame_fn, num_frames=num_frames,
                    block_envs=block_envs, auto_reset=auto_reset,
                    respawn_main_during_obs=respawn_main_during_obs)
        else:
            step_b = jax.vmap(_step_one, in_axes=(0, 0))
        self._step_b = jax.jit(step_b, donate_argnums=(0,) if donate else ())
        self._obs_b = (jax.jit(jax.vmap(frame_fn))
                       if frame_fn is not None else None)

        def _multi_step(states, actions, k, stack_obs=True):
            # chain k env-steps inside one program (amortizes dispatch; the
            # shape a fused actor-learner loop would use). obs is stacked
            # per step — keeping it in the output forces it to be computed
            # every step (discarding it would let XLA dead-code the whole
            # observation path and overstate throughput).
            if backend == "fused":
                from agarcl_tpu.ops.fused_step import (
                    ResidentState, fused_env_multi_step,
                    fused_env_multi_step_resident, supports_multi)
                if isinstance(states, ResidentState):
                    # a ResidentState can only come from make_resident(),
                    # which asserts eligibility; re-check here so a
                    # hand-constructed or stale carrier fails loudly
                    # instead of silently dropping per-step semantics
                    assert supports_multi(cfg, obs_type, auto_reset,
                                          respawn_main_during_obs), \
                        "resident multi_step on an ineligible config"
                    # resident kernel-layout state (no GameState
                    # transposes); large k runs as chained <=10-step
                    # kernel calls INSIDE this one program — one host
                    # dispatch per k steps (the dispatch+glue costs
                    # ~5 ms/call through the TPU tunnel,
                    # bench/ms_block_probe.py)
                    chunks = []
                    left = k
                    while left > 0:
                        chunks.append(min(left, 10))
                        left -= chunks[-1]
                    outs = []
                    res = states
                    for ck in chunks:
                        res, o, r, d = fused_env_multi_step_resident(
                            cfg, res, actions, ck, obs_fn=frame_fn,
                            block_envs=block_envs)
                        outs.append((o, r, d))
                    if len(outs) == 1:
                        o, r, d = outs[0]
                    else:
                        o = (None if outs[0][0] is None else
                             jnp.concatenate([x[0] for x in outs], axis=0))
                        r = jnp.concatenate([x[1] for x in outs], axis=0)
                        d = jnp.concatenate([x[2] for x in outs], axis=0)
                    return res, o, r, d
                if (supports_multi(cfg, obs_type, auto_reset,
                                   respawn_main_during_obs)
                        and k <= 16):
                    # ONE kernel call for all k steps: the per-call state
                    # HBM round trip (~0.76 ms at 8192 envs) amortizes /k
                    return fused_env_multi_step(cfg, states, actions, k,
                                                obs_fn=frame_fn,
                                                block_envs=block_envs)
            if backend == "fused" and k <= 16:
                # python unroll (the op-graph backend keeps the scan; the
                # scan's stacked carry copies cost ~0.3 ms/step at 8192
                # envs). stack_obs=False returns the k per-step frames as
                # a TUPLE instead of one stacked array: jnp.stack of k
                # pallas outputs is a real k*frame HBM copy (the kernel
                # cannot write into a concatenate's offset) — measured
                # ~3.5 ms/step on the 1.07-GB int32 grid frame, the whole
                # gap between the grid e2e rate and its store-floor.
                fr, rs, ds = [], [], []
                s = states
                for _ in range(k):
                    s, obs, rewards, dones = step_b(s, actions)
                    fr.append(obs)
                    rs.append(rewards)
                    ds.append(dones)
                if fr[0] is None:
                    obs = None
                elif stack_obs:
                    obs = jax.tree.map(lambda *x: jnp.stack(x), *fr)
                else:
                    obs = tuple(fr)
                return s, obs, jnp.stack(rs), jnp.stack(ds)

            def body(s, _):
                s, obs, rewards, dones = step_b(s, actions)
                return s, (obs, rewards, dones)
            states, (obs, rewards, dones) = jax.lax.scan(
                body, states, None, length=k)
            return states, obs, rewards, dones

        self._multi_step = jax.jit(_multi_step, static_argnums=(2, 3),
                                   donate_argnums=(0,) if donate else ())

    def reset(self, seed: int = 0):
        seeds = jnp.arange(self.num_envs, dtype=jnp.uint32) + jnp.uint32(
            (seed * 0x9E3779B9) & 0xFFFFFFFF)
        states = self._reset_b(seeds)
        obs = self._obs_b(states) if self._obs_b is not None else None
        self._episode = 0
        return states, obs

    def step(self, states: GameState, actions):
        """actions: (N, A, 3). Returns (states, obs, rewards, dones)."""
        return self._step_b(states, jnp.asarray(actions, jnp.float32))

    def multi_step(self, states, actions, k: int, stack_obs: bool = True):
        """Run k env-steps in one device program with the same actions —
        the dispatch-amortized path for throughput-critical loops.
        Returns (states, obs (k, N, ...) or None, rewards (k, N, A),
        dones (k, N, A)); obs is produced every step (never dead-coded).
        stack_obs=False (fused python-unroll path only) returns obs as a
        k-tuple of per-step frames instead — skipping the k*frame stack
        copy, which dominates the glue cost for GB-scale grid/screen
        frames; per-step consumers (rollout loops) should prefer it.
        `states` may be a GameState or the ResidentState carrier from
        make_resident()/a previous resident multi_step call."""
        return self._multi_step(states, jnp.asarray(actions, jnp.float32),
                                k, stack_obs)

    def supports_resident(self) -> bool:
        """Whether multi_step can run on resident kernel-layout state
        (fused backend + in-kernel multi-step eligibility; any k — large
        k chains <=10-step kernel calls inside one program)."""
        from agarcl_tpu.ops.fused_step import supports_multi
        return (self.backend == "fused"
                and supports_multi(self.cfg, self.obs_type,
                                   self.auto_reset,
                                   self.respawn_main_during_obs))

    def make_resident(self, states: GameState):
        """GameState -> ResidentState (kernel layout, one-time
        transpose); keeps `states` as the materialization template."""
        assert self.supports_resident(), \
            ("resident state requires the fused backend and an in-kernel "
             "multi-step-eligible config (ram/none obs, no auto_reset, "
             "no respawn_main_during_obs, no mode-0 respawn_all)")
        from agarcl_tpu.ops.fused_step import to_resident
        self._resident_template = states
        return jax.jit(functools.partial(to_resident, self.cfg))(states)

    def materialize(self, states):
        """ResidentState (or GameState) -> GameState."""
        from agarcl_tpu.ops.fused_step import ResidentState, from_resident
        if not isinstance(states, ResidentState):
            return states
        return jax.jit(functools.partial(from_resident, self.cfg))(
            self._resident_template, states)
