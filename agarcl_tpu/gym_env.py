"""Gymnasium-compatible single-environment wrapper.

API-parity port surface of gym_agario.AgarioEnv
(/root/reference/gym_agario/AgarioEnv.py:46-404):
- obs types: "ram" (implemented here even though the reference only declares
  it), "grid", "screen", "gobigger"
- action space Tuple(Box(-1,1,(2,)), Discrete(3))
- multi-agent list protocol (AgarioEnv.py:17-35)
- episodic cutoff `number_steps` when env_type == 0 (AgarioEnv.py:111-113)
- difficulty presets normal/empty/trivial (AgarioEnv.py:298-363)
- seed / save_env_state / load_env_state / video recording

Quirks intentionally fixed (SURVEY "quirks catalog"): the reference's grid
path crashes on an undefined variable (AgarioEnv.py:226) and lets defaults
override user kwargs; its action noise is computed then discarded
(AgarioEnv.py:282-296) — we implement add_noise for real but default it off
to preserve effective behavior.
"""

from __future__ import annotations

import functools

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.env import env_reset, env_step
from agarcl_tpu.io.snapshot import load_env_state as _load_snapshot
from agarcl_tpu.io.snapshot import save_env_state as _save_snapshot
from agarcl_tpu.obs.grid import GridObsConfig, grid_frame
from agarcl_tpu.obs.ram import RamObsConfig, ram_frame, ram_size

_DIFFICULTY = {
    "normal": dict(arena_size=1000, num_pellets=1000, num_viruses=0,
                   num_bots=0),
    "empty": dict(arena_size=1000, num_pellets=1000, num_viruses=0,
                  num_bots=0),
    "trivial": dict(arena_size=50, num_pellets=200, num_viruses=0,
                    num_bots=0),
}


class AgarioEnv(gym.Env):
    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 60}

    def __init__(self, obs_type="grid", render_mode=None, **kwargs):
        super().__init__()
        if obs_type not in ("ram", "screen", "grid", "gobigger"):
            raise ValueError(obs_type)
        self.obs_type = obs_type
        self.render_mode = render_mode

        difficulty = kwargs.get("difficulty", "normal").lower()
        if difficulty not in _DIFFICULTY:
            raise ValueError(f"Unrecognized difficulty: {difficulty}")
        base = dict(_DIFFICULTY[difficulty])

        self.num_agents = kwargs.get("num_agents", 1)
        self.multi_agent = kwargs.get("multi_agent", False) \
            or self.num_agents > 1
        self.cfg = EnvConfig(
            num_agents=self.num_agents,
            ticks_per_step=kwargs.get("ticks_per_step", 4),
            arena_size=kwargs.get("arena_size", base["arena_size"]),
            pellet_regen=kwargs.get("pellet_regen", True),
            num_pellets=kwargs.get("num_pellets", base["num_pellets"]),
            num_viruses=kwargs.get("num_viruses", base["num_viruses"]),
            num_bots=kwargs.get("num_bots", base["num_bots"]),
            reward_type=bool(kwargs.get("reward_type", 1)),
            c_death=kwargs.get("c_death", 0),
            mode=kwargs.get("mode", 0),
        )
        self.number_of_steps = kwargs.get("number_steps", 500)
        self.env_type = kwargs.get("env_type", 0)  # 0 episodic, 1 continuing
        self.add_noise = kwargs.get("add_noise", False)
        self.agent_view = kwargs.get("agent_view", False)

        self._obs_cfg, self.observation_space, self._frame_fn = \
            self._make_observation(obs_type, kwargs)

        self.action_space = spaces.Tuple((
            spaces.Box(low=-1, high=1, shape=(2,)),
            spaces.Discrete(3),
        ))

        self._reset_fn = jax.jit(functools.partial(env_reset, self.cfg))
        # screen env semantics: a dead main player respawns during
        # observation and the step is charged c_death
        # (ScreenEnvironment.hpp:233-243)
        self._step_fn = jax.jit(functools.partial(
            env_step, self.cfg, obs_fn=self._frame_fn,
            num_frames=self._num_frames,
            respawn_main_during_obs=(obs_type == "screen")))
        self._obs_now_fn = (jax.jit(self._frame_fn)
                            if self._frame_fn is not None else None)

        self.steps = None
        self._seed = 0
        self._rng = np.random.default_rng(0)
        self.state = None
        self.video_recorder = []
        self.video_recorder_enabled = False

    # ------------------------------------------------------------------ obs
    def _make_observation(self, obs_type, kwargs):
        self._num_frames = kwargs.get("num_frames", 1)
        if obs_type == "ram":
            ocfg = RamObsConfig()
            n = ram_size(self.cfg, ocfg)
            space = spaces.Box(-np.inf, np.inf, (n,), dtype=np.float32)
            return ocfg, space, functools.partial(ram_frame, self.cfg, ocfg)
        if obs_type == "grid":
            ocfg = GridObsConfig(
                num_frames=self._num_frames,
                grid_size=kwargs.get("grid_size", 128),
                observe_cells=kwargs.get("observe_cells", True),
                observe_others=kwargs.get("observe_others", True),
                observe_viruses=kwargs.get("observe_viruses", True),
                observe_pellets=kwargs.get("observe_pellets", True),
                # opt-in saturating narrow output (GridObsConfig.out_dtype)
                out_dtype=kwargs.get("grid_dtype", "int32"))
            G = ocfg.grid_size
            ch = ocfg.num_frames * ocfg.channels_per_frame
            np_dtype = np.dtype(ocfg.out_dtype)
            # NHWC at the rim (AgarioEnv.py:192-195 transposes NCHW->NHWC)
            space = spaces.Box(-1, np.iinfo(np_dtype).max, (G, G, ch),
                               dtype=np_dtype)
            return ocfg, space, functools.partial(grid_frame, self.cfg, ocfg)
        if obs_type == "screen":
            from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
            ocfg = ScreenObsConfig(
                screen_len=kwargs.get("screen_len", 84),
                agent_view=self.agent_view,
                num_frames=self._num_frames,
                polygon_edges=kwargs.get("polygon_edges", False))
            ch = 4 if self.agent_view else 3
            space = spaces.Box(0, 255,
                               (self._num_frames, ocfg.screen_len,
                                ocfg.screen_len, ch), dtype=np.uint8)
            return ocfg, space, functools.partial(screen_frame, self.cfg,
                                                  ocfg)
        if obs_type == "gobigger":
            from agarcl_tpu.obs.gobigger import (GoBiggerObsConfig,
                                                 gobigger_frame)
            ocfg = GoBiggerObsConfig(
                map_width=kwargs.get("map_width", 512),
                map_height=kwargs.get("map_height", 512),
                frame_limit=kwargs.get("frame_limit", 1000))
            space = spaces.Box(-np.inf, np.inf, (1,), dtype=np.float32)
            return ocfg, space, functools.partial(gobigger_frame, self.cfg,
                                                  ocfg)
        raise ValueError(obs_type)

    def _post_obs(self, obs_frames):
        """(F, A, ...) device frames -> per-agent numpy observations."""
        if self.obs_type == "gobigger":
            # structured dict frame -> reference-shaped PlayerState objects
            import jax as _jax
            from agarcl_tpu.obs.gobigger import to_player_states
            last = _jax.tree.map(lambda x: x[-1], obs_frames)
            gs, players = to_player_states(self.cfg, self._obs_cfg, last)
            self.global_state = gs
            return [players[a] for a in range(self.num_agents)]
        obs = np.asarray(obs_frames)
        out = []
        for a in range(self.num_agents):
            o = obs[:, a]
            if self.obs_type == "grid":
                # stack frames into channels, then NCHW -> NHWC
                F, Cc, G, _ = o.shape
                o = o.reshape(F * Cc, G, G).transpose(1, 2, 0)
            elif self.obs_type == "ram":
                o = o[-1]  # latest frame
            # owned, writable buffer (the reference tests poke it,
            # grid_env_test.py:136-139)
            out.append(np.ascontiguousarray(o))
        return out

    # ----------------------------------------------------------------- gym
    def reset(self, seed=None, **kwargs):
        if seed is not None:
            self._seed = seed
        self.steps = 0
        self.state = self._reset_fn(jnp.uint32(self._seed))
        if self._obs_now_fn is not None:
            frame = self._obs_now_fn(self.state)
            frames = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None],
                                           (self._num_frames,) + x.shape),
                frame)
            obs = self._post_obs(frames)
        else:
            obs = [None] * self.num_agents
        return (obs if self.multi_agent else obs[0]), {}

    def step(self, actions):
        assert self.steps is not None, \
            "Cannot call step() before calling reset()"
        acts = self._sanitize_actions(actions)
        out = self._step_fn(self.state, acts)
        self.state, obs_frames, rewards, dones = out
        observations = self._post_obs(obs_frames) \
            if obs_frames is not None else [None] * self.num_agents

        if self.video_recorder_enabled and isinstance(observations[0],
                                                      np.ndarray):
            self.video_recorder.append(
                self._make_video_observation(observations[0]))

        rewards = [float(r) for r in np.asarray(rewards)]
        dones = [bool(d) for d in np.asarray(dones)]
        truncations = [False] * len(dones)
        if self.steps >= self.number_of_steps and self.env_type == 0:
            dones = [True] * len(dones)

        if not self.multi_agent:
            observations = observations[0]
            rewards = rewards[0]
            dones = dones[0]
            truncations = truncations[0]
        self.steps += 1
        return observations, rewards, dones, truncations, \
            {"steps": self.steps, "untransformed_rewards": rewards}

    def seed(self, seed=None):
        if seed is not None:
            self._seed = seed
            if self.state is not None:
                self.state = self.state.replace(seed=jnp.uint32(seed))
            return [self._seed]

    def render(self):
        if self.render_mode == "rgb_array":
            return self.get_frame()
        return None

    def get_frame(self, size: int = 512):
        """512x512 natural-color render of agent 0's view — the reference's
        FrameObservation path (GridEnvironment.hpp:456-472)."""
        from agarcl_tpu.obs.screen import render_rgb
        return np.asarray(render_rgb(self.cfg, self.state, size))

    def close(self):
        pass

    # ------------------------------------------------------------ snapshots
    def save_env_state(self, filename):
        _save_snapshot(self.cfg, self.state, filename)

    def load_env_state(self, filename):
        self.state = _load_snapshot(self.cfg, filename)
        self.steps = 0

    # ----------------------------------------------------------------- video
    def enable_video_recorder(self):
        self.video_recorder_enabled = True

    def disable_video_recorder(self):
        self.video_recorder_enabled = False

    def generate_video(self, path, video_name):
        from agarcl_tpu.io.video import write_video
        import os
        os.makedirs(path, exist_ok=True)
        if not self.video_recorder_enabled:
            print("Video recorder is not enabled. Please enable it before "
                  "generating video")
            return
        if not self.video_recorder:
            print("No frames to generate video")
            return
        write_video(os.path.join(path, video_name), self.video_recorder)

    def _make_video_observation(self, observation):
        o = observation
        if self.obs_type == "grid":
            # visualize pellet-presence + own cells + others as RGB
            ch = o[..., :3].astype(np.float32)
            ch = 255.0 * ch / max(1.0, float(ch.max()))
            return ch.astype(np.uint8)
        if o.ndim == 4:
            o = o[-1]
        return np.asarray(o[..., :3], dtype=np.uint8)

    # --------------------------------------------------------------- actions

    def _sanitize_actions(self, actions):
        if not self.multi_agent and not isinstance(actions, list):
            actions = [actions]
        if not isinstance(actions, list):
            raise ValueError(
                "Action list must be a list of two-element tuples")
        if len(actions) != self.num_agents:
            raise ValueError(
                f"Number of actions {len(actions)} does not match number of "
                f"agents {self.num_agents}")
        rows = []
        for action in actions:
            tgt, a = action
            dx, dy = float(tgt[0]), float(tgt[1])
            if self.add_noise:
                noise = self._rng.normal(0, 0.1, size=2)
                dx = float(np.clip(dx + noise[0], -1, 1))
                dy = float(np.clip(dy + noise[1], -1, 1))
            if not (-1 <= dx <= 1 and -1 <= dy <= 1 and a in (0, 1, 2)):
                raise ValueError(f"action {action} not in action space")
            rows.append((dx, dy, float(a)))
        return jnp.asarray(rows, jnp.float32)


_REGISTERED = False


def register_envs():
    """Register the reference's Gymnasium env ids
    (gym_agario/__init__.py:7-23) plus 'agario-ram-v0' (which the reference
    declares but never registers — SURVEY §4)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from gymnasium.envs.registration import register
    for obs_type in ("grid", "screen", "gobigger", "ram"):
        register(id=f"agario-{obs_type}-v0",
                 entry_point="agarcl_tpu.gym_env:AgarioEnv",
                 kwargs={"obs_type": obs_type})
    _REGISTERED = True


register_envs()
