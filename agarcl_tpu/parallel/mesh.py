"""Multi-chip / multi-host scaling: env batch sharded over a 1-D device mesh.

The reference has no distributed system at all (SURVEY §2 parallelism
inventory: server is a stub, client networking commented out). The TPU-native
scaling story is straightforward SPMD: N lockstep envs shard along an 'envs'
mesh axis with `shard_map`; each device simulates its slice independently
(zero per-step collectives — lockstep envs are embarrassingly parallel), and
reductions for eval statistics ride ICI via `psum` only when requested.

Multi-host: construct the mesh over `jax.devices()` after
`jax.distributed.initialize()`; the same code runs unchanged — host-local
shards are addressable, the global batch is the concatenation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.env import env_reset, env_step
from agarcl_tpu.vec import make_obs_fn


def make_env_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'envs'."""
    import numpy as np
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("envs",))


class ShardedVecEnv:
    """VecEnv with the env axis sharded over a device mesh.

    num_envs must divide evenly by mesh size. All states/obs/reward arrays are
    globally shaped with NamedSharding(mesh, P('envs')) on the leading axis;
    XLA keeps every per-step computation local to its shard.
    """

    def __init__(self, cfg: EnvConfig, num_envs: int, mesh: Mesh,
                 obs_type: str = "ram", obs_config=None,
                 backend: str = "xla", interpret: bool = False,
                 block_envs: int = 128):
        """backend="fused" runs each shard's slice through the fused Pallas
        step under shard_map (lockstep envs shard embarrassingly, so the
        kernel stays single-device and XLA inserts no collectives);
        backend="xla" lets the SPMD partitioner split the vmapped op-graph
        step. interpret=True is the CPU-mesh test mode for the fused path."""
        n_dev = mesh.devices.size
        assert num_envs % n_dev == 0, (num_envs, n_dev)
        self.cfg = cfg
        self.num_envs = num_envs
        self.mesh = mesh
        frame_fn, num_frames = make_obs_fn(cfg, obs_type, obs_config)
        self._frame_fn = frame_fn
        self.num_frames = num_frames

        env_sharding = NamedSharding(mesh, P("envs"))

        def _reset_batch(seeds):
            return jax.vmap(functools.partial(env_reset, cfg))(seeds)

        if backend == "fused":
            from agarcl_tpu.ops.fused_step import fused_env_step
            from agarcl_tpu.ops.fused_tick import supports
            assert supports(cfg), "fused backend requires num_players <= 9"

            def _step_shard(states, actions):
                out = fused_env_step(cfg, states, actions, obs_fn=frame_fn,
                                     num_frames=num_frames,
                                     block_envs=block_envs,
                                     interpret=interpret)
                if frame_fn is None:
                    s, obs, r, d = out
                    return s, r, d
                return out

            _step_batch = jax.shard_map(
                _step_shard, mesh=mesh,
                in_specs=(P("envs"), P("envs")),
                out_specs=P("envs"), check_vma=False)
        else:
            def _step_batch(states, actions):
                return jax.vmap(
                    functools.partial(env_step, cfg, obs_fn=frame_fn,
                                      num_frames=num_frames))(states, actions)

        self._reset = jax.jit(_reset_batch,
                              in_shardings=(env_sharding,),
                              out_shardings=env_sharding)
        self._step = jax.jit(_step_batch,
                             in_shardings=(env_sharding, env_sharding),
                             out_shardings=env_sharding,
                             donate_argnums=(0,))
        self._env_sharding = env_sharding

    def reset(self, seed: int = 0):
        seeds = jnp.arange(self.num_envs, dtype=jnp.uint32) + jnp.uint32(
            (seed * 0x9E3779B9) & 0xFFFFFFFF)
        seeds = jax.device_put(seeds, self._env_sharding)
        return self._reset(seeds)

    def step(self, states, actions):
        """Returns (states, obs, rewards, dones) (obs None if obs_type none)."""
        actions = jax.device_put(jnp.asarray(actions, jnp.float32),
                                 self._env_sharding)
        out = self._step(states, actions)
        if self._frame_fn is None:
            states, rewards, dones = out
            return states, None, rewards, dones
        return out

    def mean_reward(self, rewards):
        """Cross-shard mean via a collective (rides ICI)."""
        return jnp.mean(rewards)
