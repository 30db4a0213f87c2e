"""Shared jitted entry points for tests (compile once per config)."""

import functools

import jax

from agarcl_tpu import EnvConfig, env_reset, env_step
from agarcl_tpu.engine.tick import engine_tick


@functools.lru_cache(maxsize=None)
def tick_fn(cfg: EnvConfig):
    return jax.jit(functools.partial(engine_tick, cfg))


@functools.lru_cache(maxsize=None)
def step_fn(cfg: EnvConfig):
    return jax.jit(functools.partial(env_step, cfg))


def reset(cfg, seed):
    return env_reset(cfg, seed)


# One base config most tests share (one compile for the whole suite).
BASE = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=100,
                 num_pellets=50, num_viruses=3, num_bots=0,
                 reward_type=True, mode=3)
