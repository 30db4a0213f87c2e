"""On-hardware check + honest in-program timing for the obs paths.

1. Parity: packed-pixel fused_screen_frame vs jax.vmap(screen_frame), both
   agent_view and natural (exercises the in-kernel palette + bitcast).
2. Timing via VecEnv.multi_step (k steps chained in one program, obs stacked
   in the scan output — the dispatch-amortized shape BASELINE.md numbers
   use; per-call timings here are polluted by ~30 ms tunnel latency).

Run: python bench/screen_grid_tpu_check.py   (single TPU process)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig
from agarcl_tpu.obs.grid import GridObsConfig
from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
from agarcl_tpu.ops.fused_screen import fused_screen_frame
from agarcl_tpu.vec import VecEnv

CFG4 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                 num_pellets=500, num_viruses=10, num_bots=0,
                 reward_type=True, mode=4)
CFG1 = dataclasses.replace(CFG4, mode=1)


def parity():
    from agarcl_tpu.env import env_reset
    seeds = jnp.arange(16, dtype=jnp.uint32) + 11
    states = jax.jit(jax.vmap(lambda s: env_reset(CFG1, s)))(seeds)
    for agent_view in (True, False):
        ocfg = ScreenObsConfig(screen_len=84, agent_view=agent_view)
        got = np.asarray(fused_screen_frame(CFG1, ocfg, states))
        want = np.asarray(jax.jit(jax.vmap(
            lambda s: screen_frame(CFG1, ocfg, s)))(states))
        match = (got == want).all()
        print(f"parity agent_view={agent_view}: {match} "
              f"(got {got.shape} want {want.shape})", flush=True)
        assert match


def timed_multistep(name, env, n, k, calls=4):
    # block only once at the end (like bench.py): blocking per call adds the
    # ~30 ms tunnel dispatch latency to every call and understates throughput
    states, _ = env.reset(0)
    acts = jnp.zeros((n, 1, 3), jnp.float32).at[..., 0].set(0.6)
    states, obs, r, d = env.multi_step(states, acts, k)
    jax.block_until_ready(obs if obs is not None else states)
    t0 = time.perf_counter()
    for _ in range(calls):
        states, obs, r, d = env.multi_step(states, acts, k)
    jax.block_until_ready(obs if obs is not None else states)
    dt = time.perf_counter() - t0
    sps = n * k * calls / dt
    print(f"{name:34s}: {sps:12,.0f} env-steps/s "
          f"({dt/(calls*k)*1000:7.2f} ms/step)", flush=True)
    return sps


def timed_standalone(name, fn, arg, n, calls=8):
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / calls
    print(f"{name:34s}: {dt*1000:8.2f} ms/call ({n/dt:,.0f}/s)", flush=True)


def main():
    parity()
    # screen e2e (the 10-task-suite shape)
    env = VecEnv(CFG1, 2048, obs_type="screen",
                 obs_config=ScreenObsConfig(screen_len=84, agent_view=True),
                 backend="fused")
    timed_multistep("screen 84x84 2048 envs k=5", env, 2048, 5)
    # same without obs to isolate the tick cost at this batch
    env_no = VecEnv(CFG1, 2048, obs_type="none", backend="fused")
    timed_multistep("no-obs (ticks only) 2048 k=5", env_no, 2048, 5)
    # grid e2e + anomaly diagnosis: standalone kernel vs in-scan, k sweep
    envg = VecEnv(CFG4, 4096, obs_type="grid",
                  obs_config=GridObsConfig(grid_size=64), backend="fused")
    timed_multistep("grid 64x64 4096 envs k=5", envg, 4096, 5)
    envg8 = VecEnv(CFG4, 8192, obs_type="grid",
                   obs_config=GridObsConfig(grid_size=64), backend="fused")
    timed_multistep("grid 64x64 8192 envs k=3", envg8, 8192, 3)
    timed_multistep("grid 64x64 8192 envs k=1", envg8, 8192, 1, calls=8)
    from agarcl_tpu.env import env_reset
    from agarcl_tpu.ops.fused_grid import fused_grid_frame
    import jax.numpy as jnp2
    seeds = jnp2.arange(8192, dtype=jnp2.uint32)
    st8 = jax.jit(jax.vmap(lambda s: env_reset(CFG4, s)))(seeds)
    gcfg = GridObsConfig(grid_size=64)
    for be in (8, 16):
        fn = jax.jit(lambda s, b=be: fused_grid_frame(CFG4, gcfg, s,
                                                      block_envs=b))
        timed_standalone(f"grid kernel standalone 8192 BE={be}", fn, st8,
                         8192)
    # screen kernel block-size sweep
    st2 = jax.jit(jax.vmap(lambda s: env_reset(CFG1, s)))(
        jnp2.arange(2048, dtype=jnp2.uint32))
    socfg = ScreenObsConfig(screen_len=84, agent_view=True)
    for be in (8, 16):
        fn = jax.jit(lambda s, b=be: fused_screen_frame(CFG1, socfg, s,
                                                        block_envs=b))
        timed_standalone(f"screen kernel standalone 2048 BE={be}", fn, st2,
                         2048)
    # ram headline sanity
    envr = VecEnv(CFG4, 8192, obs_type="ram", backend="fused")
    timed_multistep("ram 8192 envs k=10", envr, 8192, 10)


if __name__ == "__main__":
    main()
