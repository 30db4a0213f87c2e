"""Round-2 long-horizon soak on hardware: the new screen/grid kernels and
the multi-tick fused path, driven with mixed random actions (splits/feeds)
for hundreds of steps. Asserts state sanity and prints sustained rates."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from agarcl_tpu import EnvConfig
from agarcl_tpu.obs.screen import ScreenObsConfig
from agarcl_tpu.vec import VecEnv

CFG4 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                 num_pellets=500, num_viruses=10, num_bots=0,
                 reward_type=True, mode=4)


def soak(name, cfg, n, obs_type, obs_config, steps, k=10):
    env = VecEnv(cfg, n, obs_type=obs_type, obs_config=obs_config,
                 backend="fused")
    states, _ = env.reset(3)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    obs = None
    for i in range(steps // k):
        key, k1, k2 = jax.random.split(key, 3)
        acts = jnp.zeros((n, cfg.num_agents, 3), jnp.float32)
        acts = acts.at[..., :2].set(
            jax.random.uniform(k1, (n, cfg.num_agents, 2), minval=-1,
                               maxval=1))
        acts = acts.at[..., 2].set(jax.random.randint(
            k2, (n, cfg.num_agents), 0, 3).astype(jnp.float32))
        states, obs, rewards, dones = env.multi_step(states, acts, k)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0
    pos = np.asarray(states.cell_pos)
    alive = np.asarray(states.cell_alive)
    mass = np.asarray(states.cell_mass)
    assert np.isfinite(pos).all(), "non-finite positions"
    apos = pos[alive]
    assert (apos >= -1e-3).all() and (apos <= cfg.arena_size + 1e-3).all(), \
        "live cell out of arena"
    assert (mass[alive] >= 25).all() and (mass[alive] <= 30000).all(), \
        "mass out of range"
    assert int(np.asarray(states.ticks)[0]) == steps * cfg.ticks_per_step
    if obs is not None:
        assert np.isfinite(np.asarray(obs, np.float32)).all()
    print(f"{name}: {steps} steps x {n} envs OK, "
          f"{n * steps / dt:,.0f} env-steps/s sustained", flush=True)


def main():
    # one soak per process (HBM buffers of finished envs outlive them long
    # enough to OOM a 3-env sequence): pass screen|duel|grid, default all
    which = sys.argv[1] if len(sys.argv) > 1 else "screen"
    if which == "screen":
        cfg1 = dataclasses.replace(CFG4, mode=1)
        soak("screen mode1 2048", cfg1, 2048, "screen",
             ScreenObsConfig(screen_len=84, agent_view=True), 500)
    elif which == "duel":
        cfg7 = dataclasses.replace(CFG4, mode=7, num_bots=1)
        soak("duel mode7 ram 8192", cfg7, 8192, "ram", None, 500)
    elif which == "grid":
        # k=1: each step's stacked grid obs is already 1 GB
        soak("grid mode4 8192", CFG4, 8192, "grid", None, 300, k=1)


if __name__ == "__main__":
    main()
