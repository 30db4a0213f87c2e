"""Round-5 long-horizon soak on hardware through the ROUND-4 machinery:
resident kernel-layout state + in-kernel multi-step (the paths the round-4
rewrite introduced — pellet key plane, packed nearest-k, ResidentState
chaining), plus the round-5 large-roster fused path.

Mixed random actions (moves/splits/feeds) for hundreds of steps; asserts
state sanity on the materialized GameState and prints sustained taken-path
rates (the multi-cell / mixed-action regime, NOT the bench fast path).

Run one config per process (HBM buffers of finished envs outlive them long
enough to OOM a multi-config sequence):
    python bench/soak_r5.py [ram|duel|screen|grid|mode0]
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
from agarcl_tpu.obs.screen import ScreenObsConfig
from agarcl_tpu.vec import VecEnv

CFG4 = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                 num_pellets=500, num_viruses=10, num_bots=0,
                 reward_type=True, mode=4)


def soak(name, cfg, n, obs_type, obs_config, steps, k=10):
    env = VecEnv(cfg, n, obs_type=obs_type, obs_config=obs_config,
                 backend="fused")
    states, _ = env.reset(3)
    resident = env.supports_resident()
    if resident:
        states = env.make_resident(states)
    key = jax.random.PRNGKey(1)
    obs = None
    t0 = None
    timed_steps = 0
    for i in range(steps // k):
        key, k1, k2 = jax.random.split(key, 3)
        acts = jnp.zeros((n, cfg.num_agents, 3), jnp.float32)
        acts = acts.at[..., :2].set(
            jax.random.uniform(k1, (n, cfg.num_agents, 2), minval=-1,
                               maxval=1))
        acts = acts.at[..., 2].set(jax.random.randint(
            k2, (n, cfg.num_agents), 0, 3).astype(jnp.float32))
        states, obs, rewards, dones = env.multi_step(states, acts, k)
        if i == 0:
            # first chunk compiles (minutes through the remote-compile
            # tunnel) — start the sustained-rate clock after it
            jax.block_until_ready(jax.tree.leaves(states))
            t0 = time.perf_counter()
        else:
            timed_steps += k
    jax.block_until_ready(jax.tree.leaves(states))
    dt = time.perf_counter() - t0
    final = env.materialize(states)
    pos = np.asarray(final.cell_pos)
    alive = np.asarray(final.cell_alive)
    mass = np.asarray(final.cell_mass)
    assert np.isfinite(pos).all(), "non-finite positions"
    apos = pos[alive]
    assert (apos >= -1e-3).all() and (apos <= cfg.arena_size + 1e-3).all(), \
        "live cell out of arena"
    assert (mass[alive] >= 25).all() and (mass[alive] <= 30000).all(), \
        "mass out of range"
    assert int(np.asarray(final.ticks)[0]) == steps * cfg.ticks_per_step
    # pellet key plane decodes to in-arena coordinates
    ppos, palive = jax.vmap(
        lambda s: s.pellet_xy_alive(cfg))(final)
    ppos = np.asarray(ppos)[np.asarray(palive)]
    assert (ppos >= -1e-3).all() and (ppos <= cfg.arena_size + 1e-3).all(), \
        "live pellet out of arena"
    if obs is not None:
        assert np.isfinite(np.asarray(obs, np.float32)).all()
    print(f"{name}{' [resident]' if resident else ''}: {steps} steps x "
          f"{n} envs OK, {n * timed_steps / dt:,.0f} env-steps/s sustained "
          f"(post-compile, {timed_steps} timed steps)", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ram"
    if which == "ram":
        # the headline config on the resident path, k=40 like bench.py
        soak("ram mode4 8192", CFG4, 8192, "ram", None, 600, k=40)
    elif which == "duel":
        cfg7 = dataclasses.replace(CFG4, mode=7, num_bots=1)
        soak("duel mode7 ram 8192", cfg7, 8192, "ram", None, 500)
    elif which == "screen":
        cfg1 = dataclasses.replace(CFG4, mode=1)
        soak("screen mode1 2048", cfg1, 2048, "screen",
             ScreenObsConfig(screen_len=84, agent_view=True), 500)
    elif which == "grid":
        # k=1: each step's stacked grid obs is already 0.5 GB (int16)
        soak("grid mode4 8192", CFG4, 8192, "grid", None, 300, k=1)
    elif which == "mode0":
        # round-5 large-roster fused path: full game, 4 bots (5 players)
        cfg0 = dataclasses.replace(CFG4, mode=0, num_bots=4)
        soak("mode0 4bots ram 8192", cfg0, 8192, "ram", None, 300)


if __name__ == "__main__":
    main()
