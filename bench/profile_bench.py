"""Ablation profiler: where does step time go on the real chip?

Variants (each timed at NUM_ENVS envs):
  full       — VecEnv-equivalent: per-call jit step with ram obs
  scan10     — 10 env-steps chained inside one jit (dispatch amortized)
  noobs      — scan10 without observation
  nophys     — scan10, self-collision relaxation disabled
  nopellet   — scan10, pellet eating disabled
  novirus    — scan10, virus phase disabled
  norecomb   — scan10, recombine disabled

Run:  python bench/profile_bench.py [num_envs]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

from agarcl_tpu import EnvConfig, env_reset, env_step
from agarcl_tpu.vec import make_obs_fn
from agarcl_tpu.engine import physics, eating, actions

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
CFG = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                num_pellets=500, num_viruses=10, num_bots=0,
                reward_type=True, mode=4)


def timed(name, fn, make_states, actions, steps_per_call, calls=8):
    out = fn(make_states(), actions)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(out[0] if isinstance(out, tuple) else out, actions)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    sps = NUM_ENVS * steps_per_call * calls / dt
    print(f"{name:10s}: {sps:12.0f} env-steps/s  ({dt/calls*1000:8.1f} ms/call)",
          flush=True)
    return sps


def main():
    frame_fn, _ = make_obs_fn(CFG, "ram")
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, CFG)))

    def make_states():
        s = reset_b(jnp.arange(NUM_ENVS, dtype=jnp.uint32))
        jax.block_until_ready(s)
        return s

    acts = jnp.zeros((NUM_ENVS, CFG.num_agents, 3), jnp.float32)
    print(f"profiling at {NUM_ENVS} envs on {jax.devices()[0]}", flush=True)

    def step_obs(s, a):
        s, o, r, d = env_step(CFG, s, a, obs_fn=frame_fn)
        return s, r

    def step_noobs(s, a):
        s, r, d = env_step(CFG, s, a)
        return s, r

    def scan_of(step1, k=10):
        def f(s, a):
            def body(carry, _):
                s2, r = step1(carry, a)
                return s2, r
            s, rs = jax.lax.scan(body, s, None, length=k)
            return s, rs
        return f

    full = jax.jit(jax.vmap(step_obs), donate_argnums=0)
    timed("full", lambda s, a: full(s, a), make_states, acts, 1)

    scan10 = jax.jit(scan_of(jax.vmap(step_obs)), donate_argnums=0)
    timed("scan10", scan10, make_states, acts, 10)

    scan10n = jax.jit(scan_of(jax.vmap(step_noobs)), donate_argnums=0)
    timed("noobs", scan10n, make_states, acts, 10)

    # phase ablations (monkeypatch then rebuild jit)
    def ablate(name, patch):
        orig = {}
        for mod, attr, repl in patch:
            orig[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, repl)
        try:
            f = jax.jit(scan_of(jax.vmap(step_noobs)), donate_argnums=0)
            timed(name, f, make_states, acts, 10)
        finally:
            for (mod, attr), v in orig.items():
                setattr(mod, attr, v)

    ablate("nophys", [(physics, "self_collisions",
                       lambda pos, vel, *a, **k: (pos, vel))])
    ablate("nopellet", [(eating, "eat_pellets",
                         lambda cp, cm, ca, r, pp, pa:
                         (jnp.zeros_like(cm), pa))])
    ablate("novirus", [(eating, "virus_events",
                        lambda cp, cm, ca, r, vp, vm, va, ce: dict(
                            hit=jnp.zeros(cm.shape[0], bool),
                            cell_slot=jnp.zeros(cm.shape[0], jnp.int32),
                            virus_slot=jnp.zeros(cm.shape[0], jnp.int32),
                            mass_gain=jnp.zeros(cm.shape[0], jnp.int32),
                            disrupt=jnp.zeros(cm.shape[0], bool),
                            virus_alive=va))])
    ablate("norecomb", [(actions, "recombine", lambda cells, e: cells)])


if __name__ == "__main__":
    main()
