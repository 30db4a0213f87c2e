"""Break down the screen-obs step on the real chip: class-map kernel vs
colorize vs tick vs end-to-end. One process, all programs (Mosaic compiles
are per-process)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agarcl_tpu import EnvConfig, env_reset
from agarcl_tpu.obs.screen import ScreenObsConfig, _AGENT_VIEW_COLORS
from agarcl_tpu.ops.fused_screen import (fused_screen_class_map,
                                         fused_screen_frame)
from agarcl_tpu.ops.fused_step import fused_env_step
from agarcl_tpu.ops.fused_tick import fused_engine_tick
from agarcl_tpu.vec import make_obs_fn

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MODE = int(sys.argv[2]) if len(sys.argv) > 2 else 1
S = 84
CFG = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                num_pellets=500, num_viruses=10,
                num_bots=1 if MODE in (0, 7, 8, 9, 10) else 0,
                reward_type=True, mode=MODE)
OCFG = ScreenObsConfig(screen_len=S, agent_view=True)


def timeit(name, fn, arg, calls=10):
    """Pipelined timing: enqueue all calls, block ONCE (blocking per call
    pays the ~30 ms tunnel dispatch latency per call and swamps every
    kernel under test — CLAUDE.md measurement rules)."""
    out = fn(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / calls
    print(f"{name:28s}: {dt*1000:8.2f} ms  ({N/dt:,.0f}/s)", flush=True)
    return out, dt


def main():
    seeds = jnp.arange(N, dtype=jnp.uint32)
    states = jax.jit(jax.vmap(lambda s: env_reset(CFG, s)))(seeds)
    jax.block_until_ready(states)
    print("reset done", flush=True)

    cm = jax.jit(lambda s: fused_screen_class_map(CFG, S, s))
    cls, _ = timeit("class_map kernel", cm, states)

    col = jax.jit(lambda c: _AGENT_VIEW_COLORS[c])
    timeit("colorize gather (alone)", col, cls)

    fr = jax.jit(lambda s: fused_screen_frame(CFG, OCFG, s))
    timeit("frame (kernel+colorize)", fr, states)

    tk = jax.jit(lambda s: jax.lax.scan(
        lambda t, _: (fused_engine_tick(CFG, t, 128), None),
        s, None, length=4)[0])
    timeit("4 ticks (no obs)", tk, states)

    # work-group ablation: strips (pellets+foods) vs circles (cells+viruses)
    # vs lines vs the bare output write ( _only='none' matches no group)
    from agarcl_tpu.ops.fused_screen import _rasterize
    for only in ("none", "lines", "strips", "circles",
                 "write", "write_block"):
        fn = jax.jit(functools.partial(
            _rasterize, CFG, S, block_envs=8, interpret=False, _only=only))
        timeit(f"class_map _only={only}", fn, states)
    for be in (16, 32, 64):
        for only in ("write_block", "none", None):
            fn = jax.jit(functools.partial(
                _rasterize, CFG, S, block_envs=be, interpret=False,
                _only=only))
            timeit(f"BE={be:3d} _only={only}", fn, states)

    obs_fn, nf = make_obs_fn(CFG, "screen", OCFG)
    step = jax.jit(lambda s: fused_env_step(
        CFG, s, jnp.zeros((N, 1, 3), jnp.float32), obs_fn=obs_fn,
        num_frames=nf, block_envs=128))
    _, dt = timeit("fused_env_step screen e2e", step, states)
    print(f"end-to-end: {N/dt:,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
