"""Experiment: vmap the env axis LAST so the big dimension fills TPU lanes
(trailing size-2/16 axes pad to 128 lanes = 8-64x waste when batch-first)."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from agarcl_tpu import EnvConfig, env_reset, env_step
from agarcl_tpu.vec import make_obs_fn

CFG = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                num_pellets=500, num_viruses=10, num_bots=0, mode=4)

def run(n, axis):
    frame_fn, _ = make_obs_fn(CFG, "ram")
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, CFG),
                               in_axes=0, out_axes=axis))
    def step1(s, a):
        s, o, r, d = env_step(CFG, s, a, obs_fn=frame_fn)
        return s, r
    sb = jax.vmap(step1, in_axes=(axis, 0 if axis == 0 else 2), out_axes=(axis, 0 if axis == 0 else 1))
    fb = jax.jit(lambda s, a: jax.lax.scan(lambda c, _: sb(c, a), s, None,
                                           length=10), donate_argnums=0)
    states = reset_b(jnp.arange(n, dtype=jnp.uint32))
    acts = jnp.zeros((n, 1, 3) if axis == 0 else (1, 3, n), jnp.float32)
    out = fb(states, acts); jax.block_until_ready(out)
    t0 = time.perf_counter(); calls = 5
    for _ in range(calls):
        out = fb(out[0], acts); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"axis={axis} envs={n:6d}: {n*10*calls/dt:12.0f} env-steps/s "
          f"({dt/calls*1000:7.1f} ms/call)", flush=True)

run(8192, -1)
run(32768, -1)
