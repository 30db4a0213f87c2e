"""How does throughput scale with env count? (launch-overhead amortization)"""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from agarcl_tpu import EnvConfig, env_reset, env_step
from agarcl_tpu.vec import make_obs_fn

CFG = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                num_pellets=500, num_viruses=10, num_bots=0, mode=4)

def run(n):
    frame_fn, _ = make_obs_fn(CFG, "ram")
    reset_b = jax.jit(jax.vmap(functools.partial(env_reset, CFG)))
    def step1(s, a):
        s, o, r, d = env_step(CFG, s, a, obs_fn=frame_fn)
        return s, r
    def scank(s, a):
        def body(c, _):
            s2, r = step1(c, a)
            return s2, r
        return jax.lax.scan(body, s, None, length=10)
    f = jax.jit(lambda s, a: scank(s, a), donate_argnums=0)
    sb = jax.vmap(step1)
    fb = jax.jit(lambda s, a: jax.lax.scan(lambda c, _: sb(c, a), s, None, length=10), donate_argnums=0)
    states = reset_b(jnp.arange(n, dtype=jnp.uint32))
    acts = jnp.zeros((n, 1, 3), jnp.float32)
    out = fb(states, acts); jax.block_until_ready(out)
    t0 = time.perf_counter(); calls = 5
    for _ in range(calls):
        out = fb(out[0], acts); jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"envs={n:6d}: {n*10*calls/dt:12.0f} env-steps/s ({dt/calls*1000:7.1f} ms/10-step-call)", flush=True)

for n in (2048, 8192, 32768, 131072):
    run(n)
