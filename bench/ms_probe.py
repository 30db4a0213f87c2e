import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, statistics, sys
import jax, jax.numpy as jnp
from agarcl_tpu import EnvConfig
from agarcl_tpu.vec import VecEnv
import agarcl_tpu.ops.fused_step as FS

envs = 8192
cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                num_pellets=500, num_viruses=10, num_bots=0,
                reward_type=True, mode=4)
print("supports_multi:", FS.supports_multi(cfg, "ram", False, False), flush=True)
env = VecEnv(cfg, envs, obs_type="ram", backend="fused", donate=False)
states, _ = env.reset(0)
key = jax.random.PRNGKey(0)
acts = jnp.zeros((envs, 1, 3), jnp.float32).at[..., :2].set(
    jax.random.uniform(key, (envs, 1, 2), minval=-1., maxval=1.))

def timeit(fn, s, k, reps=4):
    o = fn(s, acts, k); jax.block_until_ready(o[1])
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(s, acts, k)
        jax.block_until_ready(o[1])
        best.append((time.perf_counter()-t0)/k)
    return statistics.median(best)

# kernel path (VecEnv routes eligible configs there)
for k in (4, 10, 16):
    t = timeit(env.multi_step, states, k)
    print(f"kernel multi_step k={k}: {t*1e3:7.3f} ms/step  {envs/t:,.0f}/s", flush=True)

# forced unrolled path
import agarcl_tpu.vec as V
orig = FS.supports_multi
FS.supports_multi = lambda *a: False
env2 = VecEnv(cfg, envs, obs_type="ram", backend="fused", donate=False)
FS.supports_multi = orig
for k in (10,):
    t = timeit(env2.multi_step, states, k)
    print(f"unroll multi_step k={k}: {t*1e3:7.3f} ms/step  {envs/t:,.0f}/s", flush=True)
