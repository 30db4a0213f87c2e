"""Attribute the full fused ram step: kernel-only vs kernel+obs vs full
VecEnv step, all as chained programs (CLAUDE.md measurement rules)."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    envs = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from agarcl_tpu import EnvConfig
    from agarcl_tpu.vec import VecEnv
    from agarcl_tpu.obs.ram import RamObsConfig
    from agarcl_tpu.ops.fused_tick import fused_engine_tick

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10, num_bots=0,
                    reward_type=True, mode=4)
    env = VecEnv(cfg, envs, obs_type="ram", backend="fused")
    states, _ = env.reset(0)
    jax.block_until_ready(states.ticks)
    ocfg = RamObsConfig()
    CHAIN, CALLS, REPS = 10, 4, 5

    def chained(fn, carrier):
        @jax.jit
        def run(s):
            for _ in range(CHAIN):
                s = fn(s)
            return s
        s = run(carrier)
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
        best = []
        for _ in range(REPS):
            s = carrier
            t0 = time.perf_counter()
            for _ in range(CALLS):
                s = run(s)
            jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
            best.append((time.perf_counter() - t0) / (CALLS * CHAIN))
        return statistics.median(best)

    t_k = chained(lambda s: fused_engine_tick(cfg, s, 128, False, 99, 4,
                                              99, None), states)
    print(f"kernel only (4 ticks):      {t_k*1e3:7.3f} ms", flush=True)

    def tick_obs(s):
        s2, obs = fused_engine_tick(cfg, s, 128, False, 99, 4, 99, ocfg)
        # keep obs live via a cheap fold into a state scalar
        return s2.replace(seed=s2.seed + obs[0, 0, 0].astype(jnp.uint32))
    t_ko = chained(tick_obs, states)
    print(f"kernel + ram obs:           {t_ko*1e3:7.3f} ms  "
          f"(obs {1e3*(t_ko-t_k):+.3f})", flush=True)

    acts = jnp.zeros((envs, 1, 3), jnp.float32)

    def full(s):
        s2, obs, r, d = env.step_fn(s, acts)
        return s2.replace(seed=s2.seed + obs[0, 0, 0, 0].astype(jnp.uint32)
                          + r[0, 0].astype(jnp.uint32))
    step_fn = getattr(env, "step_fn", None)
    if step_fn is None:
        from agarcl_tpu.ops.fused_step import fused_env_step
        from agarcl_tpu.vec import make_obs_fn
        fn, nf = make_obs_fn(cfg, "ram", None)
        def full(s):
            s2, obs, r, d = fused_env_step(cfg, s, acts, obs_fn=fn,
                                           num_frames=nf, block_envs=128)
            return s2.replace(
                seed=s2.seed + obs[0, 0, 0, 0].astype(jnp.uint32)
                + r[0, 0].astype(jnp.uint32))
    t_f = chained(full, states)
    print(f"full env step:              {t_f*1e3:7.3f} ms  "
          f"(tail {1e3*(t_f-t_ko):+.3f})", flush=True)
    print(f"steps/s at full: {envs/t_f:,.0f}")


if __name__ == "__main__":
    main()
