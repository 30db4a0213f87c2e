"""Throughput benchmark: env-steps/s/chip at 8192 vectorized envs (ram obs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the BASELINE.md target of 1,000,000 env-steps/s/chip (the reference
publishes no numbers; its single-core C++ engine is O(100-1k) steps/s).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

TARGET = 1_000_000.0
NUM_ENVS = 8192
# Steps chained inside ONE device program per multi_step call (a
# rollout-sized actor chunk; the resident fused path runs them as
# <=10-step in-kernel multi-step calls chained in-program). One host
# dispatch per 40 steps: the remote-TPU tunnel here adds ~3-5 ms of
# per-dispatch latency that a locally attached chip does not have.
STEPS_PER_CALL = 40
TIMED_CALLS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=NUM_ENVS)
    ap.add_argument("--steps", type=int, default=0,
                    help="steps chained per multi_step call (0 = auto: "
                         "40 on the resident ram/none path, 10 "
                         "otherwise)")
    ap.add_argument("--iters", type=int, default=TIMED_CALLS)
    ap.add_argument("--mode", type=int, default=4,
                    help="game mode (7-10 = duel vs one scripted bot)")
    ap.add_argument("--agents", type=int, default=1,
                    help="number of action-driven agents (multi-agent "
                         "games; each agent gets its own obs frame)")
    ap.add_argument("--obs", default="ram",
                    choices=("ram", "grid", "screen", "gobigger", "none"),
                    help="observation computed+returned every step")
    ap.add_argument("--size", type=int, default=0,
                    help="grid_size / screen_len override (0 = default)")
    ap.add_argument("--poly", action="store_true",
                    help="screen obs: reference fan silhouettes "
                         "(polygon_edges; fused path draws circle viruses)")
    ap.add_argument("--grid-dtype", default="int16",
                    choices=("int32", "int16", "int8"),
                    help="grid obs output dtype (int16 = the saturating "
                         "contract default, GridObsConfig.out_dtype; "
                         "int32 = exact values, the reference-compatible "
                         "gym wrapper's dtype; int8 quarters the frame "
                         "write cost)")
    args = ap.parse_args()
    num_envs, timed_calls = args.envs, args.iters
    steps_per_call = args.steps or (
        STEPS_PER_CALL if args.obs in ("ram", "none") else 10)

    # If the TPU relay is down (tunnel process died), touching the axon
    # backend hangs indefinitely; probe the relay ports and fall back to
    # CPU fast so the bench always produces a line.
    import socket
    def _relay_up():
        for port in (8113, 8082):
            try:
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=2.0):
                    return True
            except OSError:
                continue
        return False
    if not _relay_up():
        jax.config.update("jax_platforms", "cpu")

    from agarcl_tpu import EnvConfig
    from agarcl_tpu.vec import VecEnv

    cfg = EnvConfig(num_agents=args.agents, ticks_per_step=4,
                    arena_size=350, num_pellets=500, num_viruses=10,
                    num_bots=1 if args.mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=args.mode)
    obs_config = None
    if args.obs == "grid":
        from agarcl_tpu.obs.grid import GridObsConfig
        obs_config = GridObsConfig(grid_size=args.size or 64,
                                   out_dtype=args.grid_dtype)
    elif args.obs == "screen":
        from agarcl_tpu.obs.screen import ScreenObsConfig
        obs_config = ScreenObsConfig(screen_len=args.size or 84,
                                     agent_view=True,
                                     polygon_edges=args.poly,
                                     polygon_virus=("circle" if args.poly
                                                    else "wavy"))
    from agarcl_tpu.ops.fused_tick import supports
    # Mosaic kernels need real TPU hardware; CI smoke-runs fall back to XLA.
    backend = ("fused" if supports(cfg) and jax.default_backend() != "cpu"
               else "xla")
    env = VecEnv(cfg, num_envs, obs_type=args.obs, obs_config=obs_config,
                 backend=backend)
    states, _ = env.reset(0)
    if env.supports_resident(steps_per_call):
        # resident kernel-layout state: consecutive multi_step calls skip
        # the GameState <-> kernel-layout transposes (~5.6 ms/call at
        # 8192 envs)
        states = env.make_resident(states)

    actions = jnp.zeros((num_envs, cfg.num_agents, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    dirs = jax.random.uniform(key, (num_envs, cfg.num_agents, 2),
                              minval=-1.0, maxval=1.0)
    actions = actions.at[..., :2].set(dirs)

    states, obs, rewards, dones = env.multi_step(states, actions,
                                                 steps_per_call)  # compile
    jax.block_until_ready((obs, rewards))

    t0 = time.perf_counter()
    for _ in range(timed_calls):
        states, obs, rewards, dones = env.multi_step(states, actions,
                                                     steps_per_call)
    # rewards included: with --obs none there is no obs leaf to block on
    jax.block_until_ready((obs, rewards))
    dt = time.perf_counter() - t0

    sps = num_envs * steps_per_call * timed_calls / dt
    suffix = "" if args.mode == 4 else f"_mode{args.mode}"
    if args.agents != 1:
        suffix += f"_{args.agents}ag"
    if args.obs == "grid" and args.grid_dtype != "int16":
        suffix += f"_{args.grid_dtype}"
    if args.obs == "screen" and args.poly:
        suffix += "_poly"
    print(json.dumps({
        "metric":
            f"env_steps_per_sec_per_chip_{num_envs}envs_{args.obs}{suffix}",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
