"""Hardware ablation of the fused tick's per-iteration cost.

Marginal per-iteration cost = (t[n_ticks=hi] - t[n_ticks=lo]) / (hi - lo);
that cancels the per-call constants (dispatch, state HBM round trip, the
per-program transposes). Timing is pipelined (block once per group) per
CLAUDE.md measurement rules; each point is the median of --reps groups.

Two sweeps:
  --sweep sub     bisects the phase-UNGATED code at phases=0 via the `sub`
                  knob (ops/fused_tick.py::_make_kernel docstring). NOTE:
                  at phases=0 most gated results are dead and Mosaic DCEs
                  them; treat sub marginals as lower bounds.
  --sweep phases  marginal cost of each phase level 0..9 + full (99) —
                  attributes the full tick's per-iteration cost phase by
                  phase (each level includes all previous ones).

Usage: python bench/tick_ablate.py [--envs 8192] [--mode 4] [--sweep phases]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--mode", type=int, default=4)
    ap.add_argument("--calls", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--lo", type=int, default=1)
    ap.add_argument("--hi", type=int, default=4)
    ap.add_argument("--sweep", choices=("sub", "phases", "loo"),
                    default="phases")
    ap.add_argument("--only", default="",
                    help="comma-separated phase levels to time (default all)")
    args = ap.parse_args()

    from agarcl_tpu import EnvConfig
    from agarcl_tpu.vec import VecEnv
    from agarcl_tpu.ops.fused_tick import fused_engine_tick

    cfg = EnvConfig(num_agents=1, ticks_per_step=4, arena_size=350,
                    num_pellets=500, num_viruses=10,
                    num_bots=1 if args.mode in (0, 7, 8, 9, 10) else 0,
                    reward_type=True, mode=args.mode)
    env = VecEnv(cfg, args.envs, obs_type="none", backend="fused")
    states, _ = env.reset(0)
    jax.block_until_ready(states.ticks)

    CHAIN = 10

    def timed(phases, sub, n_ticks, loo=0):
        # chain CHAIN kernel invocations inside ONE program (bench.py
        # style): per-call dispatch timing through the tunnel is unreliable
        # (sub-ms readings for multi-ms programs), and the chain also
        # amortizes the per-program state transposes like production does
        @jax.jit
        def run(s):
            for _ in range(CHAIN):
                s = fused_engine_tick(cfg, s, 128, False, phases, n_ticks,
                                      sub, None, False, False, loo)
            return s
        s = run(states)
        jax.block_until_ready(s.ticks)                         # compile+warm
        best = []
        for _ in range(args.reps):
            s = states
            t0 = time.perf_counter()
            for _ in range(args.calls):
                s = run(s)
            jax.block_until_ready(s.ticks)
            best.append((time.perf_counter() - t0) / (args.calls * CHAIN))
        return statistics.median(best)

    if args.sweep == "sub":
        grid = [(0, 0, 0), (0, 1, 0), (0, 2, 0), (0, 3, 0), (99, 99, 0)]
    elif args.sweep == "loo":
        # leave-one-out block attribution at full phases (honest per-block
        # marginals; the cumulative phases sweep is DCE-polluted): 0 = all
        # blocks on; see _make_kernel's loo docstring for the block ids
        grid = [(99, 99, k) for k in (0, 1, 2, 4, 5, 6, 7, 8, 9, 10, 11,
                                      13)]
    else:
        grid = [(p, 99, 0) for p in range(10)] + [(99, 99, 0)]
    if args.only:
        keep = {int(x) for x in args.only.split(",")}
        if args.sweep == "loo":
            grid = [(p, s, k) for p, s, k in grid if k in keep]
        else:
            grid = [(p, s, k) for p, s, k in grid if p in keep]

    lo, hi = args.lo, args.hi
    prev = 0.0
    for phases, sub, loo in grid:
        tlo = timed(phases, sub, lo, loo)
        thi = timed(phases, sub, hi, loo)
        per = (thi - tlo) / (hi - lo)
        print(f"phases={phases:2d} sub={sub:2d} loo={loo:2d}  "
              f"t[{lo}]={tlo*1e3:7.3f} ms  "
              f"t[{hi}]={thi*1e3:7.3f} ms  marginal={per*1e3:7.3f} ms/tick  "
              f"delta={(per-prev)*1e3:+7.3f}", flush=True)
        prev = per


if __name__ == "__main__":
    main()
