"""Random-walk task driver — counterpart of the reference's
bench/screen_obs_example.py and go_bigger_example.py (SURVEY C31): runs a
task from the 10-task suite with random actions, logging steps/sec and
per-episode rewards to CSV, optionally recording a video and saving an env
snapshot.

Usage:
  python bench/random_walk_example.py --task 1 --episodes 3 --obs grid
  python bench/random_walk_example.py --task 7 --video out.avi
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", type=int, default=1, help="task mode 1..10")
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--obs", default=None,
                    help="override obs type (ram/grid/screen/gobigger)")
    ap.add_argument("--video", default=None, help="record episode 0 to file")
    ap.add_argument("--snapshot", default=None, help="save env snapshot here")
    ap.add_argument("--csv", default=None, help="episodic rewards CSV")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args()

    from agarcl_tpu.tasks import load_task
    env = load_task(args.task, obs_type=args.obs)
    if args.max_steps:
        env.number_of_steps = args.max_steps
    rng = np.random.default_rng(args.seed)

    rows = []
    for ep in range(args.episodes):
        obs, _ = env.reset(seed=args.seed + ep)
        if args.video and ep == 0:
            env.enable_video_recorder()
        total, steps, t0 = 0.0, 0, time.perf_counter()
        done = False
        while not done:
            action = ((float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1))),
                      int(rng.integers(0, 3)))
            obs, r, done, trunc, info = env.step(action)
            total += r
            steps += 1
        sps = steps / (time.perf_counter() - t0)
        print(f"episode {ep}: reward={total:.1f} steps={steps} "
              f"steps/s={sps:.1f}")
        rows.append((ep, total, sps))
        if args.video and ep == 0:
            d, f = os.path.split(args.video)
            env.generate_video(d or ".", f)
            env.disable_video_recorder()
        if args.snapshot and ep == 0:
            env.save_env_state(args.snapshot)

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["episode", "reward", "sps"])
            w.writerows(rows)


if __name__ == "__main__":
    main()
