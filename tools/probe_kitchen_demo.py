"""Diagnose the kitchen demonstrator ceiling: per-task success and step
cost, split by chain position (VERDICT r4 item 5 — separate 'task script
is unreliable' from 'episode budget exhausts').

Usage: python tools/probe_kitchen_demo.py [--episodes 24] [--order ...]
"""

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from make_kitchen_dataset import EVAL_TASKS, KitchenScripter  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--order", default=None,
                    help="comma-joined fixed task order (default: random "
                         "permutations like the generator)")
    args = ap.parse_args()

    from cleandiffuser_tpu.env.kitchen import make_kitchen_env

    rng = np.random.default_rng(args.seed)
    env = make_kitchen_env(EVAL_TASKS)
    stats = defaultdict(lambda: [0, 0, 0])   # task -> [tries, wins, steps]
    by_pos = defaultdict(lambda: [0, 0])     # (task, pos) -> [tries, wins]
    completions = []
    for ep in range(args.episodes):
        sc = KitchenScripter(env, rng, noise=args.noise)
        sc.reset(seed=args.seed * 100_003 + ep)
        order = (args.order.split(",") if args.order
                 else list(rng.permutation(EVAL_TASKS)))
        got = 0
        for pos, task in enumerate(order):
            if sc.done:
                break
            s0 = sc.steps
            ok = bool(KitchenScripter.TASKS[task](sc))
            stats[task][0] += 1
            stats[task][1] += ok
            stats[task][2] += sc.steps - s0
            by_pos[(task, pos)][0] += 1
            by_pos[(task, pos)][1] += ok
            got += ok
        completions.append(got)
        print(f"ep {ep}: order={order} got={got} steps={sc.steps}",
              flush=True)
    env.close()

    print("\n== per-task ==")
    for t, (n, w, s) in sorted(stats.items()):
        print(f"{t:15s} tries={n:3d} win%={100 * w / max(n, 1):5.1f} "
              f"steps/try={s / max(n, 1):6.1f}")
    print("\n== per (task, position) ==")
    for (t, p), (n, w) in sorted(by_pos.items()):
        print(f"{t:15s} pos{p} tries={n:3d} win%={100 * w / max(n, 1):5.1f}")
    comp = np.asarray(completions)
    print(f"\nmean completions {comp.mean():.2f} "
          f"dist {np.bincount(comp, minlength=5).tolist()}")


if __name__ == "__main__":
    main()
