"""Re-run the two-stage selection of a finished population run.

The tracker persists every member's best snapshot in
`<run>/population_best.npz`, so selection can be redone (e.g. after the
two-stage re-eval landed, or with more re-eval episodes) without
retraining:

    python scripts/population_reselect.py --run runs/ppo/<name> \
        [--episodes 256] [--seed 13]

Overwrites `<run>/selected_best.npz` and `<run>/population.json`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", required=True)
    ap.add_argument("--episodes", type=int, default=256)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    args = ap.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp

    from acas2d_tpu.config import DEFAULT_PARAMS
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import population
    from acas2d_tpu.ppo.config import PPOConfig

    with open(os.path.join(args.run, "population.json")) as f:
        prev = json.load(f)
    pop, seed = prev["population"], prev["master_seed"]
    tracker = population.PopulationTracker(
        args.run, pop, seed, k=prev.get("snapshots_per_member", 6))
    assert tracker.snap_params is not None, (
        f"no persisted member snapshots under {args.run}")

    cfg = PPOConfig(seed=seed, eval_episodes=args.episodes)
    model = ActorCritic()
    reval_fn = jax.jit(population.make_population_eval(
        model, cfg, DEFAULT_PARAMS))
    flat_params, _ = tracker.snapshots_flat()
    bp = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), flat_params)
    rm = jax.device_get(reval_fn(bp, jax.random.PRNGKey(seed + 99)))
    summary = tracker.finalize(rm["eval_return_mean"],
                               reval_episodes=args.episodes,
                               reval_stds=rm["eval_return_std"])
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
