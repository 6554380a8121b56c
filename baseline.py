"""Scripted-policy baseline driver (baseline_main.py / gym_main.py rebuilt).

Runs N episodes under a scripted policy and writes the reference's CSV
schema.  In `--exact` mode (default) episodes spawn from the seed-13
Mersenne stream at the reference's stream offset and step in float64 on CPU,
reproducing `models/logs/baseline_ACAS2D_PPO_11_100.csv`: outcomes, step
counts and aggregates exactly; trajectories bit-for-bit in 90/100 episodes
and within 1e-10 px otherwise (XLA FMA contraction vs libm; verified in
tests/test_drivers.py).

Policies (gym_main.py:35-41 variants):
    zero        action = 0                      (baseline_main.py:44)
    mod3        action = (episode % 3) - 1      (gym_main.py:36)
    cosine      action = cos(2*pi*t/360)        (gym_main.py:35, commented)

Example:
    python baseline.py --episodes 100 --out runs/baseline.csv
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--episodes", type=int, default=100)   # TEST_EPISODES
    p.add_argument("--policy", choices=["zero", "mod3", "cosine", "replay"],
                   default="zero")
    p.add_argument("--actions-file", default=None,
                   help="with --policy replay: .npy or text file of actions "
                        "in [-1,1], replayed per episode (padded with its "
                        "last value) — the gym_main.py recorded-actions "
                        "use case (gym_main.py:14,38-41)")
    p.add_argument("--out", default="runs/baseline.csv")
    p.add_argument("--full-telemetry", action="store_true",
                   help="write all testing_main.py columns, not just the "
                        "baseline_main.py subset")
    p.add_argument("--exact", dest="exact", action="store_true", default=True,
                   help="float64 CPU + Mersenne spawn stream (default)")
    p.add_argument("--fast", dest="exact", action="store_false",
                   help="float32 on the default backend")
    p.add_argument("--skip-episodes", type=int, default=2,
                   help="spawn-stream offset; the reference burns 2 spawns "
                        "(gym.make + check_env) before episode 1")
    p.add_argument("--seed", type=int, default=13)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.exact:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from acas2d_tpu.config import DEFAULT_PARAMS, EnvParams, OUTCOME_NAMES
    from acas2d_tpu.envs import core, telemetry
    from acas2d_tpu.oracle import MersenneSpawner
    from acas2d_tpu.utils import episode_csv

    P = DEFAULT_PARAMS if args.seed == 13 else EnvParams(seed=args.seed)
    dtype = jnp.float64 if args.exact else jnp.float32
    B = args.episodes
    T = P.max_steps

    spawner = MersenneSpawner(P, skip_episodes=args.skip_episodes)
    inits = spawner.spawn_batch(B)
    psi = np.array([i.player_psi for i in inits])
    tx = np.stack([i.traffic_x for i in inits])
    ty = np.stack([i.traffic_y for i in inits])
    tv = np.stack([i.traffic_v for i in inits])
    tpsi = np.stack([i.traffic_psi for i in inits])
    nt = np.array([i.num_traffic for i in inits])

    # (T, B) scripted actions.
    t_idx = np.arange(T)[:, None]
    ep_idx = np.arange(1, B + 1)[None, :]
    if args.policy == "zero":
        actions = np.zeros((T, B))
    elif args.policy == "mod3":
        actions = np.broadcast_to((ep_idx % 3) - 1, (T, B)).astype(float)
    elif args.policy == "replay":
        if not args.actions_file:
            raise SystemExit("--policy replay requires --actions-file")
        if args.actions_file.endswith(".npy"):
            seq = np.load(args.actions_file).reshape(-1)
        else:
            seq = np.loadtxt(args.actions_file).reshape(-1)
        padded = np.full(T, seq[-1], dtype=float)
        padded[:min(T, len(seq))] = seq[:T]
        actions = np.broadcast_to(padded[:, None], (T, B)).astype(float)
    else:
        actions = np.broadcast_to(
            np.cos(((t_idx % 360) / 360) * 2 * np.pi), (T, B)).astype(float)

    @jax.jit
    def run(psi, tx, ty, tv, tpsi, nt, actions):
        def one(psi, tx, ty, tv, tpsi, nt, acts):
            state, _ = core.reset_from(psi, tx, ty, tv, tpsi, nt, P, dtype)
            init = telemetry.initial_telemetry(state, P)
            final, tel = telemetry.rollout_telemetry(state, acts, P)
            return init, tel
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 1))(
            psi, tx, ty, tv, tpsi, nt, jnp.asarray(actions, dtype))

    init, tel = jax.device_get(run(psi, tx, ty, tv, tpsi, nt, actions))

    episodes = []
    for b in range(B):
        tel_b = jax.tree.map(lambda x: x[b], tel)
        init_b = {k: v[b] for k, v in init.items()}
        done_idx = np.nonzero(np.asarray(tel_b.done))[0]
        k = int(done_idx[0]) + 1 if done_idx.size else T
        rec = episode_csv.episode_records(init_b, tel_b, k, int(nt[b]))
        episodes.append(rec)
        print(f"Episode {b+1:<3}: Time steps: {k-1:<7} - "
              f"Outcome: {rec['Outcome']:<10} - "
              f"Total Reward = {rec['Total Reward']}")

    cols = (episode_csv.FULL_COLUMNS if args.full_telemetry
            else episode_csv.BASELINE_COLUMNS)
    df = episode_csv.to_dataframe(episodes, cols)
    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    df.to_csv(args.out, index=False)

    outcomes = [e["Outcome"] for e in episodes]
    print(f"\n{B} episodes | "
          f"Goal {outcomes.count('Goal')} / "
          f"Collision {outcomes.count('Collision')} / "
          f"Timeout {outcomes.count('Timeout')} | "
          f"mean reward {np.mean([e['Total Reward'] for e in episodes]):.2f} | "
          f"mean steps {np.mean([e['Time Steps'] for e in episodes]):.2f}",
          file=sys.stderr)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
