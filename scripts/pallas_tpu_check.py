"""On-chip validation of the fused Pallas rollout kernel vs the XLA engine.

The interpret-mode tests (tests/test_pallas.py) validate kernel semantics on
CPU; this script runs the SAME two comparisons on the real TPU (Mosaic
lowering), where interpret mode proves nothing:

  1. deterministic: forced-zero actions from identical initial states for
     64 steps (before any termination) — positions within f32-accumulation
     tolerance of the jnp engine, step counters exact;
  2. statistical: long random-action autoreset rollouts (independent RNG
     streams, identical action distribution) — per-episode goal/collision/
     timeout rates and mean episode length within binomial noise of the XLA
     engine.

Prints one JSON line; exit 0 = pass, 1 = fail, 0 with {"skipped": ...} when
no TPU is attached.  Run directly or via
tests/test_pallas.py::test_fused_rollout_on_tpu (subprocess, auto-skip).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        print(json.dumps({"skipped": f"no TPU (platform="
                          f"{jax.devices()[0].platform})"}))
        return 0

    from acas2d_tpu.config import DEFAULT_PARAMS as P
    from acas2d_tpu.envs import vector
    from acas2d_tpu.ops import pallas_step

    failures = []

    # ---- 1. deterministic zero-action comparison (T=64 < first possible
    #         termination; same tolerances as the interpret-mode test)
    B = pallas_step.LANES
    T = 64
    s, _ = jax.jit(lambda k: vector.reset_batch(k, B, P, jnp.float32))(
        jax.random.PRNGKey(42))

    def run_jnp(s):
        def body(st, _):
            st, out = vector.step_autoreset_batch(
                st, jnp.zeros((B,), jnp.float32), P)
            return st, out.reward
        return jax.lax.scan(body, s, None, length=T)

    stj, rj = jax.jit(run_jnp)(s)
    stp, stats = jax.jit(lambda *a: pallas_step.fused_rollout(
        *a, seed=7, T=T, params=P, zero_actions=True))(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward)

    det = {}
    for name, a, b in [("px", stj.px, stp["px"]), ("py", stj.py, stp["py"]),
                       ("psi", stj.ppsi, stp["psi"]),
                       ("tx", stj.tx[:, 0], stp["tx"]),
                       ("ty", stj.ty[:, 0], stp["ty"])]:
        err = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        det[f"max_abs_err_{name}"] = err
        if err > 2e-2:
            failures.append(f"deterministic {name} err {err}")
    if not np.array_equal(np.asarray(stj.steps), np.asarray(stp["steps"])):
        failures.append("deterministic step counters differ")
    r_err = float(np.abs(np.asarray(rj.sum(0))
                         - np.asarray(stats["reward_sum"])).max())
    det["max_abs_err_reward_sum"] = r_err
    if r_err > 2e-3 + 2e-3 * float(np.abs(np.asarray(rj.sum(0))).max()):
        failures.append(f"deterministic reward err {r_err}")

    # ---- 2. statistical outcome-mix comparison under random actions
    B2, T2 = 65536, 2048
    s2, _ = jax.jit(lambda k: vector.reset_batch(k, B2, P, jnp.float32))(
        jax.random.PRNGKey(5))
    _, pstats = jax.jit(lambda *a: pallas_step.fused_rollout(
        *a, seed=11, T=T2, params=P))(
        s2.px, s2.py, s2.ppsi, s2.tx[:, 0], s2.ty[:, 0], s2.tv[:, 0],
        s2.tpsi[:, 0], s2.steps, s2.total_reward)

    def run_xla(s, k):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B2,), jnp.float32, -1, 1)
            st, out = vector.step_autoreset_batch(st, a, P)
            return (st, k), (out.done, out.outcome)
        (_, _), (done, outcome) = jax.lax.scan(body, (s, k), None, length=T2)
        return done, outcome

    done, outcome = jax.jit(run_xla)(s2, jax.random.PRNGKey(17))
    done = np.asarray(done)
    outcome = np.asarray(outcome)
    ep_x = int(done.sum())
    goal_x = int(((outcome == 1) & done).sum())
    coll_x = int(((outcome == 2) & done).sum())

    ep_p = int(np.asarray(pstats["episodes"]).sum())
    goal_p = int(np.asarray(pstats["goals"]).sum())
    coll_p = int(np.asarray(pstats["collisions"]).sum())

    stat = {"episodes": [ep_p, ep_x], "goal_rate":
            [goal_p / ep_p, goal_x / ep_x],
            "collision_rate": [coll_p / ep_p, coll_x / ep_x]}
    # binomial 5-sigma band on the rate difference
    for key in ("goal_rate", "collision_rate"):
        a, b = stat[key]
        pbar = (a + b) / 2
        sigma = math.sqrt(max(pbar * (1 - pbar), 1e-9) *
                          (1 / ep_p + 1 / ep_x))
        if abs(a - b) > 5 * sigma + 1e-4:
            failures.append(f"statistical {key}: pallas {a:.5f} vs "
                            f"xla {b:.5f} (5-sigma {5*sigma:.5f})")
    # episode throughput (mean episode length) within 2%
    if abs(ep_p - ep_x) > 0.02 * max(ep_p, ep_x):
        failures.append(f"episode counts differ >2%: {ep_p} vs {ep_x}")

    print(json.dumps({"ok": not failures, "failures": failures,
                      "deterministic": det, "statistical": stat}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
