"""One consolidated on-chip measurement session.

The tunneled TPU grant on this rig wedges intermittently (any device op
hangs; bench.py:_accelerator_healthy documents it), so chip work is batched
into ONE process that runs every on-chip validation/benchmark phase
sequentially and flushes each phase's JSON to /tmp/chip_session/ as it
completes — a mid-session wedge keeps everything already measured.

Phases:
  1. kernel validation (scripts/pallas_tpu_check.py main) -> check.json
  2. end-to-end PPO training bench, all variants          -> train.json
  3. env-stepping headline + obs-inclusive variant        -> headline.json
  4. multi-traffic XLA engine cost                        -> multitraffic.json

Run: timeout 1800 python scripts/chip_session.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/chip_session"


def _write(name, payload):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(payload, f)
    print(f"[chip_session] wrote {name}: {json.dumps(payload)[:200]}",
          flush=True)


def main() -> int:
    import jax

    if jax.devices()[0].platform != "tpu":
        print("no TPU; aborting", file=sys.stderr)
        return 1

    t0 = time.time()

    # ---- 1. kernel validation (rollout kernels + fused update grads)
    try:
        import scripts.pallas_tpu_check as check
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = check.main()
        payload = json.loads(buf.getvalue())
        _write("check.json", payload)
        print(f"[chip_session] check rc={rc} t={time.time()-t0:.0f}s",
              flush=True)
    except Exception as e:
        _write("check.json", {"error": f"{type(e).__name__}: {e}"})

    # ---- 2. end-to-end training bench: the SHIPPED preset shape (2048
    #         envs — what produces the committed policies) plus the 4096
    #         best-case for continuity with earlier rounds
    import bench
    devs = jax.devices()
    rows = {}
    for label, envs, fr, fu, lk in [
            ("preset2048_xla", 2048, False, False, 1),
            ("preset2048_fused_rollout+loop32", 2048, True, False, 32),
            ("preset2048_fused_rollout+update+loop32", 2048, True, True, 32),
            ("best4096_fused_rollout+loop32", 4096, True, False, 32),
            ("best4096_fused_rollout+loop64", 4096, True, False, 64)]:
        try:
            rows[label] = round(bench.measure_train_at(
                devs, envs, 128, fused=fr, fused_update=fu, loop_k=lk), 1)
        except Exception as e:
            rows[label] = f"unavailable ({type(e).__name__}: {e})"
        _write("train.json", rows)
        print(f"[chip_session] train {label} t={time.time()-t0:.0f}s",
              flush=True)

    # ---- 3. headline + obs-inclusive
    try:
        rates = bench.measure_pallas()
        rates_obs = bench.measure_pallas(with_obs=True)
        _write("headline.json", {
            "repeats": [round(r, 1) for r in rates],
            "repeats_with_obs": [round(r, 1) for r in rates_obs]})
    except Exception as e:
        _write("headline.json", {"error": f"{type(e).__name__}: {e}"})
    print(f"[chip_session] headline t={time.time()-t0:.0f}s", flush=True)

    # ---- 3b. population pipeline device rate (the shipped pipeline
    #          shape: 32 members x 1024 envs, member-grid fused rollout +
    #          packed fused update — scripts/population_pipeline.sh)
    try:
        import dataclasses
        from scripts.population_probe import measure_variant
        from acas2d_tpu.ppo.config import tpu_default
        cfg = dataclasses.replace(
            tpu_default(n_envs=1024, minibatch_size=32768),
            fused_rollout=True, fused_update=True, fused_update_packed=True)
        r = measure_variant(32, cfg, iters=4)
        r["agg_note"] = "32 members x 131072-step batches per iteration"
        _write("population.json", {"p32_rollpacked_1024": r})
    except Exception as e:
        _write("population.json", {"error": f"{type(e).__name__}: {e}"})
    print(f"[chip_session] population t={time.time()-t0:.0f}s", flush=True)

    # ---- 4. multi-traffic XLA engine cost
    try:
        import dataclasses
        from acas2d_tpu.config import DEFAULT_PARAMS
        P3 = dataclasses.replace(DEFAULT_PARAMS, min_traffic=3, max_traffic=3)
        r1 = bench.measure(B=65536, T=128, iters=4, repeats=2, with_obs=True)
        r3 = bench.measure(B=65536, T=128, iters=4, repeats=2, with_obs=True,
                           params=P3)
        _write("multitraffic.json", {
            "traffic1_obs": round(max(r1), 1),
            "traffic3_obs": round(max(r3), 1),
            "relative_cost": round(max(r1) / max(r3), 2)})
    except Exception as e:
        _write("multitraffic.json", {"error": f"{type(e).__name__}: {e}"})
    print(f"[chip_session] done t={time.time()-t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
