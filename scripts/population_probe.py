"""In-situ population-training throughput probe (one v5e chip).

Measures the FULL vmapped population train step at the shipped preset
shape (2048 envs x 128 steps, minibatch 65536) for each update variant,
with a 10-epoch vs 2-epoch differential to isolate the per-grad-step cost
— the methodology that exposed round 4's DMA-latency pathology (isolated
kernel micro-benches on this tunneled backend are dispatch-inflated and
misleading; docs/PERFORMANCE.md 'Population training throughput').

    timeout 1500 python scripts/population_probe.py [--pop 16] \
        [--variants xla,fused,packed]

Prints one JSON line per variant and a summary; flushes results to
/tmp/chip_session/population_probe.json as it goes (a mid-run tunnel wedge
keeps completed variants).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_variant(pop: int, cfg, iters: int, repeats: int = 2) -> dict:
    import jax

    from acas2d_tpu.config import DEFAULT_PARAMS
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import population

    model = ActorCritic()
    st = population.init_population(model, cfg, DEFAULT_PARAMS, pop)
    loop = jax.jit(population.make_population_loop(
        model, cfg, DEFAULT_PARAMS, iters), donate_argnums=(0,))
    t0 = time.perf_counter()
    st, m = loop(st)
    np.asarray(m["loss"])                 # host transfer = sync barrier
    first_s = time.perf_counter() - t0
    best_dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, m = loop(st)
        np.asarray(m["loss"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    assert np.isfinite(np.asarray(m["loss"])).all()
    agg = pop * cfg.batch_size / best_dt
    return {"iter_ms": round(best_dt * 1e3, 1),
            "agg_steps_per_s": round(agg, 0),
            "first_call_s": round(first_s, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--iters", type=int, default=4,
                    help="iterations fused per device call (dispatch "
                         "amortization, like train.py --iters-per-call)")
    ap.add_argument("--variants", default="fused,packed",
                    help="comma list from {xla,fused,packed}")
    ap.add_argument("--epochs-diff", action="store_true",
                    help="also measure 2-epoch variants (differential "
                         "isolates the per-grad-step update cost)")
    args = ap.parse_args(argv)

    from acas2d_tpu.ppo.config import tpu_default

    base = tpu_default()
    variants = {
        "xla": base,
        "fused": dataclasses.replace(base, fused_update=True),
        "packed": dataclasses.replace(base, fused_update=True,
                                      fused_update_packed=True),
        # member-grid fused rollout (+ fused/packed update): the full
        # kernelized population step
        "rollfused": dataclasses.replace(base, fused_rollout=True,
                                         fused_update=True),
        "rollpacked": dataclasses.replace(base, fused_rollout=True,
                                          fused_update=True,
                                          fused_update_packed=True),
    }
    out = {"pop": args.pop, "shape": "2048x128 mb65536",
           "iters_per_call": args.iters}
    os.makedirs("/tmp/chip_session", exist_ok=True)
    for name in args.variants.split(","):
        cfg = variants[name]
        for epochs in ([10, 2] if args.epochs_diff else [10]):
            cfg_e = dataclasses.replace(cfg, n_epochs=epochs)
            label = name if epochs == 10 else f"{name}_ep{epochs}"
            try:
                r = measure_variant(args.pop, cfg_e, args.iters)
            except Exception as e:
                r = {"error": f"{type(e).__name__}: {e}"}
            out[label] = r
            print(json.dumps({label: r}), flush=True)
            with open("/tmp/chip_session/population_probe.json", "w") as f:
                json.dump(out, f)
    # differential: (10ep - 2ep) / 8 epochs -> per-epoch update cost
    for name in args.variants.split(","):
        a, b = out.get(name), out.get(f"{name}_ep2")
        if isinstance(a, dict) and isinstance(b, dict) and \
                "iter_ms" in a and "iter_ms" in b:
            out[f"{name}_update_ms_per_epoch"] = round(
                (a["iter_ms"] - b["iter_ms"]) / 8.0, 2)
    print(json.dumps(out), flush=True)
    with open("/tmp/chip_session/population_probe.json", "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
