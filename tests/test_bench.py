"""bench.py driver-mode smokes (CPU backend, tiny sizes).

The sharded measurement paths are covered by
tests/test_sharding.py::test_scaling_bench_harness; these pin the
top-level mode drivers — JSON shape, CPU-backend fused-variant skip, and
the multi-traffic comparison — so a flag refactor cannot silently break
the committed benchmark entry points.
"""

import argparse
import json

import numpy as np

import bench


def test_train_main_smoke(capsys):
    args = argparse.Namespace(train_envs=64, train_steps=16, fused="on",
                              train_minibatch=0)
    assert bench.train_main(args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unit"] == "env-steps/s"
    # CPU backend: fused variants are skipped (the pallas interpreter
    # would run them at full size), only the XLA row remains
    assert set(out["paths"]) == {"xla"}
    assert np.isfinite(out["value"]) and out["value"] > 0


def test_multi_traffic_main_smoke(capsys):
    args = argparse.Namespace(multi_traffic=3, mt_envs=512)
    assert bench.multi_traffic_main(args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out["paths"]) == {"traffic1", "traffic3"}
    assert out["relative_cost"] > 0
    assert np.isfinite(out["value"]) and out["value"] > 0


def test_measure_returns_per_repeat_spread():
    rates = bench.measure(B=256, T=8, iters=1, repeats=2)
    assert len(rates) == 2 and all(r > 0 for r in rates)
    rates_obs = bench.measure(B=256, T=8, iters=1, repeats=2, with_obs=True)
    assert len(rates_obs) == 2 and all(r > 0 for r in rates_obs)
