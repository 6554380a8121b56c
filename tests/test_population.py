"""Population training (ppo/population.py + train.py --population).

The seed-lottery antidote: P member policies trained in one vmapped device
program, best member selected by its greedy-eval record.  These tests pin
(1) member i of the population reproduces a solo run with seed master+i,
(2) the tracker's per-member best/selection logic + crash persistence,
(3) the train.py driver end-to-end (selected_best.npz + population.json),
(4) the population axis shards over the virtual 8-device mesh.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.ppo import learner, population
from acas2d_tpu.ppo.config import PPOConfig

P = DEFAULT_PARAMS


def _tiny_cfg(**kw):
    base = dict(n_envs=8, n_steps=16, minibatch_size=32, n_epochs=2,
                total_timesteps=8 * 16 * 2, seed=5)
    base.update(kw)
    return PPOConfig(**base)


def test_population_member_matches_solo_run():
    """Member i's training trajectory == a solo run with seed master+i
    (same init key derivation, same threefry streams), up to vmap
    reduction-order noise."""
    cfg = _tiny_cfg()
    model = ActorCritic()
    pop = 3

    pstate = population.init_population(model, cfg, P, pop)
    pstep = jax.jit(population.make_population_step(model, cfg, P))
    pstate, pmetrics = pstep(pstate)
    pstate, pmetrics = pstep(pstate)

    for i in (0, 2):
        solo_cfg = _tiny_cfg(seed=cfg.seed + i)
        st = learner.init_train_state(
            jax.random.PRNGKey(solo_cfg.seed), model, solo_cfg, P)
        step = jax.jit(learner.make_train_step(model, solo_cfg, P))
        st, _ = step(st)
        st, m = step(st)
        for a, b in zip(jax.tree.leaves(st.params),
                        jax.tree.leaves(
                            population.member_params(pstate.params, i))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(m["loss"]),
                                   float(pmetrics["loss"][i]), rtol=1e-3)


def test_population_eval_per_member():
    """make_population_eval returns (P,) metrics; members with different
    params score differently (distinct fresh episode draws + policies)."""
    cfg = _tiny_cfg(eval_episodes=4)
    model = ActorCritic()
    pstate = population.init_population(model, cfg, P, 4)
    eval_fn = jax.jit(population.make_population_eval(model, cfg, P))
    em = jax.device_get(eval_fn(pstate.params, jax.random.PRNGKey(0)))
    assert em["eval_return_mean"].shape == (4,)
    assert em["eval_done_all"].all()
    assert len(set(np.round(em["eval_return_mean"], 4))) > 1


def test_tracker_selection_and_persistence(tmp_path):
    """Per-member top-k snapshot archive: improvements recorded into the
    member's weakest slot, the persisted npz survives a restart, selection
    is argmax of bests (or of the full-archive reval)."""
    run = str(tmp_path)
    params = {"dense": {"kernel": np.arange(12, dtype=np.float32)
                        .reshape(3, 4)}}

    t = population.PopulationTracker(run, 3, seed=100, k=2)
    assert t.update(10, [5.0, 1.0, 3.0], params) == 3
    # member 1 improves; a second slot fills, the first stays
    p2 = jax.tree.map(lambda x: x + 100.0, params)
    assert t.update(20, [4.0, 2.0, 3.0], p2) == 3   # all have a free slot
    np.testing.assert_array_equal(t.best_vals, [5.0, 2.0, 3.0])
    np.testing.assert_array_equal(t.best_steps, [10, 20, 10])
    # a third eval only enters where it beats the member's weakest slot
    p3 = jax.tree.map(lambda x: x + 200.0, params)
    assert t.update(30, [4.5, 0.5, 1.0], p3) == 1   # only member 0
    assert sorted(t.snap_vals[0]) == [4.5, 5.0]
    np.testing.assert_array_equal(sorted(t.snap_vals[1]), [1.0, 2.0])

    # the archived params rows match the evals that claimed them
    i0_best = int(t.snap_vals[0].argmax())
    np.testing.assert_array_equal(
        t.snap_params["dense"]["kernel"][0, i0_best],
        params["dense"]["kernel"][0])

    # restart: state restored from the persisted npz.  Persistence is
    # time-throttled (save_interval_s), so an orderly shutdown flushes;
    # a crash loses at most save_interval_s of archive progress.
    t.flush()
    t2 = population.PopulationTracker(run, 3, seed=100, k=2)
    np.testing.assert_array_equal(t2.snap_vals, t.snap_vals)
    np.testing.assert_array_equal(
        t2.snap_params["dense"]["kernel"], t.snap_params["dense"]["kernel"])

    s = t2.finalize()
    assert s["selected_member"] == 0 and s["selected_seed"] == 100
    assert s["selected_by"] == "best_training_eval"
    assert os.path.exists(os.path.join(run, "selected_best.npz"))
    assert os.path.exists(os.path.join(run, "population.json"))

    # two-stage selection: a fresh large re-eval of the WHOLE archive
    # overrides the noisy in-training ranking (member 2's snapshot wins
    # despite member 0's higher in-training best)
    reval = np.array([[900.0, 820.0], [800.0, 640.0], [1210.0, 400.0]])
    s = t2.finalize(reval_vals=reval, reval_episodes=256)
    assert s["selected_member"] == 2 and s["selected_by"] == "final_reval"
    assert s["selected_reval"] == 1210.0
    assert s["members_over_1200_reval"] == 1
    # the written artifact is the selected snapshot's params
    from acas2d_tpu.utils.params_io import load_params_npz
    sel = load_params_npz(os.path.join(run, "selected_best.npz"))
    j = int(np.argmax(np.where(np.isfinite(t2.snap_vals[2]),
                               reval[2], -np.inf)))
    np.testing.assert_array_equal(sel["dense"]["kernel"],
                                  t2.snap_params["dense"]["kernel"][2, j])

    # risk-adjusted selection: a higher-mean but high-variance snapshot
    # (rare timeouts/collisions) loses to a consistent one (measured
    # failure modes: reval 1210 -> strict 1167 via 4 timeouts; 1200 ->
    # 1119 via 4 collisions)
    reval = np.array([[1210.0, 0.0], [1195.0, 0.0], [500.0, 0.0]])
    stds = np.array([[350.0, 60.0], [60.0, 60.0], [60.0, 60.0]])
    s = t2.finalize(reval_vals=reval, reval_episodes=256,
                    reval_stds=stds)
    # member 0 slot 0 scores 1210 - 2*350/10 = 1140 < 1195 - 12 = 1183
    assert s["selected_member"] == 1
    assert s["risk_adjusted_selection"] is True
    assert s["selected_reval_std"] == 60.0


def test_finalize_before_any_eval_is_strict_json(tmp_path):
    """A tracker restored from population_best.npz that finalizes before a
    new eval fires has NaN final_vals; the written population.json must
    stay STRICT json (NaN -> null), or external parsers reject it
    (advisor r4)."""
    import json
    run = str(tmp_path)
    params = {"w": np.ones((2, 2), np.float32)}
    t = population.PopulationTracker(run, 2, seed=7, k=2)
    t.update(10, [3.0, 4.0], params)
    # fresh tracker restored from disk: final_vals is NaN until an eval
    t2 = population.PopulationTracker(run, 2, seed=7, k=2)
    s = t2.finalize()
    assert all(v is None for v in s["final_evals"])
    with open(os.path.join(run, "population.json")) as f:
        text = f.read()
    assert "NaN" not in text
    json.loads(text)                     # strict parse succeeds


def test_population_merge_writes_pinned_schema(tmp_path):
    """scripts/population_merge.py folds the stage-1 record into the polish
    population.json — producing exactly the committed-artifact schema that
    tests/test_population_artifacts.py pins (stage1 + pipeline keys)."""
    import json
    import subprocess
    import sys as _sys
    s1 = tmp_path / "stage1"
    s2 = tmp_path / "polish"
    s1.mkdir(); s2.mkdir()
    with open(s1 / "population.json", "w") as f:
        json.dump({"population": 32, "master_seed": 1301,
                   "selected_by": "final_reval"}, f)
    with open(s2 / "population.json", "w") as f:
        json.dump({"population": 16, "master_seed": 1351,
                   "selected_by": "final_reval", "reval_episodes": 512,
                   "selected_reval": 1210.0}, f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts/population_merge.py"),
         str(s1), str(s2), "stage1_population32_fused_update",
         "reval512_risk_adjusted", "polish_population16_fused"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with open(s2 / "population.json") as f:
        merged = json.load(f)
    assert merged["stage1"]["population"] == 32
    assert merged["stage1"]["master_seed"] == 1301
    assert merged["population"] == 16
    assert merged["pipeline"][0].startswith("stage1_")


def test_train_population_driver(tmp_path):
    """train.py --population end to end on tiny shapes: per-iteration
    aggregate rows, population eval rows with the member vector, and the
    selection artifacts."""
    import pandas as pd
    import train as train_main

    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "8", "--n-steps", "16",
        "--total-steps", "512", "--minibatch-size", "32",
        "--n-epochs", "2", "--population", "3", "--eval-every", "256",
        "--checkpoint-every", "512", "--seed", "7", "--reval-episodes", "8",
        "--run-name", "pop", "--out-dir", out])
    assert rc == 0
    run = os.path.join(out, "pop")
    df = pd.read_csv(os.path.join(run, "train.csv"))
    assert list(df["global_step"]) == [128, 256, 384, 512]
    assert "ep_return_max" in df.columns

    ev = [json.loads(l) for l in open(os.path.join(run, "eval.jsonl"))]
    assert len(ev) >= 2
    members = json.loads(ev[-1]["eval_return_members"])
    assert len(members) == 3

    with open(os.path.join(run, "population.json")) as f:
        s = json.load(f)
    assert s["member_seeds"] == [7, 8, 9]
    assert 0 <= s["selected_member"] < 3
    assert np.isfinite(s["selected_training_eval"])
    # default two-stage selection ran (the 8-episode fresh re-eval)
    assert s["selected_by"] == "final_reval"
    assert len(s["reval_evals"]) == 3
    assert s["selected_reval"] == pytest.approx(max(s["reval_evals"]),
                                                abs=0.01)
    # the selected artifact loads and evaluates
    from acas2d_tpu.utils.params_io import load_params_npz
    sel = load_params_npz(os.path.join(run, "selected_best.npz"))
    eval_fn = jax.jit(learner.make_eval_fn(
        ActorCritic(), _tiny_cfg(eval_episodes=4), P))
    m = jax.device_get(eval_fn(sel, jax.random.PRNGKey(1)))
    assert np.isfinite(m["eval_return_mean"])

    with open(os.path.join(run, "summary.json")) as f:
        summ = json.load(f)
    assert summ["population"] == 3
    assert summ["population_selection"]["selected_member"] == s["selected_member"]


def test_best_selection_helper(tmp_path):
    """scripts/best_selection.py: the one shared definition of 'best stage'
    (risk-adjusted score, reval fallback) used by BOTH the pipeline's gate
    and its final pick."""
    from scripts import best_selection
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    with open(a / "population.json", "w") as f:
        json.dump({"selected_score": 1205.0, "selected_reval": 1290.0}, f)
    with open(b / "population.json", "w") as f:
        json.dump({"selected_reval": 1210.0}, f)   # no score: falls back
    bv, bd = best_selection.best([str(a), str(b), str(tmp_path / "gone")])
    assert bd == str(b) and bv == 1210.0           # score vs reval compared
    assert best_selection.stage_score(str(tmp_path / "gone")) is None


def test_train_population_polish_chain(tmp_path):
    """train.py --polish-steps --polish-rounds 2: the in-process chained
    polish runs, each stage warm-starts round-robin from the previous
    stage's top-3 snapshot lineages (stacked top_snapshots.npz), and the
    stage records merge into the pinned pipeline schema."""
    import train as train_main

    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "8", "--n-steps", "16",
        "--total-steps", "512", "--minibatch-size", "32",
        "--n-epochs", "2", "--population", "3", "--eval-every", "256",
        "--checkpoint-every", "512", "--seed", "11", "--reval-episodes", "8",
        "--polish-steps", "256", "--polish-pop", "2", "--polish-rounds", "2",
        "--run-name", "chain", "--out-dir", out])
    assert rc == 0
    for stage in ("chain", "chain_polish", "chain_polish_polish"):
        run = os.path.join(out, stage)
        assert os.path.exists(os.path.join(run, "population.json")), stage
        assert os.path.exists(os.path.join(run, "selected_best.npz")), stage
        assert os.path.exists(os.path.join(run, "top_snapshots.npz")), stage
    # stacked top-snapshots artifact carries the lineage marker
    from acas2d_tpu.utils.params_io import load_params_npz
    tree = load_params_npz(os.path.join(out, "chain", "top_snapshots.npz"))
    n = int(np.asarray(tree.pop("__stack_n__")))
    assert 1 <= n <= 3
    for leaf in jax.tree.leaves(tree):
        assert leaf.shape[0] == n
    # merged pipeline records: polish carries the stage-1 record, the
    # second polish carries the first's
    with open(os.path.join(out, "chain_polish", "population.json")) as f:
        p1 = json.load(f)
    assert p1["stage1"]["population"] == 3
    with open(os.path.join(out, "chain_polish_polish",
                           "population.json")) as f:
        p2 = json.load(f)
    assert p2["stage1"]["population"] == 2
    assert p2["top_snapshots"][0]["rank_value"] is not None


def test_population_fused_update_matches_xla():
    """cfg.fused_update in population mode: vmap extends the fused
    fwd+bwd kernel's grid over members (interpret mode on CPU); a full
    vmapped train_step must track the XLA-update vmapped step to f32
    rounding — same rollout/shuffle RNG, only the minibatch-gradient
    path differs."""
    cfg_x = _tiny_cfg(n_envs=8, n_steps=32, minibatch_size=128,
                      total_timesteps=8 * 32)
    import dataclasses
    cfg_f = dataclasses.replace(cfg_x, fused_update=True)
    model = ActorCritic()
    pop = 2

    st = population.init_population(model, cfg_x, P, pop)
    st_x, m_x = jax.jit(population.make_population_step(model, cfg_x, P))(st)
    st_f, m_f = jax.jit(population.make_population_step(model, cfg_f, P))(st)

    assert m_f["loss"].shape == (pop,)
    np.testing.assert_allclose(np.asarray(m_f["loss"]),
                               np.asarray(m_x["loss"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st_x.params),
                    jax.tree.leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_population_packed_update_matches_fused():
    """cfg.fused_update_packed in population mode: the whole vmapped
    epochs x minibatches loop runs on packed-layout params/moments (one
    pack+unpack per train_step).  Must track the per-grad-step-packed
    fused population step to float rounding — the only difference is the
    global-norm summation order over 7 vs 11 leaves."""
    import dataclasses
    cfg_f = _tiny_cfg(n_envs=8, n_steps=32, minibatch_size=128,
                      total_timesteps=8 * 32, fused_update=True)
    cfg_p = dataclasses.replace(cfg_f, fused_update_packed=True)
    model = ActorCritic()
    pop = 2

    st = population.init_population(model, cfg_f, P, pop)
    st_f, m_f = jax.jit(population.make_population_step(model, cfg_f, P))(st)
    st_p, m_p = jax.jit(population.make_population_step(model, cfg_p, P))(st)

    np.testing.assert_allclose(np.asarray(m_p["loss"]),
                               np.asarray(m_f["loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_f.params),
            jax.tree_util.tree_leaves_with_path(st_p.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
    # opt state round-trips to the SAME flax-tree structure (checkpoint
    # schema unchanged by the packed mode)
    assert (jax.tree_util.tree_structure(st_f.opt_state)
            == jax.tree_util.tree_structure(st_p.opt_state))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_population_packed_update_shard_mapped_over_mesh():
    """The SHIPPED fast path (population + fused_update_packed) under
    shard_map over the member axis matches the unsharded packed step."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_cfg(n_envs=8, n_steps=32, minibatch_size=128,
                    total_timesteps=8 * 32, fused_update=True,
                    fused_update_packed=True)
    model = ActorCritic()
    pop = 8
    st = population.init_population(model, cfg, P, pop)
    st_ref, m_ref = jax.jit(
        population.make_population_step(model, cfg, P))(st)
    mesh = mesh_lib.make_mesh()
    st_sh = mesh_lib.shard_env_pytree(st, mesh)
    st_out, m_out = jax.jit(population.make_population_step(
        model, cfg, P, mesh=mesh))(st_sh)
    np.testing.assert_allclose(np.asarray(m_out["loss"]),
                               np.asarray(m_ref["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_out.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_population_fused_update_shard_mapped_over_mesh():
    """population + fused_update on a multi-device mesh: the vmapped
    kernel step runs under shard_map over the member axis (each device
    trains its local members, zero collectives) and matches the unsharded
    vmapped step."""
    import dataclasses
    from acas2d_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_cfg(n_envs=8, n_steps=32, minibatch_size=128,
                    total_timesteps=8 * 32, fused_update=True)
    model = ActorCritic()
    pop = 8
    st = population.init_population(model, cfg, P, pop)

    st_ref, m_ref = jax.jit(
        population.make_population_step(model, cfg, P))(st)

    mesh = mesh_lib.make_mesh()
    st_sh = mesh_lib.shard_env_pytree(st, mesh)
    st_out, m_out = jax.jit(population.make_population_step(
        model, cfg, P, mesh=mesh))(st_sh)

    np.testing.assert_allclose(np.asarray(m_out["loss"]),
                               np.asarray(m_ref["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_out.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_population_axis_shards_over_mesh():
    """Population leaves shard member-wise over the ('env',) mesh (fully
    independent members, zero collectives) and a vmapped step executes."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    cfg = _tiny_cfg()
    model = ActorCritic()
    pstate = population.init_population(model, cfg, P, 8)
    mesh = mesh_lib.make_mesh()
    pstate = mesh_lib.shard_env_pytree(pstate, mesh)
    pstep = jax.jit(population.make_population_step(model, cfg, P))
    pstate, m = pstep(pstate)
    assert np.isfinite(np.asarray(m["loss"])).all()
    assert m["loss"].shape == (8,)
