"""PPO training driver (the reference's training_main.py, rebuilt TPU-native).

Replaces the SB3 loop (training_main.py:17-54) with fully on-device jitted
iterations: each train_step runs the rollout (vmapped autoreset envs), GAE,
and all PPO epochs without host round-trips.  Periodic greedy evaluation
(EvalCallback equivalent), orbax checkpoints with true resume (the reference
had none), CSV/JSONL/TensorBoard metrics.

Examples:
    python train.py                         # reference config of record
                                            # (1 env, 2048 steps, 1,048,576 total)
    python train.py --preset tpu            # 4096 envs, TPU-sized batches
    python train.py --n-envs 2048 --n-steps 128 --total-steps 8388608
    python train.py --resume                # continue from latest checkpoint
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from acas2d_tpu.config import DEFAULT_PARAMS, EnvParams
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.parallel import mesh as mesh_lib
from acas2d_tpu.ppo import learner
from acas2d_tpu.ppo.config import PPOConfig, tpu_default
from acas2d_tpu.utils.checkpoint import CheckpointManager
from acas2d_tpu.utils.logging import MetricsLogger
from acas2d_tpu.utils import profiling


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=["reference", "tpu"], default="reference")
    p.add_argument("--n-envs", type=int, default=None)
    p.add_argument("--n-steps", type=int, default=None)
    p.add_argument("--total-steps", type=int, default=None)
    p.add_argument("--minibatch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--n-epochs", type=int, default=None)
    p.add_argument("--ent-coef", type=float, default=None)
    p.add_argument("--shuffle-block", type=int, default=None,
                   help="epoch-shuffle block size in rows (1 = exact SB3 "
                        "row shuffle; default auto: 512 at minibatch>=32768)")
    p.add_argument("--anneal-lr", action="store_true",
                   help="linear LR decay to 0 over the run")
    p.add_argument("--fused-rollout", action="store_true",
                   help="collect rollouts with the fused policy-in-kernel "
                        "Pallas rollout (ops/pallas_policy.py; TPU only): "
                        "one kernel launch per --fused-chunk steps instead "
                        "of a scan of separate policy/env kernels")
    p.add_argument("--fused-chunk", type=int, default=None,
                   help="steps per fused rollout launch (default 16)")
    p.add_argument("--fused-update-bf16", action="store_true",
                   help="explicitly cast the fused update kernel's MXU "
                        "operands to bf16. On v5e this is a verified "
                        "no-op (Mosaic's default f32 dot already "
                        "quantizes operands to bf16 — "
                        "ppo/config.py:fused_update_bf16); kept for "
                        "other targets")
    p.add_argument("--fused-update", action="store_true",
                   help="compute each PPO minibatch gradient with the fused "
                        "Pallas forward+backward kernel "
                        "(ops/pallas_update.py; TPU only; multi-device runs "
                        "shard_map it over the env mesh; per-device "
                        "minibatch shard %% 128 == 0)")
    p.add_argument("--fused-update-packed", action="store_true",
                   help="run the fused update's whole epochs x minibatches "
                        "loop on packed-layout parameters (one pack/unpack "
                        "per train_step instead of six scatters per grad "
                        "step; Adam on a few big tensors instead of ~11 "
                        "small per-tower leaves). Implies --fused-update; "
                        "semantically identical gradients (off-diagonal "
                        "packing artifacts masked). The big win is "
                        "--population runs, whose vmapped per-member "
                        "small-tile updates are DMA-latency-bound")
    p.add_argument("--population", type=int, default=0, metavar="P",
                   help="train P independent member policies in ONE device "
                        "program (vmap of the full train_step over a "
                        "population axis; member i == a solo run with "
                        "--seed seed+i) and select the best member by its "
                        "greedy-eval record at the end — the antidote to "
                        "PPO's ~1-in-3 seed lottery at the flagship shape "
                        "(ppo/population.py). Writes selected_best.npz + "
                        "population.json into the run dir. Composes with "
                        "--fused-update (vmap extends the update kernel's "
                        "grid over members; 3x the XLA update), "
                        "--fused-update-packed, --fused-rollout (the "
                        "member-grid kernel rolls every member's envs in "
                        "one launch; needs n_envs %% 1024 == 0), and "
                        "--init-params-npz (polish stage). Multi-device "
                        "runs shard members across chips")
    p.add_argument("--polish-steps", type=int, default=0, metavar="N",
                   help="population mode: after selection, run an "
                        "IN-PROCESS polish stage — a fresh population "
                        "warm-started from the selected policy, trained N "
                        "more steps at --polish-lr, with its own "
                        "risk-adjusted re-eval selection. One command then "
                        "covers the full pipeline "
                        "(scripts/sub_minute.sh), and the second stage "
                        "skips process startup + backend acquisition "
                        "(~8-25 s on the tunneled rig)")
    p.add_argument("--polish-pop", type=int, default=0,
                   help="polish population size (default population // 2)")
    p.add_argument("--polish-lr", type=float, default=1e-4)
    p.add_argument("--polish-rounds", type=int, default=1,
                   help="chain this many polish stages (each warm-starts "
                        "round-robin from the previous stage's top-3 "
                        "snapshot lineages; a second round costs ~30 s "
                        "and lifts plateaued winners)")
    p.add_argument("--reval-episodes", type=int, default=256,
                   help="population mode: episodes of the fresh end-of-run "
                        "re-eval of every member's best snapshot that "
                        "drives the final selection (0 = select by the "
                        "noisy in-training best evals)")
    p.add_argument("--seed", type=int, default=13)
    p.add_argument("--out-dir", default="runs/ppo")
    p.add_argument("--run-name", default=None)
    p.add_argument("--checkpoint-every", type=int, default=32768,
                   help="global steps between checkpoints (reference: "
                        "32768). Effective cadence is at least the steps "
                        "per device call (iters_per_call * batch_size): "
                        "checkpoints fire between calls only")
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--eval-episodes", type=int, default=None,
                   help="episodes per periodic eval (default: the "
                        "reference's 10). Population selection maximizes "
                        "over many noisy evals — a 10-episode mean has "
                        "sigma ~27 on this task, so population runs want "
                        "24-32 to keep the argmax from chasing noise")
    p.add_argument("--exact-eval", action="store_true",
                   help="evaluate via the reference's Mersenne-stream "
                        "protocol (host spawns + reset_from from ONE "
                        "continuing stream, like eval.py --exact) instead "
                        "of fresh threefry spawns: the eval curve becomes "
                        "protocol-identical to evaluations.npz")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-params-npz", default=None,
                   help="warm-start the policy from a flat-npz params "
                        "artifact (utils/params_io.py); optimizer, env "
                        "state, and step counter start fresh")
    p.add_argument("--iters-per-call", type=int, default=None,
                   help="fuse this many PPO iterations into one jitted "
                        "device program (lax.scan over train_step): one "
                        "host dispatch + one metrics read-back per call "
                        "instead of per iteration — the single biggest "
                        "training-throughput lever on a remote/tunneled "
                        "accelerator (21.5M -> 45.5M env-steps/s, "
                        "docs/PERFORMANCE.md). Metrics are still logged "
                        "per iteration. Default: for --preset tpu on an "
                        "accelerator, eval_every // batch_size capped at 16 "
                        "(evals fire at most once per call); else 1. NOTE: "
                        "evals and checkpoints only fire between device "
                        "calls, so K > 1 coarsens the effective checkpoint "
                        "cadence to K*batch_size steps (a few ms of lost "
                        "work at TPU throughput)")
    p.add_argument("--profile", action="store_true",
                   help="write a jax.profiler (TensorBoard/xprof) trace of "
                        "iterations 2-4 to <run>/trace and report per-phase "
                        "timers")
    p.add_argument("--compile-cache", default=None, metavar="DIR|off",
                   help="persistent XLA compilation cache directory "
                        "(default: $ACAS2D_COMPILE_CACHE or "
                        "~/.cache/acas2d_jax_cache; 'off' disables). A warm "
                        "cache turns the 20-40s first-call compile into a "
                        "~1s deserialization — the dominant share of a "
                        "short run's wall clock")
    p.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="force the CPU backend (useful for the tiny 1-env "
                        "reference config, which is latency- not "
                        "throughput-bound)")
    return p.parse_args(argv)


def resolve_iters_per_call(requested, preset: str, backend: str,
                           cfg: PPOConfig) -> int:
    """Default --iters-per-call: fused dispatch for preset-tpu accelerator
    runs, CAPPED at eval_every / steps-per-iteration so it never coarsens
    the eval/checkpoint cadence (evals trigger at most once per call)."""
    if requested is not None:
        return max(1, requested)
    if preset == "tpu" and backend != "cpu":
        return max(1, min(16, cfg.eval_every_steps // cfg.batch_size))
    return 1


def count_prior_evals(run_dir: str, restored_step: int,
                      cfg: PPOConfig) -> int:
    """Evals a previous process performed up to `restored_step`, for the
    --exact-eval resume fast-forward (the Mersenne eval stream must skip
    exactly the episodes already consumed).

    Preference order:
      1. the eval count persisted alongside the checkpoint
         (checkpoints/eval_counts.json, written at every save) — exact
         even when the eval log is gone or carries duplicates;
      2. DISTINCT global_step values in the persisted eval log with
         global_step <= restored_step — the thresholds that *actually
         fired*.  Distinct, not raw rows: a crash-then-resume cycle
         re-fires evals past the restored checkpoint and appends duplicate
         rows at the same global_step, which raw counting would double;
      3. the cadence formula — which undercounts when one device call
         spans several eval thresholds, so it is the last resort only."""
    if restored_step <= 0:
        return 0
    counts_path = os.path.join(run_dir, "checkpoints", "eval_counts.json")
    if os.path.exists(counts_path):
        try:
            with open(counts_path) as f:
                counts = json.load(f)
            if str(restored_step) in counts:
                return int(counts[str(restored_step)])
        except (ValueError, OSError):
            pass
    path = os.path.join(run_dir, "eval.jsonl")
    if os.path.exists(path):
        steps = set()
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if int(row.get("global_step", 0)) <= restored_step:
                    steps.add(int(row.get("global_step", 0)))
        return len(steps)
    # no surviving record: thresholds 0, E, 2E, ... fire once each and the
    # threshold-0 eval fires on the first iteration
    return restored_step // cfg.eval_every_steps + 1


def record_eval_count(run_dir: str, step: int, evals_done: int) -> None:
    """Persist evals-performed at a checkpointed step so --exact-eval
    resume fast-forwards the Mersenne stream exactly even when eval.jsonl
    is gone (deleted run dir, partial copy) — see count_prior_evals."""
    path = os.path.join(run_dir, "checkpoints", "eval_counts.json")
    counts = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                counts = json.load(f)
        except (ValueError, OSError):
            counts = {}
    counts[str(step)] = int(evals_done)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(counts, f)


def build_config(args) -> PPOConfig:
    cfg = tpu_default() if args.preset == "tpu" else PPOConfig()
    overrides = {}
    if args.n_envs is not None:
        overrides["n_envs"] = args.n_envs
    if args.n_steps is not None:
        overrides["n_steps"] = args.n_steps
    if args.total_steps is not None:
        overrides["total_timesteps"] = args.total_steps
    if args.minibatch_size is not None:
        overrides["minibatch_size"] = args.minibatch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.n_epochs is not None:
        overrides["n_epochs"] = args.n_epochs
    if args.ent_coef is not None:
        overrides["ent_coef"] = args.ent_coef
    if args.shuffle_block is not None:
        overrides["shuffle_block_size"] = args.shuffle_block
    if args.anneal_lr:
        overrides["anneal_lr"] = True
    if args.fused_rollout:
        overrides["fused_rollout"] = True
    if args.fused_chunk is not None:
        overrides["fused_chunk"] = args.fused_chunk
    if args.fused_update:
        overrides["fused_update"] = True
    if args.fused_update_bf16:
        overrides["fused_update"] = True
        overrides["fused_update_bf16"] = True
    if args.fused_update_packed:
        overrides["fused_update"] = True
        overrides["fused_update_packed"] = True
    if args.eval_every is not None:
        overrides["eval_every_steps"] = args.eval_every
    if args.eval_episodes is not None:
        overrides["eval_episodes"] = args.eval_episodes
    overrides["seed"] = args.seed
    if overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def enable_compile_cache(arg: str | None) -> str | None:
    """Point XLA's persistent compilation cache at a stable directory so
    repeat runs skip the 20-40s first-call compile (VERDICT r3 #1c: 'keep
    the compilation cache warm').  Returns the directory or None."""
    cache = arg or os.environ.get(
        "ACAS2D_COMPILE_CACHE",
        os.path.expanduser("~/.cache/acas2d_jax_cache"))
    if cache == "off":
        return None
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache every nontrivial compile; the default 1GB-entry floor would
    # skip everything this workload builds
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache


def main(argv=None):
    t_main = time.time()
    args = parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    compile_cache = enable_compile_cache(args.compile_cache)
    mesh_lib.multihost_init()
    cfg = build_config(args)
    env_params = DEFAULT_PARAMS
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    run_name = args.run_name or (
        f"ppo_{'pop%d_' % args.population if args.population else ''}"
        f"{cfg.n_envs}x{cfg.n_steps}_{cfg.total_timesteps}_s{cfg.seed}")

    model = ActorCritic()
    pop = args.population
    if pop:
        from acas2d_tpu.ppo import population
        assert not args.exact_eval, (
            "--exact-eval is a single-policy protocol; evaluate the "
            "selected member afterwards with eval.py --exact")
        state = population.init_population(model, cfg, env_params, pop,
                                           dtype)
        if args.init_params_npz:
            # polish stage: members warm-start from the artifact and
            # diverge through their own env/action RNG streams — selection
            # then keeps the best fine-tuned variant.  A STACKED artifact
            # (top_snapshots.npz, '__stack_n__' marker) distributes its N
            # diverse lineages round-robin over the members; a plain
            # selected_best.npz starts every member from the same policy.
            from acas2d_tpu.utils.params_io import load_params_npz
            raw = load_params_npz(args.init_params_npz)
            stack_n = raw.pop("__stack_n__", None)
            loaded = jax.tree.map(lambda x: jnp.asarray(x, dtype), raw)
            if stack_n is not None:
                n_var = int(np.asarray(stack_n))
                idx = jnp.arange(pop) % n_var
                tiled = jax.jit(lambda p: jax.tree.map(
                    lambda x: jnp.take(x, idx, axis=0), p))(loaded)
                print(f"population warm-started round-robin from "
                      f"{n_var} lineages in {args.init_params_npz}",
                      file=sys.stderr)
            else:
                tiled = jax.jit(lambda p: jax.tree.map(
                    lambda x: jnp.broadcast_to(
                        x[None], (pop,) + x.shape).copy(), p))(loaded)
                print(f"population warm-started from "
                      f"{args.init_params_npz}", file=sys.stderr)
            state = state.replace(params=tiled)
    else:
        state = learner.init_train_state(
            jax.random.PRNGKey(cfg.seed), model, cfg, env_params, dtype)
    if args.init_params_npz and not pop:
        from acas2d_tpu.utils.params_io import load_params_npz
        loaded = jax.tree.map(
            lambda x: jnp.asarray(x, dtype), load_params_npz(args.init_params_npz))
        chex_like = jax.tree.map(lambda a, b: a.shape == b.shape,
                                 state.params, loaded)
        assert all(jax.tree.leaves(chex_like)), "params artifact shape mismatch"
        state = state.replace(params=loaded)
        print(f"warm-started params from {args.init_params_npz}",
              file=sys.stderr)

    # Shard across all chips; replicate the tiny policy.  In population
    # mode the POPULATION axis (the leading axis of every TrainState leaf)
    # shards — members are fully independent, zero collectives; otherwise
    # the env-batch axis shards and XLA all-reduces the gradients.
    mesh = mesh_lib.make_mesh()
    if pop:
        sharded = pop % jax.device_count() == 0 and jax.device_count() > 1
        if sharded:
            state = mesh_lib.shard_env_pytree(state, mesh)
    else:
        sharded = (cfg.n_envs % jax.device_count() == 0
                   and jax.device_count() > 1)
        if sharded:
            state = state.replace(
                env_state=mesh_lib.shard_env_pytree(state.env_state, mesh),
                obs=mesh_lib.shard_env_pytree(state.obs, mesh))
    # The fused Pallas paths (rollout and update kernels) need an explicit
    # shard_map mesh; the XLA paths shard transparently through jit.
    train_mesh = mesh if ((cfg.fused_rollout or cfg.fused_update)
                          and sharded and not pop) else None

    # Global step is derived host-side (iteration * batch) as a Python int:
    # an on-device int32 step counter overflows past 2^31 env-steps.
    # gstep counts PER-MEMBER env-steps in population mode (the sample
    # budget each member trains for — cadences and total_timesteps keep
    # their solo-run meaning; members advance in lockstep).
    steps_per_iter = cfg.batch_size
    gstep_of = lambda st: (
        int(np.asarray(st.iteration).ravel()[0]) * steps_per_iter)

    ckpt = CheckpointManager(f"{args.out_dir}/{run_name}/checkpoints")
    if args.resume:
        try:
            state = ckpt.restore(state)
            print(f"resumed from step {gstep_of(state)}", file=sys.stderr)
        except FileNotFoundError:
            print("no checkpoint found; starting fresh", file=sys.stderr)

    logger = MetricsLogger(f"{args.out_dir}/{run_name}", "train")
    eval_logger = MetricsLogger(f"{args.out_dir}/{run_name}", "eval")
    iters_per_call = resolve_iters_per_call(
        args.iters_per_call, args.preset, jax.default_backend(), cfg)
    if pop:
        # vmapped-over-members step/loop; metrics leaves carry a trailing
        # member axis ((P,) per iteration, (K, P) when loop-fused).  With
        # fused_update on a sharded multi-device run, the vmapped kernel
        # shard_maps over the member axis (one kernel grid per device).
        from acas2d_tpu.ppo import population
        pop_mesh = mesh if ((cfg.fused_update or cfg.fused_rollout)
                            and sharded) else None
        if iters_per_call > 1:
            train_fn = jax.jit(population.make_population_loop(
                model, cfg, env_params, iters_per_call, mesh=pop_mesh),
                donate_argnums=(0,))
        else:
            train_fn = jax.jit(population.make_population_step(
                model, cfg, env_params, mesh=pop_mesh), donate_argnums=(0,))
    elif iters_per_call > 1:
        # K PPO iterations fused into ONE device program (lax.scan over
        # train_step): one host dispatch + one metrics read-back per K
        # iterations.  Metrics come back stacked with a leading (K,) axis
        # and are logged per iteration below.
        train_fn = jax.jit(
            learner.make_train_loop(model, cfg, env_params, iters_per_call,
                                    mesh=train_mesh),
            donate_argnums=(0,))
    else:
        train_fn = jax.jit(learner.make_train_step(model, cfg, env_params,
                                                   mesh=train_mesh),
                           donate_argnums=(0,))
    # Evals performed before this process (0 for a fresh run) — advanced at
    # every enqueue and persisted at every checkpoint (record_eval_count) so
    # an --exact-eval resume fast-forwards the Mersenne stream exactly.
    evals_done = count_prior_evals(
        f"{args.out_dir}/{run_name}", gstep_of(state), cfg)
    if args.exact_eval:
        # stateful host-side (the Mersenne stream advances per call); jits
        # its own device program internally.  On resume, fast-forward the
        # stream past the episodes the previous process consumed.
        eval_fn = learner.make_exact_eval_fn(
            model, cfg, env_params, dtype,
            skip_episodes=evals_done * cfg.eval_episodes)
    elif pop:
        from acas2d_tpu.ppo import population
        eval_fn = jax.jit(population.make_population_eval(
            model, cfg, env_params, dtype))
        pop_tracker = population.PopulationTracker(
            f"{args.out_dir}/{run_name}", pop, cfg.seed)
    else:
        eval_fn = jax.jit(learner.make_eval_fn(model, cfg, env_params, dtype))

    timers = profiling.PhaseTimers()
    # Start cadence counters at the (possibly restored) global step so a
    # resumed run doesn't eval/checkpoint on every iteration while catching
    # up from 0.
    start_step = gstep_of(state)
    next_eval = (start_step // cfg.eval_every_steps) * cfg.eval_every_steps
    next_ckpt = (start_step // args.checkpoint_every) * args.checkpoint_every
    if start_step > 0:
        next_eval += cfg.eval_every_steps
        next_ckpt += args.checkpoint_every
    it = 0
    trace_active = False
    # Fresh eval episodes each eval (fold the global step into the base
    # key) — the reference's EvalCallback draws new episodes from its
    # Monitor env's continuing stream every eval, not a fixed set of 10.
    eval_base_key = jax.random.PRNGKey(cfg.seed + 1)

    # Deferred eval resolution: an eval is ENQUEUED (device program + a
    # non-donated on-device state copy for best-tracking) when its threshold
    # fires, but its results are fetched/logged only after the NEXT train
    # call is in flight, so the host never sits idle waiting on eval device
    # time while the device pipeline drains (VERDICT r3 weak #1c: the
    # 28M-steady vs 5.8M-delivered gap was host-side stalls between calls).
    pending_eval = None                     # (gstep, metrics, state_copy)
    # one device program for the state copy: eager per-leaf jnp.copy would
    # pay a tunnel round-trip per leaf (~12 ms each on this rig)
    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def resolve_pending():
        nonlocal pending_eval
        if pending_eval is None:
            return
        egstep, em, est = pending_eval
        pending_eval = None
        with timers("eval_resolve"):
            em = jax.device_get(em)
        if pop:
            # population: log member aggregates + the full member vector;
            # per-member best params ride the tracker (persisted npz), not
            # the single-state orbax best/
            vals = np.asarray(em["eval_return_mean"])
            row = {k: float(np.asarray(v).mean()) for k, v in em.items()}
            row["eval_return_max"] = float(vals.max())
            row["eval_best_member"] = int(vals.argmax())
            row["eval_return_members"] = json.dumps(
                [round(float(v), 2) for v in vals])
            eval_logger.log(row, step=egstep)
            with timers("best_ckpt"):
                n_up = pop_tracker.update(
                    egstep, vals, jax.device_get(est.params))
            if n_up:
                print(f"population: {n_up} member(s) improved; best="
                      f"{pop_tracker.best_vals.max():.2f} (member "
                      f"{pop_tracker.selected})", file=sys.stderr)
            return
        eval_logger.log(em, step=egstep)
        # Best-model tracking rides the EVAL cadence (EvalCallback
        # semantics), independent of snapshots.
        with timers("best_ckpt"):
            ckpt.update_best(egstep, est, jax.tree.map(float, em))

    t_start = time.time()
    first_call_s = None
    try:
        while gstep_of(state) < cfg.total_timesteps:
            # trace iterations 2-4 (skip the compile-heavy first one)
            if args.profile and it == 1:
                jax.profiler.start_trace(f"{args.out_dir}/{run_name}/trace")
                trace_active = True
            t0 = time.time()
            # disjoint phases: dispatch (host enqueue) / eval_resolve+
            # best_ckpt (resolved while the train program runs) /
            # train_step (blocked on the train program's results)
            with timers("dispatch"):
                state, metrics = train_fn(state)   # enqueue; returns async
            resolve_pending()       # previous eval: device already refilled
            phase = "train_first_call" if it == 0 else "train_step"
            with timers(phase):
                metrics = jax.device_get(metrics)  # sync barrier
            dt = time.time() - t0
            if it == 0:
                first_call_s = dt
            if args.profile and it == 3:
                jax.profiler.stop_trace()
                trace_active = False
            it += 1
            # Unstack the (K,) metrics (K=1 when unfused) and log one row
            # per PPO iteration — identical log schema either way.
            with timers("log"):
                rows = ([metrics] if iters_per_call == 1 else
                        [jax.tree.map(lambda x: x[i], metrics)
                         for i in range(iters_per_call)])
                for ri, row in enumerate(rows):
                    if pop:
                        # member-mean scalars + the member spread that
                        # matters (return); aggregate device throughput
                        it_arr = np.asarray(row.pop("iteration"))
                        gstep = int(it_arr.ravel()[0]) * steps_per_iter
                        rets = np.asarray(row["ep_return_mean"])
                        row = {k: float(np.asarray(v).mean())
                               for k, v in row.items()}
                        row["ep_return_max"] = float(rets.max())
                        row["steps_per_s"] = (pop * iters_per_call
                                              * steps_per_iter / dt)
                    else:
                        gstep = int(row.pop("iteration")) * steps_per_iter
                        row["steps_per_s"] = (iters_per_call
                                              * steps_per_iter / dt)
                    row["global_step"] = gstep
                    # echo once per device call, not once per iteration —
                    # console formatting of K rows costs wall-clock that
                    # shows up in short-run avg throughput
                    logger.log(row, step=gstep,
                               echo=(ri == len(rows) - 1))
            gstep = gstep_of(state)

            if gstep >= next_eval:
                with timers("eval_enqueue"):
                    eval_key = jax.random.fold_in(eval_base_key, gstep)
                    em = eval_fn(state.params, eval_key)
                    # on-device copy (fresh buffers): the live state's
                    # buffers are donated into the next train call, the
                    # copy survives for deferred best-tracking
                    est = copy_state(state)
                pending_eval = (gstep, em, est)
                evals_done += 1
                while next_eval <= gstep:
                    next_eval += cfg.eval_every_steps
            if gstep >= next_ckpt:
                with timers("checkpoint"):
                    ckpt.save(gstep, state)
                    record_eval_count(f"{args.out_dir}/{run_name}", gstep,
                                      evals_done)
                    if pop:
                        pop_tracker.flush()    # throttled archive saves
                while next_ckpt <= gstep:
                    next_ckpt += args.checkpoint_every
    except KeyboardInterrupt:
        print("interrupted; saving checkpoint", file=sys.stderr)
    if trace_active:
        jax.profiler.stop_trace()
    resolve_pending()
    with timers("checkpoint"):
        ckpt.save(gstep_of(state), state)
        record_eval_count(f"{args.out_dir}/{run_name}", gstep_of(state),
                          evals_done)
        ckpt.wait()
    if args.profile:
        mem = profiling.device_memory_stats()
        if mem:
            print(f"device memory: {mem}", file=sys.stderr)
    pop_summary = None
    if pop:
        reval_vals = None
        if args.reval_episodes > 0 and pop_tracker.snap_params is not None:
            # two-stage selection: one LARGE fresh eval of EVERY archived
            # snapshot — pop x k param sets at once (the in-training
            # argmax chases eval noise — see PopulationTracker.finalize)
            import dataclasses as _dc
            from acas2d_tpu.ppo import population
            with timers("final_reval"):
                reval_fn = jax.jit(population.make_population_eval(
                    model, _dc.replace(cfg,
                                       eval_episodes=args.reval_episodes),
                    env_params, dtype))
                flat_params, _ = pop_tracker.snapshots_flat()
                bp = jax.tree.map(lambda x: jnp.asarray(x, dtype),
                                  flat_params)
                rm = jax.device_get(reval_fn(
                    bp, jax.random.PRNGKey(cfg.seed + 99)))
            reval_vals = rm["eval_return_mean"]    # (pop*k,) member-major
        pop_summary = pop_tracker.finalize(
            reval_vals, reval_episodes=args.reval_episodes,
            reval_stds=(rm["eval_return_std"]
                        if reval_vals is not None else None))
        sel_val = pop_summary.get("selected_reval",
                                  pop_summary["selected_training_eval"])
        print(f"population: selected member {pop_summary['selected_member']}"
              f" (seed {pop_summary['selected_seed']}, by "
              f"{pop_summary['selected_by']}) eval {sel_val:.2f} "
              f"(training eval {pop_summary['selected_training_eval']:.2f} "
              f"at step {pop_summary['selected_at_step']})",
              file=sys.stderr)
    # total/phases capture AFTER the population final-reval block: its
    # seconds of device time belong in summary.json's accounting ('a slow
    # run explains itself' — the reval runs under timers('final_reval'))
    total = time.time() - t_start
    phases = timers.report()
    # per-member steps; population aggregate throughput = pop * these
    steps_done = gstep_of(state) - start_step
    first_call_steps = (iters_per_call * steps_per_iter
                        if first_call_s is not None else 0)
    post_steps = steps_done - first_call_steps
    post_wall = total - (first_call_s or 0.0)
    summary = {
        "run_name": run_name,
        "argv": sys.argv[1:] if argv is None else list(argv),
        "backend": jax.default_backend(),
        "n_devices": jax.device_count(),
        "compile_cache": compile_cache,
        "config": {k: getattr(cfg, k) for k in (
            "n_envs", "n_steps", "total_timesteps", "minibatch_size",
            "n_epochs", "learning_rate", "anneal_lr", "seed",
            "fused_rollout", "fused_update", "eval_every_steps")},
        "iters_per_call": iters_per_call,
        "population": pop or None,
        "global_step": gstep_of(state),
        "steps_this_process": steps_done,
        "total_wall_s": round(total, 3),
        # host-side setup before the loop: imports resolved earlier, model/
        # env init, checkpoint restore, jit closure construction
        "init_s": round(t_start - t_main, 3),
        "avg_steps_per_s": round(steps_done / max(total, 1e-9), 1),
        # steady-state = everything after the first (compile-bearing) call,
        # evals/checkpoints included — what a longer run would deliver
        "steady_steps_per_s": round(post_steps / post_wall, 1)
                              if post_wall > 0 and post_steps > 0 else None,
        "first_call_s": round(first_call_s, 3) if first_call_s else None,
        # per-phase wall-clock shares; 'other' = host time outside every
        # instrumented phase (arg parsing happened before t_start)
        "phases": phases,
        "phases_other_s": round(
            total - sum(v for k, v in phases.items() if k.endswith("_s")), 3),
    }
    if pop:
        summary["aggregate_steps_per_s"] = round(
            pop * steps_done / max(total, 1e-9), 1)
        summary["population_selection"] = pop_summary
    with open(f"{args.out_dir}/{run_name}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"phase timers: {phases}", file=sys.stderr)
    print(f"training complete: {gstep_of(state)} steps in "
          f"{total/60:.2f} min ({summary['avg_steps_per_s']:.0f} steps/s "
          f"avg, {summary['steady_steps_per_s'] or 0:.0f} steady)",
          file=sys.stderr)
    logger.close()
    eval_logger.close()

    if pop and args.polish_steps > 0:
        # In-process polish stage: re-enter main() with the polish argv —
        # same backend (no re-acquisition of the tunnel grant), warm
        # in-process + persistent compile caches, stage-specific run dir.
        # warm-start from the top-3 snapshot LINEAGES when available (the
        # single winner's lineage sometimes plateaus under polish)
        init_art = f"{args.out_dir}/{run_name}/top_snapshots.npz"
        if not os.path.exists(init_art):
            init_art = f"{args.out_dir}/{run_name}/selected_best.npz"
        if not os.path.exists(init_art):
            # no eval ever fired (total_steps below the eval cadence):
            # nothing to polish from
            print("polish skipped: no selection artifact (did any eval "
                  "fire before total_timesteps?)", file=sys.stderr)
            return 0
        polish_argv = [
            "--population", str(args.polish_pop or max(pop // 2, 1)),
            "--init-params-npz", init_art,
            "--total-steps", str(args.polish_steps),
            "--lr", str(args.polish_lr),
            "--checkpoint-every", str(args.polish_steps),
            "--seed", str(args.seed + 50),
            "--run-name", f"{run_name}_polish",
            "--out-dir", args.out_dir,
            "--preset", args.preset,
            "--reval-episodes", str(args.reval_episodes),
        ]
        for flag, val in (("--n-envs", args.n_envs),
                          ("--n-steps", args.n_steps),
                          ("--minibatch-size", args.minibatch_size),
                          ("--n-epochs", args.n_epochs),
                          ("--ent-coef", args.ent_coef),
                          ("--shuffle-block", args.shuffle_block),
                          ("--fused-chunk", args.fused_chunk),
                          ("--eval-episodes", args.eval_episodes),
                          ("--eval-every", args.eval_every),
                          ("--compile-cache", args.compile_cache),
                          ("--dtype", args.dtype),
                          ("--iters-per-call", args.iters_per_call)):
            if val is not None:
                polish_argv += [flag, str(val)]
        for flag, on in (("--anneal-lr", args.anneal_lr),
                         ("--fused-rollout", args.fused_rollout),
                         ("--fused-update", args.fused_update),
                         ("--fused-update-packed", args.fused_update_packed),
                         ("--fused-update-bf16", args.fused_update_bf16)):
            if on:
                polish_argv.append(flag)
        if args.polish_rounds > 1:
            polish_argv += [
                "--polish-steps", str(args.polish_steps),
                "--polish-pop", str(args.polish_pop or max(pop // 2, 1)),
                "--polish-lr", str(args.polish_lr),
                "--polish-rounds", str(args.polish_rounds - 1)]
        if args.platform == "cpu":
            polish_argv += ["--platform", "cpu"]
        print(f"polish stage (in-process): {' '.join(polish_argv)}",
              file=sys.stderr)
        rc = main(polish_argv)
        if rc:
            return rc
        try:    # pipeline-level record (the committed-artifact schema)
            from scripts.population_merge import merge
            merge(f"{args.out_dir}/{run_name}",
                  f"{args.out_dir}/{run_name}_polish",
                  [f"stage1_population{pop}"
                   + ("_rollpacked" if cfg.fused_update_packed
                      and cfg.fused_rollout else ""),
                   f"reval{args.reval_episodes}_risk_adjusted",
                   f"polish_population{args.polish_pop or max(pop // 2, 1)}"])
        except ImportError:
            print("scripts.population_merge not importable; stage records "
                  "left unmerged", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
