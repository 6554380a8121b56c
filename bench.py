"""Headline benchmark: batched ACAS-2D env-steps/s per chip (BASELINE.json).

Runs the jitted vmap+scan autoreset engine (the hot loop of the TPU
framework) on the available accelerator and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env-steps/s/chip", "vs_baseline": N}

Baseline of comparison: the reference environment advances at most 71.4
steps/s end-to-end on its machine of record (244.82 min for 1,048,576 steps,
BASELINE.md) and is capped at 100 steps/s by construction
(`clock.tick(FPS)`, environment.py:31).  We compare against the 100 steps/s
design cap — the most favorable number for the reference.

Methodology: chained donated jit calls (work queues on device) with a
device->host transfer of the result as the synchronization barrier —
`block_until_ready` is not reliable on the experimental tunneled backend,
but a host transfer cannot complete before the compute that produces it.
Best of repeated measurements; throughput checked finite.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import vector

REFERENCE_STEPS_PER_S = 100.0   # settings.py:17 FPS cap


def measure_pallas(B: int = 262144, T: int = 256, iters: int = 8,
                   repeats: int = 3, with_obs: bool = False) -> list:
    """Fused whole-rollout Pallas kernel (ops/pallas_step.py): state stays
    in VMEM for all T steps; ~8x the XLA-scan path on v5e.  `with_obs`
    additionally builds + checksums the full observation every step (the
    obs-inclusive workload a training consumer sees).  Returns the
    env-steps/s of every repeat (spread included in the artifact)."""
    from acas2d_tpu.ops.pallas_step import fused_rollout

    P = DEFAULT_PARAMS
    key = jax.random.PRNGKey(0)
    s, _ = jax.jit(lambda k: vector.reset_batch(k, B, P, jnp.float32))(key)
    args = (s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
            s.tpsi[:, 0], s.steps, s.total_reward)
    run = jax.jit(lambda *a: fused_rollout(*a, seed=7, T=T, params=P,
                                           with_obs=with_obs),
                  donate_argnums=tuple(range(9)))
    keys = ("px", "py", "psi", "tx", "ty", "tv", "tpsi", "steps",
            "total_reward")
    sync_key = "obs_sum" if with_obs else "reward_sum"
    st, stats = run(*args)
    assert np.isfinite(np.asarray(stats["reward_sum"])).all()
    args = tuple(st[k] for k in keys)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            st, stats = run(*args)
            args = tuple(st[k] for k in keys)
        np.asarray(stats[sync_key])   # host transfer = sync barrier
        dt = (time.perf_counter() - t0) / iters
        rates.append(B * T / dt)
    return rates


def measure(B: int = 262144, T: int = 256, iters: int = 8,
            repeats: int = 3, with_obs: bool = False,
            params=None) -> list:
    P = params if params is not None else DEFAULT_PARAMS
    key = jax.random.PRNGKey(0)
    # Everything jitted: on a tunneled TPU backend, eager op-by-op dispatch
    # pays a remote-compile round trip per primitive.
    states, _ = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float32))(key)

    def run(s, k):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B,), jnp.float32, -1, 1)
            s, out = vector.step_autoreset_batch(s, a, P)
            # with_obs: consume the observation so XLA cannot DCE its build
            # (mirrors the pallas kernel's obs checksum)
            acc = out.reward.sum() + (out.obs.sum() if with_obs else 0.0)
            return (s, k), acc
        (s, k), r = jax.lax.scan(body, (s, k), None, length=T)
        return s, k, r.sum()

    runj = jax.jit(run, donate_argnums=(0,))
    s, k, r = runj(states, key)
    assert np.isfinite(np.asarray(r)), "non-finite rewards in bench rollout"

    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, k, r = runj(s, k)
        np.asarray(r)                  # host transfer = sync barrier
        dt = (time.perf_counter() - t0) / iters
        rates.append(B * T / dt)
    return rates


def _accelerator_healthy(deadline_s: float = 270.0, attempts: int = 2) -> bool:
    """Probe the default accelerator in a SUBPROCESS with a hard deadline.

    In-process probing cannot work: a wedged tunnel grant hangs the op
    forever and jax gives no way to abandon an in-flight computation, nor
    to re-select the platform once the backend is initialized.  A fresh
    process can take minutes to acquire the tunnel grant even when the
    device is healthy, so the deadline is generous and probed twice."""
    import subprocess
    for _ in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "assert jax.devices()[0].platform != 'cpu';"
                 "assert float(jnp.ones((8,8)).sum()) == 64.0"],
                timeout=deadline_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


# ------------------------------------------------------- benchmark guard

def load_reference_rates() -> dict:
    """Committed best-known per-shape rates (artifacts/bench_reference.json)
    — the guard that makes a degraded tunnel session distinguishable from a
    real regression (VERDICT r4 #1: the round-4 headline silently dropped
    14-18% with zero kernel changes)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "bench_reference.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def session_metadata(first_call_s: float | None = None) -> dict:
    """Record what THIS session delivers so a low number carries its own
    root-cause evidence: the host->device dispatch round-trip (the tunnel's
    dominant noise source, ~12 ms nominal, grows when the grant degrades)
    and the compile-bearing first-call time."""
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(f(x))                       # warm (compile)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        np.asarray(f(x))                   # host transfer = full round trip
    dispatch_ms = (time.perf_counter() - t0) / reps * 1e3
    meta = {
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "platform": jax.devices()[0].platform,
        "dispatch_roundtrip_ms": round(dispatch_ms, 2),
    }
    if first_call_s is not None:
        meta["first_call_s"] = round(first_call_s, 2)
    return meta


def remeasure_in_fresh_process(timeout_s: float = 900.0) -> dict | None:
    """Re-run the headline in a FRESH process (new tunnel session/grant) and
    return its parsed JSON line, or None on failure.  A wedged or degraded
    grant is session-scoped on this rig; re-acquiring it is the only
    recovery a benchmark can perform."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--guard", "off"],
            timeout=timeout_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def apply_guard(out: dict, ref: dict, remeasure=remeasure_in_fresh_process,
                threshold: float = 0.9) -> dict:
    """Compare the measured headline against the committed reference rates;
    if >10% low on either metric, re-measure once in a fresh process and
    keep the better result per metric.  Annotates the output with the
    reference values, the ratios, and whether the deficit persisted across
    two independent sessions (-> likely real) or not (-> session noise)."""
    ref_v = ref.get("headline", {}).get("value")
    ref_o = ref.get("headline_with_obs", {}).get("value")
    if not ref_v:
        return out
    low = (out["value"] < threshold * ref_v
           or (ref_o and out.get("value_with_obs", ref_o) < threshold * ref_o))
    if low:
        second = remeasure()
        out["remeasured"] = second is not None
        if second is not None:
            out["first_attempt"] = {
                k: out[k] for k in ("value", "value_with_obs", "repeats",
                                    "repeats_with_obs", "session")
                if k in out}
            for k in ("value", "value_with_obs"):
                if k in second and second[k] > out.get(k, 0.0):
                    out[k] = second[k]
                    rk = "repeats" if k == "value" else "repeats_with_obs"
                    if rk in second:
                        out[rk] = second[rk]
                    if k == "value" and "session" in second:
                        # the headline now comes from the second session:
                        # its metadata must describe that session
                        out["session"] = second["session"]
            # derived ratio must match the (possibly replaced) value
            out["vs_baseline"] = round(out["value"] / REFERENCE_STEPS_PER_S,
                                       1)
    out["reference"] = {"value": ref_v, "value_with_obs": ref_o,
                        "recorded": ref.get("headline", {}).get("recorded")}
    out["vs_reference"] = round(out["value"] / ref_v, 3)
    if ref_o and "value_with_obs" in out:
        out["vs_reference_obs"] = round(out["value_with_obs"] / ref_o, 3)
    out["below_reference"] = bool(
        out["value"] < threshold * ref_v
        or (ref_o and out.get("value_with_obs", ref_o) < threshold * ref_o))
    return out


# --------------------------------------------------------------- scaling

def _sync(x):
    np.asarray(x)   # host transfer = sync barrier (see module docstring)


def measure_rollout_at(devices, n_envs: int, T: int, iters: int = 4,
                       repeats: int = 2) -> float:
    """Random-action autoreset rollout steps/s with the env batch sharded
    over `devices` via the ('env',) mesh (weak scaling: caller grows n_envs
    with the device count)."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    P = DEFAULT_PARAMS
    mesh = mesh_lib.make_mesh(devices)
    key = jax.random.PRNGKey(0)
    states, _ = jax.jit(
        lambda k: vector.reset_batch(k, n_envs, P, jnp.float32))(key)
    states = mesh_lib.shard_env_pytree(states, mesh)

    def run(s, k):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (n_envs,), jnp.float32, -1, 1)
            s, out = vector.step_autoreset_batch(s, a, P)
            return (s, k), out.reward.sum()
        (s, k), r = jax.lax.scan(body, (s, k), None, length=T)
        return s, k, r.sum()

    runj = jax.jit(run, donate_argnums=(0,))
    s, k, r = runj(states, key)
    assert np.isfinite(np.asarray(r))
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, k, r = runj(s, k)
        _sync(r)
        dt = (time.perf_counter() - t0) / iters
        best = max(best, n_envs * T / dt)
    return best


def measure_train_at(devices, n_envs: int, n_steps: int, iters: int = 2,
                     repeats: int = 2, fused: bool = False,
                     fused_update: bool = False, loop_k: int = 1,
                     bf16_update: bool = False,
                     minibatch: int = 0) -> float:
    """Full PPO train_step (rollout + GAE + 10 epochs of minibatch Adam)
    env-steps/s with env state sharded over `devices`; params replicated,
    gradients all-reduced by XLA (psum over the mesh).  `fused` collects
    the rollout with the policy-in-kernel Pallas path; `fused_update`
    computes minibatch gradients with the fused fwd+bwd kernel; `loop_k`>1
    fuses that many iterations into one device program
    (learner.make_train_loop — train.py --iters-per-call), amortizing the
    per-dispatch host round trip that dominates on a tunneled backend."""
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.parallel import mesh as mesh_lib
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    P = DEFAULT_PARAMS
    batch = n_envs * n_steps
    if not minibatch:
        # auto: the shipped tpu preset's 65536 when it divides the batch
        # (so the bench measures the config training actually runs), else
        # the batch//8 heuristic for off-preset shapes
        minibatch = (65536 if batch % 65536 == 0 and batch >= 65536
                     else max(64, batch // 8))
    if fused_update and minibatch % 128:
        # the fused kernel streams lane-aligned (13, 128k) chunks; round the
        # bench minibatch up to the next 128-multiple that divides the batch
        minibatch = 128
        while minibatch < batch and batch % minibatch:
            minibatch *= 2
        if batch % minibatch:
            raise ValueError(
                f"no 128-aligned minibatch divides batch {batch}; pick "
                f"--train-envs * --train-steps divisible by 128")
    cfg = PPOConfig(n_envs=n_envs, n_steps=n_steps,
                    minibatch_size=minibatch,
                    total_timesteps=batch, fused_rollout=fused,
                    fused_chunk=min(16, n_steps),
                    fused_update=fused_update,
                    fused_update_bf16=bf16_update)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    mesh = mesh_lib.make_mesh(devices)
    st = st.replace(env_state=mesh_lib.shard_env_pytree(st.env_state, mesh),
                    obs=mesh_lib.shard_env_pytree(st.obs, mesh))
    # fused rollout only needs the mesh to split the kernel grid across
    # devices; the fused update's guard fires whenever the *backend* is
    # multi-device (a 1-device mesh is fine and satisfies it)
    need_mesh = ((fused and len(devices) > 1)
                 or (fused_update and jax.device_count() > 1))
    use_mesh = mesh if need_mesh else None
    if loop_k > 1:
        step = jax.jit(learner.make_train_loop(model, cfg, P, loop_k,
                                               mesh=use_mesh),
                       donate_argnums=(0,))
    else:
        step = jax.jit(learner.make_train_step(model, cfg, P, mesh=use_mesh),
                       donate_argnums=(0,))
    st, m = step(st)
    assert np.isfinite(np.asarray(m["loss"])).all()
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = step(st)
        _sync(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        best = max(best, batch * loop_k / dt)
    return best


def scaling_main(args) -> int:
    """bench.py --scaling: weak-scaling efficiency over the ('env',) mesh.

    Runs the sharded autoreset rollout and the full PPO train_step at
    n_devices in {1, 2, 4, ..., all}, envs-per-device held constant, and
    prints one JSON line per point plus a summary line.  Efficiency is
    per-chip throughput at n vs at 1 (BASELINE.md: >=80% at n>=2).  On a
    single-chip/CPU rig this exercises the harness via the virtual device
    mesh; on a pod slice it produces the real number unchanged.
    """
    all_devices = jax.devices()
    counts = []
    n = 1
    while n <= len(all_devices):
        counts.append(n)
        n *= 2
    if counts[-1] != len(all_devices):
        counts.append(len(all_devices))
    rows = []
    base = {}
    for n in counts:
        devs = all_devices[:n]
        point = {"n_devices": n, "platform": all_devices[0].platform}
        if args.mode in ("rollout", "both"):
            sps = measure_rollout_at(devs, args.envs_per_device * n,
                                     args.bench_steps)
            point["rollout_steps_per_s"] = round(sps, 1)
            base.setdefault("rollout", sps if n == 1 else None)
            if base.get("rollout"):
                point["rollout_efficiency"] = round(
                    sps / (n * base["rollout"]), 3)
        if args.mode in ("train", "both"):
            sps = measure_train_at(devs, args.envs_per_device * n,
                                   args.train_steps)
            point["train_steps_per_s"] = round(sps, 1)
            base.setdefault("train", sps if n == 1 else None)
            if base.get("train"):
                point["train_efficiency"] = round(
                    sps / (n * base["train"]), 3)
        rows.append(point)
        print(json.dumps(point), flush=True)
    worst = min((r.get("rollout_efficiency", 1.0) for r in rows[1:]),
                default=1.0)
    worst_t = min((r.get("train_efficiency", 1.0) for r in rows[1:]),
                  default=1.0)
    print(json.dumps({
        "metric": "weak-scaling efficiency (env mesh)",
        "value": round(min(worst, worst_t), 3),
        "unit": "per-chip efficiency vs 1 device",
        "n_devices_max": counts[-1],
        "target": 0.8,
    }))
    return 0


def multi_traffic_main(args) -> int:
    """bench.py --multi-traffic N: env-steps/s of the general XLA engine at
    max_traffic == N (the reference's dead branch game.py:107-114, exercised
    here for generality).  The pallas kernels specialize max_traffic == 1
    and assert it away (ops/pallas_step.py), so this is the XLA path by
    construction; the measured cost of N>1 motivates (or dismisses)
    extending a kernel — see docs/PERFORMANCE.md 'Multi-traffic'."""
    import dataclasses
    n = args.multi_traffic
    P = dataclasses.replace(DEFAULT_PARAMS, min_traffic=n, max_traffic=n)
    rows = {}
    for label, p in (("traffic1", DEFAULT_PARAMS), (f"traffic{n}", P)):
        rates = measure(B=args.mt_envs, T=128, iters=4, repeats=2,
                        with_obs=True, params=p)
        rows[label] = round(max(rates), 1)
    ratio = rows[f"traffic{n}"] / max(rows["traffic1"], 1e-9)
    print(json.dumps({
        "metric": f"env-steps/s, XLA engine, max_traffic {n} vs 1 "
                  "(obs-inclusive)",
        "value": rows[f"traffic{n}"],
        "unit": "env-steps/s",
        "vs_baseline": round(rows[f"traffic{n}"] / REFERENCE_STEPS_PER_S, 1),
        "paths": rows,
        "relative_cost": round(1.0 / max(ratio, 1e-9), 2),
    }))
    return 0


def train_main(args) -> int:
    """bench.py --train: end-to-end PPO training env-steps/s at the SHIPPED
    tpu preset shape (2048 envs x 128 steps, minibatch 65536 — the config
    that produces the committed policy artifacts; rollout + GAE + 10 update
    epochs per iteration), XLA rollout vs the fused policy-in-kernel Pallas
    rollout.  The headline `value` is the best preset-shaped variant; the
    4096-env best-case shape (faster, but measurably worse policy quality —
    ppo/config.py:133-137) is reported separately as `best_case_4096`."""
    devs = jax.devices()
    variants = [("xla", False, False, 1, False)]
    on_cpu = jax.default_backend() == "cpu"
    if args.fused != "off" and on_cpu:
        # the pallas interpreter would RUN the fused variants on CPU —
        # at bench sizes that is hours, not an error; skip loudly
        print("fused variants skipped on the CPU backend (pallas "
              "interpreter only); use --fused off to silence",
              file=sys.stderr)
    elif args.fused != "off":
        variants += [
            ("fused_rollout", True, False, 1, False),
            # the production config (docs/PERFORMANCE.md "End-to-end
            # training"): fused rollout + XLA update + 32 iterations per
            # device program (train.py --iters-per-call 32)
            ("fused_rollout+loop32", True, False, 32, False),
            ("fused_rollout+update+loop32", True, True, 32, False),
            ("fused_rollout+update_bf16+loop32", True, True, 32, True)]
    rows = {}
    for label, fr, fu, lk, bf in variants:
        try:
            rows[label] = round(measure_train_at(
                devs, args.train_envs, args.train_steps,
                fused=fr, fused_update=fu, loop_k=lk, bf16_update=bf,
                minibatch=args.train_minibatch), 1)
        except Exception as e:          # pallas path absent on this backend
            rows[label] = f"unavailable ({type(e).__name__})"
    best = max((v for v in rows.values() if isinstance(v, float)),
               default=0.0)
    out = {
        "metric": "end-to-end PPO training env-steps/s at the shipped tpu "
                  "preset shape (rollout+GAE+update)",
        "value": best,
        "unit": "env-steps/s",
        "vs_baseline": round(best / 71.4, 1),   # reference time/fps
        "n_envs": args.train_envs,
        "paths": rows,
    }
    if args.train_envs == 2048 and not on_cpu and args.fused != "off":
        # the non-default best-case shape, kept visible but not headlined
        try:
            out["best_case_4096"] = round(measure_train_at(
                devs, 4096, args.train_steps, fused=True, loop_k=32), 1)
        except Exception as e:
            out["best_case_4096"] = f"unavailable ({type(e).__name__})"
    print(json.dumps(out))
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scaling", action="store_true",
                    help="weak-scaling efficiency sweep over the env mesh "
                         "instead of the single-chip headline number")
    ap.add_argument("--train", action="store_true",
                    help="end-to-end PPO training steps/s (XLA vs fused "
                         "policy-in-kernel rollout) instead of the env "
                         "stepping headline")
    ap.add_argument("--train-envs", type=int, default=2048,
                    help="--train: env batch (default = the shipped tpu "
                         "preset's 2048; 4096 is the faster best-case shape "
                         "that measurably hurts policy quality)")
    ap.add_argument("--train-minibatch", type=int, default=0,
                    help="--train: minibatch size (0 = auto: the preset's "
                         "65536 when it divides the batch, else batch//8)")
    ap.add_argument("--multi-traffic", type=int, default=0, metavar="N",
                    help="measure the general XLA engine at max_traffic=N "
                         "vs 1 (obs-inclusive) instead of the headline")
    ap.add_argument("--mt-envs", type=int, default=65536,
                    help="--multi-traffic: env batch size")
    ap.add_argument("--fused", choices=["on", "off"], default="on",
                    help="--train: also measure the fused Pallas rollout")
    ap.add_argument("--mode", choices=["rollout", "train", "both"],
                    default="both", help="--scaling: which path to measure")
    ap.add_argument("--envs-per-device", type=int, default=32768)
    ap.add_argument("--bench-steps", type=int, default=128,
                    help="--scaling: rollout scan length")
    ap.add_argument("--train-steps", type=int, default=128,
                    help="--scaling / --train: PPO n_steps per iteration "
                         "(128 = the tpu preset)")
    ap.add_argument("--guard", choices=["on", "off"], default="on",
                    help="compare the headline against the committed "
                         "best-known rates (artifacts/bench_reference.json) "
                         "and auto-re-measure in a fresh process when >10%% "
                         "low ('off' inside the re-measure subprocess)")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="force the CPU backend (this machine's "
                         "sitecustomize pins jax_platforms to the axon TPU, "
                         "overriding JAX_PLATFORMS; combine with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "for a virtual mesh)")
    args = ap.parse_args()
    cpu_fallback = False
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif not _accelerator_healthy():
        # The tunneled TPU grant occasionally wedges (any device op hangs
        # forever).  A hung benchmark is worse than a CPU number: fall back
        # loudly instead of timing out the harness.
        print("accelerator unresponsive (wedged tunnel grant?); "
              "falling back to the CPU backend", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        cpu_fallback = True
    if args.scaling:
        return scaling_main(args)
    if args.train:
        return train_main(args)
    if args.multi_traffic:
        return multi_traffic_main(args)
    n_dev = jax.device_count()
    if cpu_fallback:
        rates = measure(B=16384, T=64, iters=4, repeats=2)
        sps = max(rates)
        print(json.dumps({
            "metric": "env-steps/s per chip (batched ACAS-2D autoreset, "
                      "XLA vmap+scan, CPU FALLBACK — accelerator wedged)",
            "value": round(sps, 1),
            "unit": "env-steps/s/chip",
            "vs_baseline": round(sps / REFERENCE_STEPS_PER_S, 1),
            "repeats": [round(r, 1) for r in rates],
        }))
        return 0
    t_measure = time.time()
    try:
        rates = measure_pallas()
        rates_obs = measure_pallas(with_obs=True)
        path = "pallas fused rollout"
    except (NotImplementedError, ValueError) as e:
        # Backend/lowering gaps only (pallas has no CPU lowering; Mosaic
        # raises NotImplementedError on unsupported primitives).  A kernel
        # CORRECTNESS failure — e.g. the non-finite-reward assertion — must
        # surface, not silently downgrade the headline to the XLA path.
        print(f"pallas path unavailable ({type(e).__name__}: {e}), "
              "falling back to XLA scan", file=sys.stderr)
        rates = measure()
        rates_obs = measure(with_obs=True)
        path = "XLA vmap+scan"
    per_chip = max(rates) / n_dev
    per_chip_obs = max(rates_obs) / n_dev
    out = {
        "metric": f"env-steps/s per chip (batched ACAS-2D autoreset, {path})",
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_STEPS_PER_S, 1),
        # obs-inclusive variant: every step also builds + consumes the full
        # 8-feature observation (what a training consumer gets; the
        # reference's observe() runs every step, environment.py:35)
        "value_with_obs": round(per_chip_obs, 1),
        # per-repeat spread: the tunneled accelerator shows ±10-15%
        # run-to-run variance (docs/PERFORMANCE.md); a regression must be
        # distinguishable from noise in the artifact itself
        "repeats": [round(r / n_dev, 1) for r in rates],
        "repeats_with_obs": [round(r / n_dev, 1) for r in rates_obs],
        # session evidence: dispatch round-trip + compile-bearing measure
        # wall — a low number must carry its own root cause
        "session": dict(session_metadata(),
                        measure_wall_s=round(time.time() - t_measure, 1)),
    }
    if args.guard == "on" and args.platform != "cpu":
        # the committed reference rates are TPU rates; a forced-CPU run
        # must not be "recovered" by a TPU-backed fresh process
        out = apply_guard(out, load_reference_rates())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
