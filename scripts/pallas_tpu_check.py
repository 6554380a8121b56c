"""On-chip validation of the fused Pallas kernels vs the XLA engine.

The interpret-mode tests (tests/test_pallas.py, tests/test_pallas_update.py)
validate kernel semantics on CPU; this script runs the SAME comparisons on
the real TPU (Mosaic lowering), where interpret mode proves nothing:

  1. deterministic: forced-zero actions from identical initial states for
     64 steps (before any termination) — positions within f32-accumulation
     tolerance of the jnp engine, step counters exact;
  2. statistical: long random-action autoreset rollouts (independent RNG
     streams, identical action distribution) — per-episode goal/collision/
     timeout rates and mean episode length within binomial noise of the XLA
     engine;
  3. fused PPO-update kernel (ops/pallas_update.py): hand-derived
     forward+backward gradients vs jax.grad(learner.ppo_loss) on a
     clip-band-straddling minibatch, compared leaf-by-leaf on the chip;
  4. policy-in-kernel rollout (ops/pallas_policy.py): the in-kernel packed
     two-towers MLP's stored values/log-probs vs flax model.apply on the
     kernel's own stored observations, Mosaic-lowered.

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

    # ---- 3. fused PPO-update gradients vs jax.grad, on chip
    from acas2d_tpu.models.actor_critic import (ActorCritic,
                                                gaussian_log_prob)
    from acas2d_tpu.ops import pallas_update
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    model = ActorCritic()
    n = 1024
    cfg = PPOConfig(n_envs=8, n_steps=128, minibatch_size=n,
                    total_timesteps=n)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 8), jnp.float32))
    rng = np.random.default_rng(1)
    obs = rng.normal(size=(n, 8)).astype(np.float32) * 0.3
    mean, log_std, value = jax.jit(model.apply)(params, jnp.asarray(obs))
    act = np.asarray(mean) + rng.normal(size=(n, 1)).astype(np.float32) * 0.7
    old_logp = np.asarray(jax.jit(gaussian_log_prob)(
        jnp.asarray(act), mean, log_std))
    old_logp = old_logp + rng.normal(size=n).astype(np.float32) * 0.3
    adv = rng.normal(size=n).astype(np.float32)
    ret = rng.normal(size=n).astype(np.float32)
    packed = jnp.asarray(np.concatenate(
        [obs, act, old_logp[:, None], np.asarray(value)[:, None],
         adv[:, None], ret[:, None]], axis=1))
    fields = (jnp.asarray(obs), jnp.asarray(act), jnp.asarray(old_logp),
              jnp.asarray(value), jnp.asarray(adv), jnp.asarray(ret))

    gfn = lambda p, f: jax.value_and_grad(learner.ppo_loss, has_aux=True)(
        p, model, f, cfg)
    (loss, aux), ref_def = jax.jit(gfn)(params, fields)
    # highest-precision (6-pass f32) oracle: the kernel's MXU dots and
    # XLA's default-precision (bf16-pass) grads BOTH round ~4e-3 from it
    # in different directions; comparing kernel vs default alone doubles
    # the apparent error (measured on v5e, 2026-08: worst leaf def-vs-hi
    # 5.3e-3, kernel-vs-hi 5.8e-3)
    with jax.default_matmul_precision("highest"):
        (_, _), ref_hi = jax.jit(gfn)(params, fields)
    grads, kaux = jax.jit(lambda p, d: pallas_update.ppo_minibatch_grads(
        p, d, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=False))(params, packed)

    upd = {"clip_fraction": float(aux["clip_fraction"])}
    if not 0.1 < upd["clip_fraction"] < 0.9:
        failures.append("update fixture does not straddle the clip band")
    worst_k = worst_d = 0.0
    for (pa, hi), (_, de), (_, ke) in zip(
            jax.tree_util.tree_leaves_with_path(ref_hi),
            jax.tree_util.tree_leaves_with_path(ref_def),
            jax.tree_util.tree_leaves_with_path(grads)):
        hi, de, ke = np.asarray(hi), np.asarray(de), np.asarray(ke)
        scale = np.abs(hi).max() + 1e-12
        rel_d = float(np.abs(hi - de).max() / scale)   # XLA's own rounding
        rel_k = float(np.abs(hi - ke).max() / scale)   # kernel rounding
        worst_d = max(worst_d, rel_d)
        worst_k = max(worst_k, rel_k)
        # hard per-leaf cap: anything past 1e-2 is a real divergence, not
        # MXU-pass rounding
        if rel_k > 1e-2:
            failures.append(
                f"update grad {jax.tree_util.keystr(pa)}: kernel rel err "
                f"{rel_k:.2e} vs XLA-default rounding {rel_d:.2e}")
    # aggregate criterion: per-leaf ratios are noisy (summation-order
    # rounding is direction-random; a leaf where XLA lands lucky shows a
    # big ratio) but the kernel's rounding ENVELOPE must match XLA's —
    # measured v5e: kernel 5.8e-3 vs XLA-default 5.3e-3 (the interpreter
    # tests pin the math itself to 1e-5 against CPU jax.grad)
    if worst_k > max(3e-3, 2.0 * worst_d):
        failures.append(
            f"update grads: kernel rounding envelope {worst_k:.2e} exceeds "
            f"2x the XLA default-precision envelope {worst_d:.2e}")
    upd["worst_grad_rel_err_kernel_vs_highest"] = worst_k
    upd["worst_grad_rel_err_xladefault_vs_highest"] = worst_d

    # bf16 variant (MXU operands explicitly cast to bf16): on v5e this is
    # a numeric NO-OP, because Mosaic's default-precision f32 dot already
    # quantizes operands to bf16 (single MXU pass) — verified by the
    # operand-quantization probe below (a 1 + 2^-12 operand, which bf16
    # cannot represent, rounds identically under default and explicit
    # bf16, and only precision=HIGHEST preserves it).  The check pins
    # BOTH facts: bf16 grads stay inside the f32 kernel's own rounding
    # envelope, and the probe explains why they are bit-identical here.
    grads_bf, _ = jax.jit(lambda p, d: pallas_update.ppo_minibatch_grads(
        p, d, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=False, bf16=True))(params, packed)
    worst_bf = worst_bf_vs_f32 = 0.0
    for (pa, hi), (_, ke), (_, k32) in zip(
            jax.tree_util.tree_leaves_with_path(ref_hi),
            jax.tree_util.tree_leaves_with_path(grads_bf),
            jax.tree_util.tree_leaves_with_path(grads)):
        hi, ke, k32 = np.asarray(hi), np.asarray(ke), np.asarray(k32)
        scale = np.abs(hi).max() + 1e-12
        rel = float(np.abs(hi - ke).max() / scale)
        worst_bf = max(worst_bf, rel)
        worst_bf_vs_f32 = max(worst_bf_vs_f32,
                              float(np.abs(ke - k32).max() / scale))
        if rel > 3e-2:     # hard cap: 3x the documented ~1e-2 envelope
            failures.append(
                f"bf16 update grad {jax.tree_util.keystr(pa)}: rel err "
                f"{rel:.2e} exceeds the documented envelope")
    upd["worst_grad_rel_err_bf16_kernel_vs_highest"] = worst_bf
    upd["worst_grad_rel_dev_bf16_vs_f32_kernel"] = worst_bf_vs_f32

    # operand-quantization probe: does this target's default dot already
    # round f32 operands to bf16?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _probe_kernel(a_ref, b_ref, o_def, o_bf, o_hi):
        a, b = a_ref[:], b_ref[:]
        o_def[:] = jnp.dot(a, b, preferred_element_type=jnp.float32)
        o_bf[:] = jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        o_hi[:] = jnp.dot(a, b, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    pn = 128
    pa_ = jnp.full((pn, pn), 1.0 + 2.0 ** -12, jnp.float32)
    pb_ = jnp.eye(pn, dtype=jnp.float32)
    pshape = jax.ShapeDtypeStruct((pn, pn), jnp.float32)
    o_def, o_bf, o_hi = pl.pallas_call(
        _probe_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[pshape] * 3)(pa_, pb_)
    quantizes = bool((np.asarray(o_def) == np.asarray(o_bf)).all()
                     and not (np.asarray(o_def) == np.asarray(o_hi)).all())
    upd["mosaic_default_dot_quantizes_operands_to_bf16"] = quantizes
    if quantizes != (worst_bf_vs_f32 == 0.0):
        failures.append(
            f"bf16-vs-f32 kernel deviation {worst_bf_vs_f32:.2e} "
            f"inconsistent with the operand-quantization probe "
            f"(quantizes={quantizes}): expected "
            f"{'bit-identical' if quantizes else 'differing'} grads")
    upd["loss"] = [float(kaux["loss"]), float(loss)]
    if abs(upd["loss"][0] - upd["loss"][1]) > 1e-4 * (1 + abs(upd["loss"][1])):
        failures.append(f"update loss mismatch {upd['loss']}")
    for key in ("policy_loss", "value_loss", "entropy", "approx_kl",
                "clip_fraction"):
        a, b = float(kaux[key]), float(aux[key])
        upd[f"{key}"] = [a, b]
        if abs(a - b) > 1e-3 * (1 + abs(b)):
            failures.append(f"update aux {key}: kernel {a} vs xla {b}")

    # ---- 4. policy-in-kernel rollout: in-kernel MLP vs flax, on chip
    from acas2d_tpu.envs import vector
    from acas2d_tpu.models.actor_critic import gaussian_log_prob
    from acas2d_tpu.ops import pallas_policy

    Bp = 2 * pallas_policy.E
    Kp = 8
    sp_state, sp_obs = jax.jit(
        lambda k: vector.reset_batch(k, Bp, P, jnp.float32))(
        jax.random.PRNGKey(23))
    stp2, bufp = jax.jit(lambda s, o: pallas_policy.fused_policy_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward, o, params,
        seed=3, step_offset=0, K=Kp))(sp_state,
                                      sp_obs.astype(jnp.float32))
    mean_f, log_std_f, value_f = jax.jit(
        lambda o: model.apply(params, o))(bufp["obs"].reshape(Kp * Bp, 8))
    logp_f = jax.jit(gaussian_log_prob)(
        bufp["actions"].reshape(-1, 1), mean_f, log_std_f)
    pol = {}
    v_err = float(np.abs(np.asarray(bufp["values"]).reshape(-1)
                         - np.asarray(value_f)).max())
    lp_err = float(np.abs(np.asarray(bufp["log_probs"]).reshape(-1)
                          - np.asarray(logp_f)).max())
    pol["max_abs_err_value"] = v_err
    pol["max_abs_err_log_prob"] = lp_err
    # on-chip MXU f32 rounding budget (interpreter agrees to ~2e-4;
    # round-2 measured ~3e-3 abs on chip)
    if v_err > 2e-2 or lp_err > 2e-2:
        failures.append(f"policy kernel vs flax: value err {v_err:.2e}, "
                        f"logp err {lp_err:.2e}")
    # carried pa_lat reproduces the carried obs through core.observe
    from acas2d_tpu.envs import core as core_mod
    es = sp_state.replace(
        px=stp2["px"], py=stp2["py"], ppsi=stp2["psi"],
        pa_lat=stp2["pa_lat"], tx=stp2["tx"][:, None],
        ty=stp2["ty"][:, None], tv=stp2["tv"][:, None],
        tpsi=stp2["tpsi"][:, None], steps=stp2["steps"] - 1,
        total_reward=stp2["total_reward"])
    _, obs_re = jax.jit(jax.vmap(lambda s: core_mod.observe(s, P)))(es)
    obs_err = float(np.abs(np.asarray(obs_re, np.float32)
                           - np.asarray(stp2["obs"])).max())
    pol["max_abs_err_obs_recompute"] = obs_err
    if obs_err > 2e-2:
        failures.append(f"policy kernel obs recompute err {obs_err:.2e}")

    # ---- 5. packed-parameter grads on chip: bit-identical to the flax
    #         entry point (same kernel math on identical operands) and
    #         masked off-diagonals exactly zero
    gp, _ = jax.jit(
        lambda p, d: pallas_update.ppo_minibatch_grads_packed(
            p, d, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
            ent_coef=cfg.ent_coef, interpret=False))(
        pallas_update.pack_params_tree(params), packed)
    back = pallas_update.unpack_params_tree(gp, params)
    pk = {"offdiag_zero": bool(
        (np.asarray(gp["w2c"])[:64, 64:] == 0).all()
        and (np.asarray(gp["w2c"])[64:, :64] == 0).all()
        and (np.asarray(gp["w3c"])[2:] == 0).all())}
    worst_pk = 0.0
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(grads),
                               jax.tree_util.tree_leaves_with_path(back)):
        dev = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        worst_pk = max(worst_pk, dev)
        if dev != 0.0:
            failures.append(f"packed grads {jax.tree_util.keystr(pa)}: "
                            f"deviate {dev:.2e} from the flax entry point")
    pk["max_abs_dev_vs_flax_entry"] = worst_pk
    if not pk["offdiag_zero"]:
        failures.append("packed grads: off-diagonal artifacts not masked")

    # ---- 6. member-grid rollout on chip: M=1 bit-identical to the solo
    #         kernel; a 2-member run's stored values match flax under each
    #         member's OWN weights
    params_b = jax.jit(model.init)(jax.random.PRNGKey(9),
                                   jnp.zeros((1, 8), jnp.float32))
    flat1 = dict(px=sp_state.px, py=sp_state.py, psi=sp_state.ppsi,
                 tx=sp_state.tx[:, 0], ty=sp_state.ty[:, 0],
                 tv=sp_state.tv[:, 0], tpsi=sp_state.tpsi[:, 0],
                 steps=sp_state.steps, total_reward=sp_state.total_reward)
    stm, bufm = jax.jit(lambda f, o, p: (
        pallas_policy.fused_policy_rollout_members(
            jax.tree.map(lambda x: x[None], f), o[None],
            jax.tree.map(lambda x: x[None], p),
            seed=3, step_offset=0, K=Kp)))(
        flat1, sp_obs.astype(jnp.float32), params)
    mem = {}
    worst_m1 = 0.0
    for k in stp2:
        dev = float(np.abs(np.asarray(stp2[k])
                           - np.asarray(stm[k][0])).max())
        worst_m1 = max(worst_m1, dev)
    for k in bufp:
        dev = float(np.abs(np.asarray(bufp[k])
                           - np.asarray(bufm[k][0])).max())
        worst_m1 = max(worst_m1, dev)
    mem["max_abs_dev_m1_vs_solo"] = worst_m1
    if worst_m1 != 0.0:
        failures.append(f"member-grid rollout at M=1 deviates {worst_m1:.2e} "
                        "from the solo kernel")
    E1 = pallas_policy.E
    flat2 = {k: jnp.stack([v[:E1], v[:E1]]) for k, v in flat1.items()}
    stacked2 = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                            params, params_b)
    _, buf2 = jax.jit(lambda f, o, p: (
        pallas_policy.fused_policy_rollout_members(
            f, o, p, seed=5, step_offset=0, K=4)))(
        flat2, jnp.stack([sp_obs[:E1], sp_obs[:E1]]).astype(jnp.float32),
        stacked2)
    worst_mv = 0.0
    for m, pm in enumerate((params, params_b)):
        o = jnp.asarray(buf2["obs"][m].reshape(-1, 8))
        _, _, vf = jax.jit(lambda o, p=pm: model.apply(p, o))(o)
        worst_mv = max(worst_mv, float(np.abs(
            np.asarray(buf2["values"][m]).reshape(-1)
            - np.asarray(vf)).max()))
    mem["max_abs_err_member_values_vs_flax"] = worst_mv
    if worst_mv > 2e-2:
        failures.append(f"member-grid values vs flax err {worst_mv:.2e}")

    import time
    print(json.dumps({"ok": not failures, "failures": failures,
                      "hardware": f"{jax.devices()[0].device_kind} "
                                  f"({jax.device_count()} chip, tunneled)",
                      "date": time.strftime("%Y-%m-%d"),
                      "command": "python scripts/pallas_tpu_check.py",
                      "deterministic": det, "statistical": stat,
                      "update_grads": upd, "policy_kernel": pol,
                      "packed_grads": pk, "member_rollout": mem}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
