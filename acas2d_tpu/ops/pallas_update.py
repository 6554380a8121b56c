"""Fused PPO minibatch gradient kernel: forward + backward in VMEM.

After the policy-in-kernel rollout (ops/pallas_policy.py) cut the rollout
to ~1.7 ms/iteration, the 10 epochs x 8 minibatches of Adam steps dominate
end-to-end training (~11 of ~14 ms at the tpu preset, docs/PERFORMANCE.md).
Each XLA grad step is HBM-bound, not MXU-bound: the (64, N) tower
activations (16 MB each at N=65536) round-trip HBM between the forward
matmuls and again in the backward pass — ~10x more traffic than the 3.4 MB
minibatch itself.

This kernel computes the full clipped-PPO loss gradient for one minibatch
in ONE kernel: a sequential grid streams the minibatch from HBM in
(13, C)-column chunks, runs the actor-critic forward (feature-major MXU
matmuls, as in pallas_policy) and the hand-derived backward entirely in
VMEM, and accumulates parameter gradients + loss statistics across chunks
in revisited output blocks.  HBM traffic per grad step drops to one read
of the minibatch.  Optimization semantics are EXACTLY ppo/learner.py:
ppo_loss — same clip/min branch structure (including where gradients are
zeroed by clipping), the log-ratio safety clamp, SB3's per-minibatch
advantage normalization (applied host-side before the kernel, it needs the
full-minibatch mean/std), the straight-through log-std clamp
(models/actor_critic.py:70-71), and unclipped value MSE.  Gradient-norm
clipping and Adam stay in XLA (they touch only the ~5k parameters).

Like the other pallas paths this is TPU-only (interpret=True on CPU) and
single-device per call.  Multi-device training runs it through
learner.make_fused_grads_fn, which shard_maps the minibatch rows over the
('env',) mesh and pmeans gradients/statistics; calling it directly with
inputs sharded under jit auto-sharding is NOT supported (pallas_call does
not partition) and learner guards against it.

Bit-compatibility caveat: `in_band` uses strict inequalities while the XLA
loss's jnp.clip/jnp.minimum have their own tie-breaking, so gradients can
deviate from jax.grad on the measure-zero boundary points ratio ==
1 +- clip_range and |delta| == 20 exactly; everywhere else they match to
f32 rounding (tests/test_pallas_update.py, scripts/pallas_tpu_check.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acas2d_tpu.ops.pallas_policy import pack_params_two_towers

LOG_2PI = math.log(2.0 * math.pi)

# data-matrix row layout (matches learner.ppo_update's packed (N, 13)
# matrix with the advantage column already normalized per minibatch)
_OBS, _ACT, _LOGP, _VAL, _ADV, _RET = 0, 8, 9, 10, 11, 12
N_COLS = 13


def _ppo_grad_kernel(log_std_ref,
                     w1c_ref, b1c_ref, w2c_ref, b2c_ref, w3c_ref, b3c_ref,
                     data_ref,
                     # outputs: grads in the packed (feature-major) layout
                     dw1c, db1c, dw2c, db2c, dw3c, db3c, dls,
                     # loss-statistic sums over rows
                     pl_sum, vl_sum, kl_sum, cf_sum,
                     *, n_rows: int, clip_range: float, vf_coef: float,
                     bf16: bool):
    """Both 64-wide towers are PACKED into one 128-wide network
    (_pack_update_params): layer 1 stacks [w1; v1] -> (128, 8), layer 2 is
    block-diagonal [[w2, 0], [0, v2]] -> (128, 128), the heads stack
    [wa, 0; 0, wv] into rows 0/1 of an (8, 128) matrix.  The MXU processes
    a 128x128 tile per pass regardless of operand size, so one packed
    matmul costs HALF of two 64-wide ones; the off-diagonal blocks of
    dW2c/dW3c computed by the backward are artifacts of the packing and are
    discarded at unpack (the forward's block structure is exact because the
    zero blocks annihilate cross-tower terms).

    `bf16`: feed the MXU bf16 operands (f32 accumulate, f32 everywhere
    else).  The f32 kernel is MXU-pass-bound (measured ~147us/step at
    minibatch 65536 on v5e); bf16 runs the passes at 4x the f32 rate.
    Gradient rounding grows to ~1e-2 relative — far below PPO's gradient
    noise but outside the bit-compat contract, so it is opt-in
    (PPOConfig.fused_update_bf16)."""
    grads = (dw1c, db1c, dw2c, db2c, dw3c, db3c, dls,
             pl_sum, vl_sum, kl_sum, cf_sum)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for g in grads:
            g[...] = jnp.zeros(g.shape, g.dtype)

    inv_n = jnp.float32(1.0 / n_rows)
    eps = jnp.float32(clip_range)
    cls = jnp.minimum(jnp.maximum(log_std_ref[0, 0], -4.0), 2.0)
    var = jnp.exp(2.0 * cls)

    d = data_ref[:]                     # (13, C)
    x = d[_OBS:_ACT, :]                 # (8, C)
    act = d[_ACT:_LOGP, :]              # (1, C)
    old_logp = d[_LOGP:_VAL, :]
    adv = d[_ADV:_RET, :]               # pre-normalized per minibatch
    ret = d[_RET:N_COLS, :]

    w1c = w1c_ref[:]                    # (128, 8)
    w2c = w2c_ref[:]                    # (128, 128) block-diagonal
    w3c = w3c_ref[:]                    # (8, 128); row 0 = wa, row 1 = wv

    md = jnp.bfloat16 if bf16 else jnp.float32

    def dot(a, b):
        return jnp.dot(a.astype(md), b.astype(md),
                       preferred_element_type=jnp.float32)

    def dot_cc(a, b):
        """Contract the last (lane/C) dim of both: (m, C) x (n, C) -> (m, n)
        without materializing a transpose relayout."""
        return jax.lax.dot_general(a.astype(md), b.astype(md),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot_ff(a, b):
        """Contract the first (feature) dim of both: (k, m) x (k, C)
        -> (m, C) — a.T @ b without the transpose relayout."""
        return jax.lax.dot_general(a.astype(md), b.astype(md),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # ---- forward (feature-major; matches models/actor_critic.py)
    # H1 rows 0-63 = pi tower h1, rows 64-127 = vf tower g1; the
    # block-diagonal layer 2 keeps the towers independent
    H1 = jnp.tanh(dot(w1c, x) + b1c_ref[:])     # (128, C)
    H2 = jnp.tanh(dot(w2c, H1) + b2c_ref[:])    # (128, C)
    O = dot(w3c, H2) + b3c_ref[:]               # (8, C); rows 0/1 live
    mean = O[0:1, :]
    value = O[1:2, :]

    diff = act - mean
    logp = -0.5 * (diff * diff / var + 2.0 * cls + jnp.float32(LOG_2PI))
    delta = logp - old_logp
    # the learner's exp-overflow clamp (learner.ppo_loss): grad is zeroed
    # outside the clamp, exactly like jnp.clip
    delta_in = jnp.abs(delta) < 20.0
    delta_c = jnp.minimum(jnp.maximum(delta, -20.0), 20.0)
    ratio = jnp.exp(delta_c)

    in_band = (ratio > 1.0 - eps) & (ratio < 1.0 + eps)
    unclipped = adv * ratio
    clipped = adv * jnp.minimum(jnp.maximum(ratio, 1.0 - eps), 1.0 + eps)
    pl_i = -jnp.minimum(unclipped, clipped)

    verr = value - ret

    # ---- loss statistics
    # (1,1)-shaped sums: Mosaic cannot store scalars to VMEM
    pl_sum[...] += jnp.sum(pl_i, keepdims=True)
    vl_sum[...] += jnp.sum(verr * verr, keepdims=True)
    kl_sum[...] += jnp.sum((ratio - 1.0) - delta_c, keepdims=True)
    cf_sum[...] += jnp.sum((jnp.abs(ratio - 1.0) > eps)
                           .astype(jnp.float32), keepdims=True)

    # ---- backward
    # d policy_loss / d ratio = -(adv * sel) / N:  inside the clip band both
    # min() branches have derivative adv; outside, min() selects the
    # unclipped branch (derivative adv) exactly when clipping would have
    # HELPED the objective (adv>0, ratio low / adv<0, ratio high), else the
    # clipped branch whose derivative is 0.
    sel = (in_band | ((adv > 0.0) & (ratio < 1.0 - eps))
           | ((adv < 0.0) & (ratio > 1.0 + eps)))
    dlogp = (-(adv * ratio) * inv_n) * (
        sel & delta_in).astype(jnp.float32)     # dL/dlogp  (1, C)
    dmean = dlogp * (diff / var)                # dlogp/dmean = diff/var
    # d logp / d log_std = diff^2/var - 1 (straight-through through clamp)
    dls[...] += jnp.sum(dlogp * (diff * diff / var - 1.0), keepdims=True)

    dvalue = (jnp.float32(vf_coef) * 2.0 * inv_n) * verr    # (1, C)

    # head grads stacked into the packed (8, C) layout (rows 2-7 zero)
    dO = jnp.concatenate(
        [dmean, dvalue, jnp.zeros((6, dmean.shape[1]), jnp.float32)], axis=0)
    dw3c[...] += dot_cc(dO, H2)                 # (8, 128)
    db3c[...] += jnp.sum(dO, axis=1, keepdims=True)
    dH2 = dot_ff(w3c, dO)                       # (128, C)
    E2 = dH2 * (1.0 - H2 * H2)
    dw2c[...] += dot_cc(E2, H1)                 # (128, 128)
    db2c[...] += jnp.sum(E2, axis=1, keepdims=True)
    dH1 = dot_ff(w2c, E2)                       # (128, C)
    E1 = dH1 * (1.0 - H1 * H1)
    dw1c[...] += dot_cc(E1, x)                  # (128, 8)
    db1c[...] += jnp.sum(E1, axis=1, keepdims=True)


# packed two-towers-in-one operand builder, shared with the rollout kernel
_pack_update_params = pack_params_two_towers


# ------------------------------------------------- packed parameter tree
#
# The packed-parameter update path (learner.ppo_update packed=True) keeps
# params AND Adam moments in this 7-leaf kernel layout for the whole
# epochs x minibatches loop: one pack + one unpack per train_step instead
# of six scatters per grad step, and Adam runs on a few big contiguous
# tensors instead of ~11 small per-tower leaves — the per-member small-tile
# DMA pathology the population xplane trace exposed
# (docs/PERFORMANCE.md 'Population training throughput').
#
# Equivalence to the flax-tree update is exact by construction: the
# off-diagonal packing artifacts are masked to zero in the gradients, so
# Adam's elementwise moments stay zero there and the zero blocks never
# drift; clip_by_global_norm sees the same global norm (zeros contribute
# nothing; log_std is a leaf of the packed tree too).

def _np_masks():
    import numpy as np
    w2 = np.zeros((128, 128), np.float32)
    w2[:64, :64] = 1.0
    w2[64:, 64:] = 1.0
    w3 = np.zeros((8, 128), np.float32)
    w3[0, :64] = 1.0
    w3[1, 64:] = 1.0
    b3 = np.zeros((8, 1), np.float32)
    b3[0] = b3[1] = 1.0
    return w2, w3, b3


_MASK_W2, _MASK_W3, _MASK_B3 = _np_masks()


def pack_params_tree(params) -> Dict[str, jax.Array]:
    """Flax ActorCritic params -> the 7-leaf packed tree (kernel layout +
    log_std)."""
    w1c, b1c, w2c, b2c, w3c, b3c = pack_params_two_towers(params)
    return {"w1c": w1c, "b1c": b1c, "w2c": w2c, "b2c": b2c,
            "w3c": w3c, "b3c": b3c,
            "log_std": params["params"]["log_std"].astype(jnp.float32)}


def _unpack_to_flax(w1c, b1c, w2c, b2c, w3c, b3c, log_std, ref_params):
    """Kernel-layout blocks -> flax tree (shapes/dtypes of ref_params);
    off-diagonal packing artifacts are dropped by the slicing."""
    def unpack(dk, db):
        return {"kernel": dk.T, "bias": db.reshape(-1)}

    ref = ref_params["params"]
    tree = {"params": {
        "pi_tower": {"dense_0": unpack(w1c[:64], b1c[:64]),
                     "dense_1": unpack(w2c[:64, :64], b2c[:64])},
        "vf_tower": {"dense_0": unpack(w1c[64:], b1c[64:]),
                     "dense_1": unpack(w2c[64:, 64:], b2c[64:])},
        "action_head": unpack(w3c[0:1, :64], b3c[0:1]),
        "value_head": unpack(w3c[1:2, 64:], b3c[1:2]),
        "log_std": log_std.reshape(ref["log_std"].shape),
    }}
    return jax.tree.map(lambda g, p: g.astype(p.dtype), tree, ref_params)


def unpack_params_tree(packed: Dict[str, jax.Array], ref_params):
    """Packed 7-leaf tree -> flax tree shaped/dtyped like ref_params."""
    return _unpack_to_flax(packed["w1c"], packed["b1c"], packed["w2c"],
                           packed["b2c"], packed["w3c"], packed["b3c"],
                           packed["log_std"], ref_params)


def _grad_out_shapes():
    f32 = jnp.float32
    s = jax.ShapeDtypeStruct
    return [s((128, 8), f32), s((128, 1), f32),    # dw1c, db1c
            s((128, 128), f32), s((128, 1), f32),  # dw2c, db2c
            s((8, 128), f32), s((8, 1), f32),      # dw3c, db3c
            s((1, 1), f32),                        # dls
            s((1, 1), f32), s((1, 1), f32),        # pl_sum, vl_sum
            s((1, 1), f32), s((1, 1), f32)]        # kl_sum, cf_sum


def _chunk_cols(n_rows: int, max_c: int = 2048) -> int:
    """Largest lane-aligned chunk <= max_c that divides the minibatch."""
    c = max_c
    while c >= 128:
        if n_rows % c == 0:
            return c
        c //= 2
    raise ValueError(
        f"fused update needs minibatch_size divisible by 128, got {n_rows}")


def supported(minibatch_size: int) -> bool:
    return minibatch_size % 128 == 0


def normalize_adv_column(mb_data: jax.Array) -> jax.Array:
    """SB3's per-minibatch advantage normalization applied to the packed
    (N, 13) matrix's advantage column — the ONE definition of the formula
    for the packed layout (learner.ppo_loss holds the unpacked-field
    equivalent; the two must stay in lockstep)."""
    adv = mb_data[:, _ADV]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    return mb_data.at[:, _ADV].set(adv)


def _grad_kernel_call(weights, log_std_11, dataT, *, n: int,
                      clip_range: float, vf_coef: float, bf16: bool,
                      interpret: bool, max_chunk: int):
    """The pallas_call shared by both entry points: packed 6-tuple weight
    operands + (1,1) log_std + (13, n) data -> the 11 raw grad/stat outs."""
    C = _chunk_cols(n, max_chunk)
    wspec = [pl.BlockSpec(w.shape, lambda g, r=len(w.shape): (0,) * r,
                          memory_space=pltpu.VMEM) for w in weights]
    dspec = pl.BlockSpec((N_COLS, C), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec(s.shape, lambda g, r=len(s.shape): (0,) * r,
                              memory_space=pltpu.VMEM)
                 for s in _grad_out_shapes()]
    kernel = functools.partial(_ppo_grad_kernel, n_rows=n,
                               clip_range=clip_range, vf_coef=vf_coef,
                               bf16=bf16)
    return pl.pallas_call(
        kernel,
        grid=(n // C,),
        in_specs=([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
                  + wspec + [dspec]),
        out_specs=out_specs,
        out_shape=_grad_out_shapes(),
        interpret=interpret,
    )(log_std_11, *weights, dataT)


def _loss_aux(pl_sum, vl_sum, kl_sum, cf_sum, n: int, log_std_scalar,
              ent_coef: float, vf_coef: float) -> Dict[str, jax.Array]:
    inv_n = 1.0 / n
    cls = jnp.clip(log_std_scalar.astype(jnp.float32), -4.0, 2.0)
    policy_loss = pl_sum[0, 0] * inv_n
    value_loss = vl_sum[0, 0] * inv_n
    entropy = jnp.float32(0.5 * (1.0 + LOG_2PI)) + cls
    return {
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": kl_sum[0, 0] * inv_n,
        "clip_fraction": cf_sum[0, 0] * inv_n,
        "loss": (policy_loss + ent_coef * (-entropy)
                 + vf_coef * value_loss),
    }


def ppo_minibatch_grads(params, mb_data: jax.Array, *, clip_range: float,
                        vf_coef: float, ent_coef: float,
                        normalize_advantage: bool = True,
                        interpret: bool = False, max_chunk: int = 2048,
                        bf16: bool = False
                        ) -> Tuple[Dict, Dict[str, jax.Array]]:
    """Gradients of learner.ppo_loss for one packed minibatch.

    `mb_data` is the learner's (mb_size, 13) packed matrix
    [obs(8), action, old_logp, old_value, advantage, return] with the RAW
    advantage column (normalized here, per minibatch, like the XLA loss).
    Returns (grads pytree matching the flax params, aux metrics dict with
    the same keys as ppo_loss).
    """
    n = mb_data.shape[0]
    assert mb_data.shape[1] == N_COLS, (
        f"fused update specializes obs_dim=8 / act_dim=1 "
        f"(packed width 13, got {mb_data.shape[1]})")
    f32 = jnp.float32

    if normalize_advantage:
        mb_data = normalize_adv_column(mb_data)
    dataT = mb_data.astype(f32).T               # (13, n): one cheap transpose

    weights = _pack_update_params(params)
    log_std = params["params"]["log_std"].astype(f32).reshape(1, 1)

    outs = _grad_kernel_call(weights, log_std, dataT, n=n,
                             clip_range=clip_range, vf_coef=vf_coef,
                             bf16=bf16, interpret=interpret,
                             max_chunk=max_chunk)
    (dw1c, db1c, dw2c, db2c, dw3c, db3c, dls,
     pl_sum, vl_sum, kl_sum, cf_sum) = outs

    # entropy term: entropy = 0.5*(1+log 2pi) + log_std (scalar); the loss
    # adds ent_coef * (-entropy), whose log_std gradient is -ent_coef
    dls_total = dls[0, 0] - jnp.float32(ent_coef)
    grads = _unpack_to_flax(dw1c, db1c, dw2c, db2c, dw3c, db3c, dls_total,
                            params)
    aux = _loss_aux(pl_sum, vl_sum, kl_sum, cf_sum, n,
                    params["params"]["log_std"][0], ent_coef, vf_coef)
    return grads, aux


def ppo_minibatch_grads_packed(packed: Dict[str, jax.Array],
                               mb_data: jax.Array, *, clip_range: float,
                               vf_coef: float, ent_coef: float,
                               normalize_advantage: bool = True,
                               interpret: bool = False,
                               max_chunk: int = 2048, bf16: bool = False
                               ) -> Tuple[Dict, Dict[str, jax.Array]]:
    """ppo_minibatch_grads for PACKED-layout params: takes and returns the
    7-leaf packed tree (pack_params_tree) with no per-call pack/unpack
    scatters — the packed-parameter update loop's grad step
    (learner.ppo_update packed=True).  Off-diagonal packing artifacts in
    dw2c/dw3c/db3c are MASKED to zero so elementwise optimizers keep the
    zero blocks invariant and global-norm clipping sees exactly the real
    parameters' norm."""
    n = mb_data.shape[0]
    assert mb_data.shape[1] == N_COLS, (
        f"fused update specializes obs_dim=8 / act_dim=1 "
        f"(packed width 13, got {mb_data.shape[1]})")
    f32 = jnp.float32
    if normalize_advantage:
        mb_data = normalize_adv_column(mb_data)
    dataT = mb_data.astype(f32).T
    weights = (packed["w1c"], packed["b1c"], packed["w2c"], packed["b2c"],
               packed["w3c"], packed["b3c"])
    log_std = packed["log_std"].astype(f32).reshape(1, 1)
    outs = _grad_kernel_call(weights, log_std, dataT, n=n,
                             clip_range=clip_range, vf_coef=vf_coef,
                             bf16=bf16, interpret=interpret,
                             max_chunk=max_chunk)
    (dw1c, db1c, dw2c, db2c, dw3c, db3c, dls,
     pl_sum, vl_sum, kl_sum, cf_sum) = outs
    dls_total = dls[0, 0] - jnp.float32(ent_coef)
    grads = {"w1c": dw1c, "b1c": db1c,
             "w2c": dw2c * _MASK_W2, "b2c": db2c,
             "w3c": dw3c * _MASK_W3, "b3c": db3c * _MASK_B3,
             "log_std": dls_total.reshape(packed["log_std"].shape)}
    aux = _loss_aux(pl_sum, vl_sum, kl_sum, cf_sum, n,
                    packed["log_std"].reshape(-1)[0], ent_coef, vf_coef)
    return grads, aux
