"""PPO hyperparameters.

Defaults replicate the reference's recorded configuration exactly (SB3
defaults + seed, SURVEY.md §6 'PPO config of record', extracted from the
committed best_model.zip and training_main.py:44-52): n_steps 2048, batch 64,
10 epochs, gamma 0.99, GAE lambda 0.95, clip 0.2, ent_coef 0, vf_coef 0.5,
max_grad_norm 0.5, Adam(3e-4, eps=1e-5).

The reference runs ONE env; the TPU-native scale-out config (`tpu_default`)
keeps the same optimization semantics but fills the 2048-step buffer from
many vmapped envs per iteration.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    # Rollout sizing
    n_envs: int = 1
    n_steps: int = 2048              # settings.py:10 N_STEPS
    total_timesteps: int = 2048 * 512  # settings.py:11 TOTAL_STEPS

    # Optimization (training_main.py:44-48 + SB3 defaults)
    minibatch_size: int = 64
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    learning_rate: float = 3e-4
    adam_eps: float = 1e-5
    normalize_advantage: bool = True
    # Epoch-shuffle granularity: rows are shuffled in contiguous blocks of
    # this many samples.  1 = exact SB3 row-level shuffle.  0 = auto: 1 for
    # small buffers, 512 for TPU-scale ones — a row-level random gather over
    # a >500k-row buffer costs ~10x the minibatch grad steps on TPU (gathers
    # are row-granular), while a 512-block shuffle is bandwidth-bound and
    # statistically equivalent at minibatch sizes >= 2^15.
    shuffle_block_size: int = 0
    # Linear LR decay to 0 over the run (SB3 exposes this as
    # learning_rate=linear_schedule; the reference kept it constant).
    # Large-batch runs converge cleaner with it on.
    anneal_lr: bool = False
    # Collect the rollout with the fused policy-in-kernel Pallas rollout
    # (ops/pallas_policy.py): n_steps/fused_chunk kernel launches instead
    # of n_steps scan iterations of separate policy/env kernels.  Same
    # optimization semantics; RNG streams differ (statistically, not bit,
    # identical to the XLA rollout).  TPU only.
    fused_rollout: bool = False
    fused_chunk: int = 16
    # Compute each minibatch's PPO-loss gradient with the fused Pallas
    # forward+backward kernel (ops/pallas_update.py): activations stay in
    # VMEM instead of round-tripping HBM between the XLA fwd/bwd matmuls.
    # Bit-compatible loss semantics (grads match jax.grad to f32 rounding);
    # grad-clip + Adam stay in XLA.  TPU only; multi-device runs shard_map
    # the kernel over the env mesh with pmean-ed grads
    # (learner.make_fused_grads_fn — pass mesh= to make_train_step); needs
    # (minibatch_size / n_devices) % 128 == 0 and the default
    # (64,64)/obs-8 architecture.
    fused_update: bool = False
    # Explicitly cast the fused update's MXU operands to bf16 (f32
    # accumulate).  On v5e this is a numeric AND perf no-op: Mosaic's
    # default-precision f32 dot already quantizes operands to bf16 in a
    # single MXU pass — verified on chip (bf16 grads bit-identical to the
    # f32 kernel's; operand-quantization probe in
    # scripts/pallas_tpu_check.py / artifacts/pallas_tpu_check.json).
    # Kept for portability to targets whose default dot is multi-pass
    # f32, where the cast would trade ~1e-2 relative grad rounding
    # (interpreter-measured, tests/test_pallas_update.py) for MXU rate.
    fused_update_bf16: bool = False
    # Run the fused update's WHOLE epochs x minibatches loop on
    # packed-layout parameters: params and Adam moments stay in the
    # kernel's 7-leaf packed form (two towers in one 128-wide block-
    # diagonal network + log_std) for all grad steps, with one pack and
    # one unpack per train_step.  Semantically identical to fused_update
    # (off-diagonal grads are masked to zero, so elementwise Adam keeps
    # the zero blocks invariant and global-norm clipping sees the real
    # parameter norm; only float summation order differs).  The win is
    # for POPULATION runs, where the vmapped flax-tree update's ~11 small
    # (P, 64, .) leaves per grad step are DMA-latency-bound
    # (docs/PERFORMANCE.md 'Population training throughput'); implies
    # fused_update.
    fused_update_packed: bool = False
    # Columns per kernel grid step.  The grid is sequential with ~4-5us
    # fixed cost per step (measured v5e), which dominates the 167us f32
    # grad step at 2048 cols x 32 chunks; 4096 halves the chunk count.
    # Larger values pressure VMEM ((128, C) activations live through the
    # backward); 16384 fails to compile on v5e.
    fused_update_chunk: int = 4096
    # Rematerialize the XLA update's backward pass (jax.checkpoint around
    # the loss): the grad step is HBM-bound on the (minibatch, 64) tower
    # activations round-tripping between forward and backward (~134 MB per
    # 65536-row minibatch, ~133us measured on v5e); remat recomputes them
    # from the 3.4 MB minibatch instead, trading cheap MXU flops for the
    # dominant HBM traffic.  Exact same gradients (same float ops, same
    # order) — only the schedule changes.
    update_remat: bool = False

    seed: int = 13                   # settings.py:28

    # Evaluation cadence (training_main.py:31-35; settings.py:12)
    eval_every_steps: int = 2048 * 512 // 32   # EVAL_STEPS = 32768
    eval_episodes: int = 10                     # EVAL_EPISODES

    @property
    def batch_size(self) -> int:
        return self.n_envs * self.n_steps

    @property
    def shuffle_block(self) -> int:
        """Resolved shuffle block size (see shuffle_block_size)."""
        b = self.shuffle_block_size
        if b == 0:
            b = 512 if (self.minibatch_size >= 1 << 15
                        and self.minibatch_size % 512 == 0) else 1
        assert self.minibatch_size % b == 0 and self.batch_size % b == 0, (
            f"shuffle block {b} must divide minibatch {self.minibatch_size} "
            f"and buffer {self.batch_size}")
        return b

    @property
    def n_minibatches(self) -> int:
        assert self.batch_size % self.minibatch_size == 0, (
            f"buffer {self.batch_size} not divisible by minibatch "
            f"{self.minibatch_size}")
        return self.batch_size // self.minibatch_size

    @property
    def n_iterations(self) -> int:
        return self.total_timesteps // self.batch_size


def reference_config() -> PPOConfig:
    """The exact single-env configuration of record."""
    return PPOConfig()


def tpu_default(n_envs: int = 2048, n_steps: int = 128,
                total_timesteps: int = 2048 * 512 * 8,
                minibatch_size: int = 65536) -> PPOConfig:
    """Scaled config: same PPO semantics, TPU-sized batches.

    n_envs=2048 (262,144-sample buffer) is the config of the flagship
    artifact (ppo_tpu_e, 1252/100-ep): doubling the buffer to 4096 envs
    halves the Adam update rounds per sample budget and measurably hurts
    final policy quality (three 4096-env seeds at 268M steps plateaued at
    150-650 return vs 971-1229 for 2048-env seeds, 2026-08-21)."""
    return PPOConfig(n_envs=n_envs, n_steps=n_steps,
                     total_timesteps=total_timesteps,
                     minibatch_size=minibatch_size,
                     eval_every_steps=max(n_envs * n_steps * 4, 2048 * 512 // 32))
