"""On-device PPO learner: rollout collection + clipped-surrogate updates.

The reference's two hot loops (SURVEY.md §3.1) — SB3 collect_rollouts over a
single Python env and torch-CPU PPO.train — become one jitted program: a
`lax.scan` rollout over vmapped envs feeding a `lax.scan` of
epochs x minibatches of Adam updates.  Nothing leaves the device between
iterations; host code only reads back a small metrics dict.

Optimization semantics replicate SB3 PPO (the config of record, SURVEY.md
§6): raw (unclipped) gaussian samples keep their log-probs while the env
receives actions clipped to [-1,1]; advantages are normalized per minibatch;
value loss is un-clipped MSE; entropy uses the closed form; global-norm grad
clipping at 0.5 before Adam(3e-4, eps=1e-5).

Scaling: with env state sharded over the ('env',) mesh and params
replicated, the rollout is embarrassingly parallel and XLA inserts gradient
all-reduces (psum over ICI) in the update — a pjit data-parallel learner
with no hand-written collectives (BASELINE.json configs 4-5).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from acas2d_tpu.config import EnvParams
from acas2d_tpu.envs import core, vector
from acas2d_tpu.models.actor_critic import (ActorCritic, gaussian_entropy,
                                            gaussian_log_prob, sample_action)
from acas2d_tpu.ppo.config import PPOConfig
from acas2d_tpu.ppo.gae import compute_gae
from acas2d_tpu.types import EnvState


@struct.dataclass
class RolloutBatch:
    """Time-major on-device rollout buffer, leaves (T, B, ...)."""
    obs: jax.Array
    actions: jax.Array      # raw (unclipped) samples
    log_probs: jax.Array
    values: jax.Array
    rewards: jax.Array
    dones: jax.Array


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_state: EnvState     # batched (B,)
    obs: jax.Array          # (B, O)
    key: jax.Array
    # Count of completed PPO iterations (int32).  The global env-step count
    # is iteration * (n_envs * n_steps), derived HOST-side as a Python int:
    # an on-device int32 env-step counter overflows at 2^31 steps, which a
    # TPU run crosses in under three minutes.
    iteration: jax.Array


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    if cfg.anneal_lr:
        total_updates = cfg.n_iterations * cfg.n_epochs * cfg.n_minibatches
        lr = optax.linear_schedule(cfg.learning_rate, 0.0, total_updates)
    else:
        lr = cfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(lr, eps=cfg.adam_eps))


def init_train_state(key: jax.Array, model: ActorCritic, cfg: PPOConfig,
                     env_params: EnvParams, dtype=jnp.float32) -> TrainState:
    k_model, k_env, k_carry = jax.random.split(key, 3)
    obs_dim = env_params.obs_dim
    # jit the init path: on a tunneled TPU backend, eager dispatch pays a
    # remote-compile round trip per primitive op.
    params = jax.jit(model.init)(k_model, jnp.zeros((1, obs_dim), dtype))
    opt_state = jax.jit(make_optimizer(cfg).init)(params)
    env_state, obs = jax.jit(
        lambda k: vector.reset_batch(k, cfg.n_envs, env_params, dtype))(k_env)
    return TrainState(params=params, opt_state=opt_state,
                      env_state=env_state, obs=obs, key=k_carry,
                      iteration=jnp.asarray(0, jnp.int32))


def _shard_map(fn, mesh, in_specs, out_specs):
    """Version shim: `jax.shard_map` (jax >= 0.4.35) vs the experimental
    module.  The pallas_call outputs inside `fn` carry no vma/rep
    annotation, so the varying-across-mesh check is disabled either way."""
    try:
        from jax import shard_map as smap
        kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map as smap
        kw = {"check_rep": False}
    return smap(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


# ---------------------------------------------------------------- rollout

def collect_rollout(model: ActorCritic, state: TrainState, cfg: PPOConfig,
                    env_params: EnvParams
                    ) -> Tuple[TrainState, RolloutBatch, jax.Array, Dict]:
    """Scan cfg.n_steps autoreset steps; returns (state', batch, last_value,
    episode metrics aggregated over the rollout)."""

    def body(carry, _):
        env_state, obs, key = carry
        key, k_act = jax.random.split(key)
        mean, log_std, value = model.apply(state.params, obs)
        action = sample_action(k_act, mean, log_std)          # (B, A)
        logp = gaussian_log_prob(action, mean, log_std)       # (B,)
        clipped = jnp.clip(action, -1.0, 1.0)
        env_state, out = vector.step_autoreset_batch(
            env_state, clipped[..., 0], env_params)
        rb = RolloutBatch(obs=obs, actions=action, log_probs=logp,
                          values=value, rewards=out.reward,
                          dones=out.done)
        ep_info = (out.done, out.episode_return, out.episode_steps, out.outcome)
        return (env_state, out.obs, key), (rb, ep_info)

    (env_state, obs, key), (batch, ep_info) = jax.lax.scan(
        body, (state.env_state, state.obs, state.key), None,
        length=cfg.n_steps)

    _, _, last_value = model.apply(state.params, obs)

    dones, ep_ret, ep_len, outcome = ep_info
    n_ep = jnp.maximum(dones.sum(), 1)
    metrics = {
        "episodes": dones.sum(),
        "ep_return_mean": jnp.where(dones, ep_ret, 0.0).sum() / n_ep,
        "ep_length_mean": jnp.where(dones, ep_len, 0).sum() / n_ep,
        "goal_rate": (outcome == 1).sum() / n_ep,
        "collision_rate": (outcome == 2).sum() / n_ep,
        "timeout_rate": (outcome == 3).sum() / n_ep,
    }
    new_state = state.replace(
        env_state=env_state, obs=obs, key=key,
        iteration=state.iteration + 1)
    return new_state, batch, last_value, metrics


def collect_rollout_fused(model: ActorCritic, state: TrainState,
                          cfg: PPOConfig, env_params: EnvParams,
                          mesh=None
                          ) -> Tuple[TrainState, RolloutBatch, jax.Array, Dict]:
    """collect_rollout via the fused policy-in-kernel Pallas rollout
    (ops/pallas_policy.py): T/chunk kernel launches instead of T scan
    iterations of separate policy/env kernels.  Returns the same
    (state', batch, last_value, metrics) contract; RNG streams differ from
    the XLA path (hash vs threefry) so results are statistically — not
    bit — identical.

    With `mesh` given, each chunk launch runs under shard_map over the
    ('env',) axis — one independent kernel grid per device, params
    replicated, zero collectives (the multi-chip story of
    parallel/mesh.py, unchanged for the fused path)."""
    from acas2d_tpu.ops import pallas_policy

    K = cfg.fused_chunk
    assert cfg.n_steps % K == 0, (
        f"n_steps {cfg.n_steps} not divisible by fused_chunk {K}")
    es = state.env_state
    key, k_seed = jax.random.split(state.key)
    seed = jax.random.randint(k_seed, (), 0, jnp.iinfo(jnp.int32).max,
                              jnp.int32)

    interpret = jax.default_backend() != "tpu"   # CPU: pallas interpreter

    def launch(flat, obs, params, seed, offset):
        # flat["pa_lat"] is carried for scan-structure symmetry only: the
        # kernel never reads the incoming value (step() overwrites a_lat
        # before any use) and returns the last applied one
        st, buf = pallas_policy.fused_policy_rollout(
            flat["px"], flat["py"], flat["psi"], flat["tx"], flat["ty"],
            flat["tv"], flat["tpsi"], flat["steps"], flat["total_reward"],
            obs, params, seed, offset, K, env_params, interpret=interpret)
        return st, buf

    if mesh is not None:
        from jax.sharding import PartitionSpec as PS
        axis = mesh.axis_names[0]

        def sharded_launch(flat, obs, params, seed, offset):
            # distinct RNG base per shard: program ids restart at 0 in
            # every shard, so fold the device index into the seed
            seed = seed + jax.lax.axis_index(axis) * jnp.int32(7919)
            return launch(flat, obs, params, seed, offset)

        flat_spec = {k: PS(axis) for k in
                     ("px", "py", "psi", "tx", "ty", "tv", "tpsi",
                      "steps", "total_reward", "pa_lat")}
        state_out_spec = dict(flat_spec, obs=PS(axis, None))
        buf_spec = {k: PS(None, axis) for k in
                    ("actions", "log_probs", "values", "rewards", "dones",
                     "episode_return", "episode_steps", "outcome")}
        buf_spec["obs"] = PS(None, axis, None)
        launch_fn = _shard_map(
            sharded_launch, mesh,
            in_specs=(flat_spec, PS(axis, None),
                      jax.tree.map(lambda _: PS(), state.params),
                      PS(), PS()),
            out_specs=(state_out_spec, buf_spec))
    else:
        launch_fn = launch

    def chunk(carry, idx):
        flat, obs = carry
        st, buf = launch_fn(flat, obs, state.params, seed, idx * K)
        next_obs = st.pop("obs")
        return (st, next_obs), buf

    flat0 = dict(px=es.px, py=es.py, psi=es.ppsi,
                 tx=es.tx[:, 0], ty=es.ty[:, 0], tv=es.tv[:, 0],
                 tpsi=es.tpsi[:, 0], steps=es.steps,
                 total_reward=es.total_reward, pa_lat=es.pa_lat)
    (flatF, obsF), bufs = jax.lax.scan(
        chunk, (flat0, state.obs.astype(jnp.float32)),
        jnp.arange(cfg.n_steps // K))
    # un-chunk: (n_chunks, K, B, ...) -> (T, B, ...)
    bufs = jax.tree.map(
        lambda x: x.reshape((cfg.n_steps,) + x.shape[2:]), bufs)

    batch = RolloutBatch(
        obs=bufs["obs"], actions=bufs["actions"][..., None],
        log_probs=bufs["log_probs"], values=bufs["values"],
        rewards=bufs["rewards"], dones=bufs["dones"] > 0)
    _, _, last_value = model.apply(state.params, obsF)

    env_state = es.replace(
        px=flatF["px"], py=flatF["py"], ppsi=flatF["psi"],
        pa_lat=flatF["pa_lat"],
        tx=flatF["tx"][:, None], ty=flatF["ty"][:, None],
        tv=flatF["tv"][:, None], tpsi=flatF["tpsi"][:, None],
        steps=flatF["steps"], total_reward=flatF["total_reward"],
        outcome=jnp.zeros_like(es.outcome))

    dones = bufs["dones"]
    outcome = bufs["outcome"]
    n_ep = jnp.maximum(dones.sum(), 1)
    metrics = {
        "episodes": dones.sum(),
        "ep_return_mean": bufs["episode_return"].sum() / n_ep,
        "ep_length_mean": bufs["episode_steps"].sum() / n_ep,
        "goal_rate": (outcome == 1).sum() / n_ep,
        "collision_rate": (outcome == 2).sum() / n_ep,
        "timeout_rate": (outcome == 3).sum() / n_ep,
    }
    new_state = state.replace(env_state=env_state, obs=obsF, key=key,
                              iteration=state.iteration + 1)
    return new_state, batch, last_value, metrics


# ------------------------------------------------------------------- loss

def ppo_loss(params, model: ActorCritic, mb, cfg: PPOConfig):
    obs, actions, old_logp, old_values, advantages, returns = mb
    mean, log_std, value = model.apply(params, obs)
    logp = gaussian_log_prob(actions, mean, log_std)
    # log-ratio clamp: |logp - old_logp| can exceed exp()'s f32 range when
    # sigma is near the clamp floor; 20 nats is far outside the clip range
    # either way, so this only removes inf/NaN, not signal.
    ratio = jnp.exp(jnp.clip(logp - old_logp, -20.0, 20.0))

    if cfg.normalize_advantage:
        advantages = ((advantages - advantages.mean())
                      / (advantages.std() + 1e-8))

    unclipped = advantages * ratio
    clipped = advantages * jnp.clip(ratio, 1 - cfg.clip_range,
                                    1 + cfg.clip_range)
    policy_loss = -jnp.minimum(unclipped, clipped).mean()
    value_loss = jnp.mean((returns - value) ** 2)
    entropy = gaussian_entropy(log_std).mean()
    loss = (policy_loss + cfg.ent_coef * (-entropy)
            + cfg.vf_coef * value_loss)
    aux = {
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
        "approx_kl": jnp.mean((ratio - 1) - jnp.log(ratio)),
        "clip_fraction": jnp.mean(
            (jnp.abs(ratio - 1) > cfg.clip_range).astype(jnp.float32)),
    }
    return loss, aux


# ----------------------------------------------------------------- update

def make_fused_grads_fn(cfg: PPOConfig, mesh=None) -> Callable:
    """Minibatch-gradient callable `(params, packed_mb) -> (grads, aux)` for
    the fused Pallas update kernel (ops/pallas_update.py).

    Single device (mesh=None): one pallas_call over the whole minibatch.
    With a mesh: minibatch rows are shard_mapped over the mesh's env axis —
    each device runs the kernel on its local rows and gradients/loss
    statistics are pmean-ed, the same psum-over-ICI data-parallel pattern
    XLA inserts for the unfused grad path.  SB3's per-minibatch advantage
    normalization needs full-minibatch statistics, so it runs in XLA
    *before* the shard_map (the kernel then sees pre-normalized rows).

    Raises on the one unsupported configuration: multiple devices visible
    but no mesh — an un-shard_mapped pallas_call does not partition under
    jit auto-sharding, it would gather the minibatch onto one device.
    """
    from acas2d_tpu.ops import pallas_update

    interpret = jax.default_backend() != "tpu"
    if mesh is None and jax.device_count() > 1:
        raise ValueError(
            "cfg.fused_update on a multi-device backend needs an explicit "
            "mesh (pass mesh= to make_train_step) so the kernel runs under "
            "shard_map; an un-shard_mapped pallas_call does not partition "
            "under jit auto-sharding")
    n_shards = mesh.size if mesh is not None else 1
    assert (cfg.minibatch_size % n_shards == 0
            and pallas_update.supported(cfg.minibatch_size // n_shards)), (
        f"fused_update needs (minibatch_size / n_devices) % 128 == 0, got "
        f"minibatch {cfg.minibatch_size} over {n_shards} devices")

    kernel_kw = dict(clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
                     ent_coef=cfg.ent_coef, interpret=interpret,
                     bf16=cfg.fused_update_bf16,
                     max_chunk=cfg.fused_update_chunk)
    # packed-parameter mode: the grad callable takes/returns the 7-leaf
    # packed tree (ppo_update's packed carry), same call shape otherwise
    kernel_fn = (pallas_update.ppo_minibatch_grads_packed
                 if cfg.fused_update_packed
                 else pallas_update.ppo_minibatch_grads)
    if mesh is None:
        return functools.partial(
            kernel_fn, normalize_advantage=cfg.normalize_advantage,
            **kernel_kw)

    from jax.sharding import PartitionSpec as PS
    axis = mesh.axis_names[0]

    def local_grads(params, mb):
        grads, aux = kernel_fn(
            params, mb, normalize_advantage=False, **kernel_kw)
        # equal shard sizes: the global mean is the mean of shard means
        return jax.lax.pmean(grads, axis), jax.lax.pmean(aux, axis)

    smapped = _shard_map(local_grads, mesh,
                         in_specs=(PS(), PS(axis)),
                         out_specs=(PS(), PS()))

    def fused_grads(params, mb):
        if cfg.normalize_advantage:
            # SB3's per-minibatch normalization needs FULL-minibatch
            # statistics, so it runs before the shard_map (shared helper:
            # same formula as the kernel's own path and learner.ppo_loss)
            mb = pallas_update.normalize_adv_column(mb)
        return smapped(params, mb)

    return fused_grads


def _map_param_subtrees(tree, ref_params, fn):
    """Rebuild `tree` (an optax state) with `fn` applied to every subtree
    whose pytree STRUCTURE equals ref_params' (the Adam mu/nu moment trees),
    leaving scalars (step counts) and other state untouched.  This is how
    the packed-parameter update converts the optimizer state to/from the
    kernel's packed layout without hard-coding the optax chain topology."""
    pdef = jax.tree_util.tree_structure(ref_params)

    def is_param_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:
            return False

    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=is_param_tree)
    return jax.tree_util.tree_unflatten(
        treedef, [fn(l) if is_param_tree(l) else l for l in leaves])


def ppo_update(model: ActorCritic, tx: optax.GradientTransformation,
               params, opt_state, batch: RolloutBatch,
               advantages: jax.Array, returns: jax.Array, key: jax.Array,
               cfg: PPOConfig, mesh=None, fused_grads=None):
    """n_epochs x n_minibatches of clipped-PPO Adam steps (SB3 PPO.train).

    The six minibatch fields are folded into one (N, D) matrix so each
    epoch's shuffle is a single wide contiguous gather: TPU gathers move
    whole rows, so six skinny gathers cost ~10x one wide one.  The shuffle
    permutes contiguous blocks of cfg.shuffle_block rows; block=1 is the
    exact SB3 row-level shuffle (bit-identical minibatch order), 512 is the
    TPU-scale default (9x cheaper, statistically equivalent at >=2^15-row
    minibatches)."""
    N = cfg.batch_size
    obs_dim = batch.obs.shape[-1]
    act_dim = batch.actions.shape[-1]
    fields = (batch.obs, batch.actions, batch.log_probs, batch.values,
              advantages, returns)
    data = jnp.concatenate([x.reshape(N, -1) for x in fields], axis=1)
    block = cfg.shuffle_block
    blocks = data.reshape(N // block, block, data.shape[-1])
    splits = [obs_dim, obs_dim + act_dim, obs_dim + act_dim + 1,
              obs_dim + act_dim + 2, obs_dim + act_dim + 3]

    def unpack(mb):
        obs, actions, logp, values, adv, ret = jnp.split(mb, splits, axis=-1)
        return (obs, actions, logp[..., 0], values[..., 0],
                adv[..., 0], ret[..., 0])

    loss_fn = lambda p, mb: ppo_loss(p, model, mb, cfg)
    if cfg.update_remat:
        # recompute the tower activations in the backward instead of
        # round-tripping them through HBM (see PPOConfig.update_remat)
        loss_fn = jax.checkpoint(loss_fn)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if cfg.fused_update and fused_grads is None:
        fused_grads = make_fused_grads_fn(cfg, mesh)

    # Packed-parameter update loop (PPOConfig.fused_update_packed): params
    # and Adam moments stay in the kernel's 7-leaf packed layout for ALL
    # n_epochs x n_minibatches grad steps — one pack + one unpack per
    # train_step instead of six scatters per grad step, and the optimizer
    # runs on a few big contiguous tensors instead of ~11 small per-tower
    # leaves.  This kills the per-member small-tile DMA pathology that
    # bounds vmapped population updates (docs/PERFORMANCE.md).
    packed_mode = cfg.fused_update and cfg.fused_update_packed
    if packed_mode:
        from acas2d_tpu.ops import pallas_update as _pu
        carry_params = _pu.pack_params_tree(params)
        carry_opt = _map_param_subtrees(opt_state, params,
                                        _pu.pack_params_tree)
    else:
        carry_params, carry_opt = params, opt_state

    def epoch_body(carry, k_epoch):
        cparams, copt = carry
        perm = jax.random.permutation(k_epoch, N // block)
        mbs = blocks[perm].reshape(
            cfg.n_minibatches, cfg.minibatch_size, data.shape[-1])

        def mb_body(carry, mb):
            cparams, copt = carry
            if cfg.fused_update:
                # mb is already the kernel's packed (mb_size, 13) layout;
                # in packed_mode fused_grads is the packed-tree variant
                grads, aux = fused_grads(cparams, mb)
            else:
                (loss, aux), grads = grad_fn(cparams, unpack(mb))
                aux["loss"] = loss
            updates, copt = tx.update(grads, copt, cparams)
            cparams = optax.apply_updates(cparams, updates)
            return (cparams, copt), aux

        (cparams, copt), aux = jax.lax.scan(mb_body, (cparams, copt), mbs)
        return (cparams, copt), aux

    keys = jax.random.split(key, cfg.n_epochs)
    (carry_params, carry_opt), aux = jax.lax.scan(
        epoch_body, (carry_params, carry_opt), keys)
    if packed_mode:
        new_params = _pu.unpack_params_tree(carry_params, params)
        new_opt = _map_param_subtrees(
            carry_opt, carry_params,
            lambda t: _pu.unpack_params_tree(t, params))
        carry_params, carry_opt = new_params, new_opt
    metrics = jax.tree.map(lambda x: x.mean(), aux)
    return carry_params, carry_opt, metrics


# ------------------------------------------------------------- train step

def make_train_step(model: ActorCritic, cfg: PPOConfig,
                    env_params: EnvParams, mesh=None,
                    fused_grads: Callable = None) -> Callable:
    """Returns jit-able train_step(TrainState) -> (TrainState, metrics):
    one full PPO iteration (rollout + GAE + epochs of updates) on device.

    `mesh` is only consulted by the fused Pallas paths (rollout and update
    kernels need an explicit shard_map); the XLA paths shard transparently
    through jit.  `fused_grads` overrides the built-in fused-update
    gradient callable (population.make_population_step injects a
    vmap-compatible kernel partial that skips the shard_map plumbing)."""
    tx = make_optimizer(cfg)
    # built once here (also fails fast at build time, not first call)
    if cfg.fused_update and fused_grads is None:
        fused_grads = make_fused_grads_fn(cfg, mesh)
    if cfg.fused_rollout:
        rollout_fn = functools.partial(collect_rollout_fused, mesh=mesh)
    else:
        rollout_fn = collect_rollout

    def train_step(state: TrainState):
        state, batch, last_value, env_metrics = rollout_fn(
            model, state, cfg, env_params)
        advantages, returns = compute_gae(
            batch.rewards, batch.values, batch.dones, last_value,
            cfg.gamma, cfg.gae_lambda)
        key, k_update = jax.random.split(state.key)
        params, opt_state, opt_metrics = ppo_update(
            model, tx, state.params, state.opt_state, batch,
            advantages, returns, k_update, cfg, mesh=mesh,
            fused_grads=fused_grads)
        explained_var = 1.0 - (jnp.var(returns - batch.values)
                               / (jnp.var(returns) + 1e-8))
        state = state.replace(params=params, opt_state=opt_state, key=key)
        metrics = {**env_metrics, **opt_metrics,
                   "explained_variance": explained_var,
                   "iteration": state.iteration}
        return state, metrics

    return train_step


def make_train_loop(model: ActorCritic, cfg: PPOConfig,
                    env_params: EnvParams, iters_per_call: int,
                    mesh=None) -> Callable:
    """Returns jit-able train_loop(TrainState) -> (TrainState, metrics):
    `iters_per_call` full PPO iterations fused into ONE device program via
    lax.scan, so the host pays one dispatch + one metrics read-back per K
    iterations instead of per iteration.  On a remote/tunneled accelerator
    the per-call host round-trip (~10-15 ms) is comparable to the 17 ms
    compute of a tpu-preset iteration, so K=8-32 roughly doubles end-to-end
    training throughput.  Metrics come back stacked with a leading (K,)
    axis — semantically identical to K sequential train_step calls.
    """
    train_step = make_train_step(model, cfg, env_params, mesh)

    def train_loop(state: TrainState):
        return jax.lax.scan(lambda s, _: train_step(s), state, None,
                            length=iters_per_call)

    return train_loop


# -------------------------------------------------------------- evaluation

def _greedy_eval_metrics(model: ActorCritic, params, env_state, obs,
                         n_ep: int, env_params: EnvParams, dtype):
    """Shared eval body: step n_ep envs greedily (deterministic mean) for
    max_steps, aggregate the FIRST completed episode per env."""

    def body(carry, _):
        env_state, obs, ret, length, outcome, done_seen = carry
        mean, _, _ = model.apply(params, obs)
        a = jnp.clip(mean[..., 0], -1.0, 1.0)
        env_state, out = vector.step_batch(env_state, a, env_params)
        active = ~done_seen
        ret = ret + jnp.where(active, out.reward, 0.0)
        length = length + jnp.where(active, 1, 0)
        outcome = jnp.where(active & out.done, out.outcome, outcome)
        done_seen = done_seen | out.done
        return (env_state, out.obs, ret, length, outcome, done_seen), None

    init = (env_state, obs,
            jnp.zeros(n_ep, dtype), jnp.zeros(n_ep, jnp.int32),
            jnp.zeros(n_ep, jnp.int32), jnp.zeros(n_ep, bool))
    (f_state, _, ret, length, outcome, done_seen), _ = jax.lax.scan(
        body, init, None, length=env_params.max_steps)
    return {
        "eval_return_mean": ret.mean(),
        "eval_return_std": ret.std(),
        "eval_length_mean": length.astype(jnp.float32).mean(),
        "eval_goal_rate": (outcome == 1).mean(dtype=jnp.float32),
        "eval_collision_rate": (outcome == 2).mean(dtype=jnp.float32),
        "eval_done_all": done_seen.all(),
    }


def make_eval_fn(model: ActorCritic, cfg: PPOConfig, env_params: EnvParams,
                 dtype=jnp.float32) -> Callable:
    """Greedy (deterministic-mean) evaluation: EvalCallback equivalent
    (training_main.py:31-35).  Runs cfg.eval_episodes envs for max_steps;
    returns mean/std of the FIRST completed episode per env.  Episodes
    spawn from fresh in-graph threefry keys — statistically equivalent to
    the reference protocol; `make_exact_eval_fn` is the stream-identical
    variant."""

    n_ep = cfg.eval_episodes

    def eval_fn(params, key):
        env_state, obs = vector.reset_batch(key, n_ep, env_params, dtype)
        return _greedy_eval_metrics(model, params, env_state, obs, n_ep,
                                    env_params, dtype)

    return eval_fn


def make_exact_eval_fn(model: ActorCritic, cfg: PPOConfig,
                       env_params: EnvParams, dtype=jnp.float32,
                       skip_episodes: int = 0) -> Callable:
    """Greedy evaluation whose episodes spawn from a CONTINUING host
    Mersenne stream (oracle.MersenneSpawner + core.reset_from): the
    reference EvalCallback's episode protocol — n_eval_episodes sequential
    episodes per eval, drawn from one process-lifetime stream
    (training_main.py:28-35) — so the logged eval curve is
    protocol-identical to the reference's evaluations.npz (same spawn draw
    order; the reference's stream is additionally perturbed by its
    single training env sharing the global `random` module, which has no
    counterpart here).

    The returned callable is stateful host-side — the stream advances on
    every call — and accepts/ignores a `key` argument for interface parity
    with make_eval_fn.  The episodes run batched on device; only the ~10
    spawns per eval are host-side.  `skip_episodes` fast-forwards the
    stream past episodes consumed by a previous process (a resumed run
    passes evals-already-done * eval_episodes so the continuing-stream
    guarantee survives restarts — train.py computes it)."""
    from acas2d_tpu.oracle import MersenneSpawner

    n_ep = cfg.eval_episodes
    spawner = MersenneSpawner(env_params, seed=cfg.seed,
                              skip_episodes=skip_episodes)

    @jax.jit
    def run(params, psi, tx, ty, tv, tpsi, nt):
        env_state, obs = jax.vmap(
            lambda *a: core.reset_from(*a, env_params, dtype))(
            psi, tx, ty, tv, tpsi, nt)
        return _greedy_eval_metrics(model, params, env_state, obs, n_ep,
                                    env_params, dtype)

    def eval_fn(params, key=None):
        del key                          # Mersenne stream, not threefry
        import numpy as np
        inits = spawner.spawn_batch(n_ep)
        return run(
            params,
            jnp.asarray(np.array([i.player_psi for i in inits]), dtype),
            jnp.asarray(np.stack([i.traffic_x for i in inits]), dtype),
            jnp.asarray(np.stack([i.traffic_y for i in inits]), dtype),
            jnp.asarray(np.stack([i.traffic_v for i in inits]), dtype),
            jnp.asarray(np.stack([i.traffic_psi for i in inits]), dtype),
            jnp.asarray(np.array([i.num_traffic for i in inits]), jnp.int32))

    return eval_fn
