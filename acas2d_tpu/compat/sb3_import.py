"""Import stable-baselines3 PPO policies into the flax ActorCritic.

The reference commits trained SB3 checkpoints (best_model.zip + four
training checkpoints, SURVEY.md §2 C13).  This module maps their
`policy.pth` state dict (MlpPolicy: mlp_extractor.policy_net/value_net
towers + action_net/value_net heads + log_std) onto
`acas2d_tpu.models.actor_critic.ActorCritic` parameters, so

  * users migrating from the reference keep their trained models, and
  * the framework can *prove* end-to-end behavioral parity by evaluating
    the reference's own policy on the TPU engine and reproducing its
    recorded eval reward (tests/test_sb3_parity.py).

Only torch-CPU deserialization is used; no SB3 dependency.
"""

from __future__ import annotations

import io
import zipfile
from typing import Dict

import numpy as np


def load_sb3_state_dict(zip_path: str) -> Dict[str, np.ndarray]:
    """Read policy.pth out of an SB3 model zip into numpy arrays."""
    import torch
    with zipfile.ZipFile(zip_path) as z:
        sd = torch.load(io.BytesIO(z.read("policy.pth")),
                        map_location="cpu", weights_only=False)
    return {k: v.detach().numpy() for k, v in sd.items()}


def sb3_to_flax_params(sd: Dict[str, np.ndarray], dtype=np.float32):
    """Map the SB3 MlpPolicy state dict onto ActorCritic's param pytree.

    Torch Linear stores weight (out, in); flax Dense kernels are (in, out),
    hence the transposes.
    """
    def k(name):
        return np.ascontiguousarray(sd[name].T.astype(dtype))

    def b(name):
        return sd[name].astype(dtype)

    return {"params": {
        "pi_tower": {
            "dense_0": {"kernel": k("mlp_extractor.policy_net.0.weight"),
                        "bias": b("mlp_extractor.policy_net.0.bias")},
            "dense_1": {"kernel": k("mlp_extractor.policy_net.2.weight"),
                        "bias": b("mlp_extractor.policy_net.2.bias")},
        },
        "vf_tower": {
            "dense_0": {"kernel": k("mlp_extractor.value_net.0.weight"),
                        "bias": b("mlp_extractor.value_net.0.bias")},
            "dense_1": {"kernel": k("mlp_extractor.value_net.2.weight"),
                        "bias": b("mlp_extractor.value_net.2.bias")},
        },
        "action_head": {"kernel": k("action_net.weight"),
                        "bias": b("action_net.bias")},
        "value_head": {"kernel": k("value_net.weight"),
                       "bias": b("value_net.bias")},
        "log_std": sd["log_std"].astype(dtype),
    }}


def load_sb3_policy(zip_path: str, dtype=np.float32):
    """One-call import: SB3 zip -> flax ActorCritic params."""
    return sb3_to_flax_params(load_sb3_state_dict(zip_path), dtype)
