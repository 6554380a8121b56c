"""True multi-process jax.distributed test (SURVEY.md §4 item (c)).

Spawns 2 coordinator-connected processes, each exposing 4 virtual CPU
devices, so the global mesh spans 8 devices across 2 "hosts".  Each process
runs the SAME sharded program: env batch sharded over the global ('env',)
mesh, one full PPO train_step with psum-style gradient reduction inserted by
XLA.  This is the CI stand-in for a real pod slice — the mesh/sharding code
paths are identical, only the interconnect differs (SURVEY.md §5
'Distributed communication backend').
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.ppo import learner
from acas2d_tpu.ppo.config import PPOConfig

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()          # 2 procs x 4 local
assert len(jax.local_devices()) == 4

mesh = Mesh(np.asarray(jax.devices()), ("env",))
cfg = PPOConfig(n_envs=16, n_steps=8, minibatch_size=16,
                total_timesteps=16 * 8)
model = ActorCritic()
state = learner.init_train_state(
    jax.random.PRNGKey(0), model, cfg, DEFAULT_PARAMS)

env_sh = NamedSharding(mesh, P("env"))
repl = NamedSharding(mesh, P())
state = state.replace(
    env_state=jax.device_put(state.env_state, env_sh),
    obs=jax.device_put(state.obs, env_sh),
    params=jax.device_put(state.params, repl),
    opt_state=jax.device_put(state.opt_state, repl),
    key=jax.device_put(state.key, repl),
    iteration=jax.device_put(state.iteration, repl))

train_step = jax.jit(learner.make_train_step(model, cfg, DEFAULT_PARAMS))
state, metrics = train_step(state)
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss), loss
print(f"proc {jax.process_index()} ok loss={loss:.6f}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("ACAS2D_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed_train_step(tmp_path):
    # ephemeral coordinator port: two concurrent test runs on one box must
    # not collide (bind port 0, read back the kernel's pick, release it —
    # a tiny race window, but no fixed-port clashes)
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["COORD"] = f"localhost:{port}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    # both processes computed the same replicated loss
    losses = sorted(o.split("loss=")[1].strip()
                    for _, o, _ in outs for _ in [0] if "loss=" in o)
    assert len(losses) == 2 and losses[0] == losses[1], outs
