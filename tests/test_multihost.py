"""Minimal multi-host story (VERDICT round-1 item #8): two REAL processes
with jax.distributed.initialize over a local coordinator, each holding 2
CPU devices of a global 4-device dp mesh, per-host loader seeds
(seed + process_index), one shard_map dp step with gradient pmean over
Gloo — asserted equal to the same step run single-process on 4 devices.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "@REPO@")
sys.path.insert(0, os.path.join("@REPO@", "tests"))

from biomedkg_tpu.parallel.mesh import (distributed_init_if_needed,
                                        host_local_batch_seed)
distributed_init_if_needed()          # reads JAX_COORDINATOR_ADDRESS etc.
assert jax.process_count() == 2
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from test_multihost import build_problem, make_global_rngs

pid = jax.process_index()
out_path = sys.argv[1]

module, state_np, batches_for_host = build_problem()
# per-host loader seed: this host materializes ONLY its own 2 batches
local_batches = batches_for_host(host_local_batch_seed(42))

mesh = Mesh(np.array(jax.devices()).reshape(4, 1), axis_names=("dp", "tp"))
dp_sh = NamedSharding(mesh, P("dp"))
repl = NamedSharding(mesh, P())

from biomedkg_tpu.parallel.dp import make_dp_train_step, stack_batches
from biomedkg_tpu.training.kge_module import TrainState

def to_global_dp(local_stacked):
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(dp_sh, x),
        local_stacked)

def to_replicated(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), tree)

global_batches = to_global_dp(stack_batches(local_batches))
rngs_full = make_global_rngs()                    # (4, 2) uint32
local_rngs = rngs_full[2 * pid: 2 * pid + 2]
global_rngs = jax.make_array_from_process_local_data(dp_sh, local_rngs)

params = to_replicated(state_np["params"])
opt_state = to_replicated(module.tx.init(state_np["params"]))
state = TrainState(params, opt_state,
                   to_replicated(np.zeros((), np.int32)))

step_fn = make_dp_train_step(module, mesh)
state, loss = step_fn(state, global_batches, global_rngs)
loss = float(loss)
flat = [np.asarray(x) for x in
        jax.tree_util.tree_leaves(jax.device_get(state.params))]
np.savez(out_path, loss=np.float64(loss), *flat)
print(f"[proc {pid}] loss={loss:.6f}", flush=True)
"""


def build_problem():
    """Deterministic module + init params + per-host batch factory,
    shared between the children and the single-process reference."""
    import jax

    from biomedkg_tpu.data.node_encoders import RandomEncode
    from biomedkg_tpu.data.synthetic import synthetic_triplets
    from biomedkg_tpu.data.triplet import TripletGraph
    from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
    from biomedkg_tpu.training.kge_module import KGEModule

    dim = 16
    df = synthetic_triplets(num_gene=60, num_drug=25, num_disease=15,
                            num_edges=800, seed=11)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=dim))
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=dim,
        hidden_dim=dim, out_dim=dim, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=1,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    module.configure_optimizers(4)
    params = jax.device_get(module.init(jax.random.PRNGKey(5)))

    def batches_for_host(seed, n=2):
        loader = SaintRandomWalkLoader(
            tg.graph, batch_size=8, walk_length=4, num_steps=n,
            block_size=64, seed=seed,
            node_budget=128, edge_budget=640)  # fixed envelope: every host
        # and the reference build identical static shapes
        return list(loader)

    return module, {"params": params}, batches_for_host


def make_global_rngs():
    import jax

    return np.asarray(jax.random.split(jax.random.PRNGKey(7), 4))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path, repo_root):
    script = tmp_path / "child.py"
    script.write_text(_CHILD.replace("@REPO@", repo_root))
    port = _free_port()

    procs, outs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        out = str(tmp_path / f"proc{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(script), out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo_root))
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"child failed:\n{stderr[-3000:]}"

    # ---- single-process reference on the local 8-device mesh ----
    import jax

    from biomedkg_tpu.parallel.dp import make_dp_train_step, stack_batches
    from biomedkg_tpu.parallel.mesh import make_mesh
    from biomedkg_tpu.training.kge_module import TrainState

    module, state_np, batches_for_host = build_problem()
    batches = batches_for_host(42) + batches_for_host(43)  # host0 ∥ host1
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    step_fn = make_dp_train_step(module, mesh)
    state = TrainState(
        jax.tree_util.tree_map(np.asarray, state_np["params"]),
        module.tx.init(state_np["params"]), np.zeros((), np.int32))
    state, loss = step_fn(state, stack_batches(batches),
                          make_global_rngs())
    ref_loss = float(loss)
    ref_leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(jax.device_get(state.params))]

    for out in outs:
        z = np.load(out)
        assert abs(float(z["loss"]) - ref_loss) < 1e-6, \
            (float(z["loss"]), ref_loss)
        child_leaves = [z[k] for k in z.files if k != "loss"]
        assert len(child_leaves) == len(ref_leaves)
        for a, b in zip(child_leaves, ref_leaves):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)
