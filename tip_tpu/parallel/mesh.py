"""Device mesh + sharding rules.

The reference is single-process/single-GPU (SURVEY.md §2.8) — this module is
the new framework's scaling layer: a (data, model) mesh where

  * the batch shards over ``data`` (primary parallelism; gradients are
    all-reduced by XLA via the sharded-jit partitioner),
  * parameters optionally shard over ``model`` (tensor parallelism — overkill
    for a ~3.7M-param model, provided for completeness; XLA inserts the
    all-gathers/reduce-scatters on ICI).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialisation (DCN): call once per host before any device
    use. No-op for single-process runs; on TPU pods with the standard env
    (TPU_WORKER_HOSTNAMES etc.) jax auto-detects everything."""
    import os

    import jax

    if num_processes is not None and num_processes <= 1:
        return
    # true no-op for single-process runs: with nothing passed and no cluster
    # environment to auto-detect from, jax.distributed.initialize would
    # raise about a missing coordinator rather than no-op
    cluster_env = any(
        os.environ.get(v)
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                  "MEGASCALE_COORDINATOR_ADDRESS"))
    if (coordinator_address is None and num_processes is None
            and process_id is None and not cluster_env):
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # already initialised or single-process environment
        if "already" not in str(e).lower():
            raise


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params) -> dict:
    """Tensor-parallel PartitionSpecs for the TIP model parameter pytree.

    Megatron-style, per-head clean: q/k/v projections are stored separately
    (models.tip_model init_params) and shard their OUTPUT dim — a contiguous
    column split, so with n_model dividing n_heads every shard owns whole
    heads and attention needs no mid-head regather; ff1 likewise shards its
    output dim; out_proj and ff2 shard their INPUT dim (row-parallel, XLA
    inserts the psum). Everything else replicates — including the tanh-RNN
    head: its recurrence consumes the full hidden state every timestep, so
    sharding w_hh would insert a collective inside a 40-step sequential
    latency-bound loop; at 512x512 the weights are 1 MB and replication is
    the right trade (documented policy, VERDICT r1 #8). With n_model == 1
    this degrades to full replication.
    """
    def spec_for(path: str, leaf) -> P:
        # encoder-layer params live under the top-level "layers" list
        # (paths look like "layers.0.w_q" — no leading dot)
        if "layers" not in path.split("."):
            return P()
        if path.endswith(("w_q", "w_k", "w_v", "ff1.w")):
            return P(None, MODEL_AXIS)
        if path.endswith(("b_q", "b_k", "b_v", "ff1.b")):
            return P(MODEL_AXIS)
        if path.endswith(("out_proj.w", "ff2.w")):
            return P(MODEL_AXIS, None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def path_str(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    specs = [NamedSharding(mesh, spec_for(path_str(kp), leaf))
             for kp, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)
