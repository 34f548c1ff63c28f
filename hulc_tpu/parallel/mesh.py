"""Device mesh + sharding helpers.

The reference's distributed story is Lightning DDP over NCCL
(training.py:65-69). The TPU-native equivalent (SURVEY.md §2.7): one
``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis; XLA
inserts the psum gradient reduction over ICI. The model (~47M params) is
replicated — no tensor/pipeline sharding needed at this scale, but the
helpers accept any mesh shape so larger variants can add axes.

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); each host feeds its local shard of the
global batch via ``host_local_batch_to_global``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; None-leaves stay None."""
    return NamedSharding(mesh, P(axis_name))


def host_local_batch_to_global(batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble a global batch from this process's local shard (DCN story).

    Each host loads a DISJOINT slice of the global batch (the reference's DDP
    per-rank loading, SURVEY.md §2.7); this stitches the local numpy arrays
    into global ``jax.Array``s sharded over the mesh's data axis without ever
    materializing the full batch on one host
    (``jax.make_array_from_process_local_data``).
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def shard_batch_tree(batch, mesh: Mesh, axis_name: str = "data", seq_axis: Optional[str] = None):
    """Shard every array leaf's leading dim over the data axis.

    Single-process: a plain device_put of the full batch. Multi-process: the
    batch is treated as this host's local shard and stitched into a global
    array via :func:`host_local_batch_to_global` (device_put of a full global
    batch would be wrong — no host holds it).

    seq_axis: sequence parallelism — ADDITIONALLY shard the window/time dim
    (axis 1) of every per-frame leaf (ndim >= 3: images (B,S,H,W,C), depth
    (B,S,H,W), proprio/actions (B,S,F)) over this mesh axis. Per-sequence
    leaves (lang (B, 384), masks (B,)) stay data-sharded only. The dominant
    per-frame conv FLOPs then split over data x seq; GSPMD all-gathers the
    sequence exactly where it rejoins (plan-recognition attention, the
    decoder scan). Single-process only (the DCN path keeps data sharding).
    """
    if jax.process_count() > 1:
        return host_local_batch_to_global(batch, mesh, axis_name)
    sharding = batch_sharding(mesh, axis_name)
    if seq_axis is None:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    n_seq = mesh.shape[seq_axis]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 3 and x.shape[1] % n_seq == 0:
            spec = [None] * x.ndim
            spec[0], spec[1] = axis_name, seq_axis
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def initialize_distributed(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Multi-host init (DCN). No-op when running single-process."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)


# ---------------------------------------------------------------------------
# Optional parameter sharding (FSDP-style)
# ---------------------------------------------------------------------------
#
# The HULC model (~47M params, 188 MB fp32 + 2x adam moments) fits easily in
# one chip's HBM, so the production config replicates params (SURVEY.md
# §2.7). For memory-constrained variants (or much larger models on the same
# skeleton) `fsdp_param_sharding` shards every large parameter along its
# biggest axis over the data mesh axis; XLA all-gathers weights on use and
# reduce-scatters gradients — standard ZeRO-3 behavior from shardings alone.


def fsdp_param_sharding(params, mesh: Mesh, axis_name: str = "data", min_size: int = 2**16):
    """Per-leaf NamedSharding tree: biggest divisible axis sharded over data."""
    n = mesh.shape[axis_name]

    def spec_for(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        # choose the largest axis divisible by the mesh size
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % n == 0:
                spec = [None] * len(shape)
                spec[i] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, axis_name: str = "data", min_size: int = 2**16):
    shardings = fsdp_param_sharding(params, mesh, axis_name, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


def make_mesh_2d(data: int, model: int, second_axis: str = "model") -> Mesh:
    """('data', <second_axis>) mesh for combined data + tensor/sequence
    parallelism.

    The scaling-book recipe: annotate batch over 'data' and weight (tp) or
    window-dim (sp) shards over the second axis, jit the step, and XLA's
    SPMD partitioner inserts the all-gathers/reduce-scatters/psums over ICI.
    """
    devices = jax.devices()
    need = data * model
    if len(devices) < need:
        raise ValueError(f"mesh {data}x{model} needs {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(data, model), ("data", second_axis))


def tp_param_sharding(
    params,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: Optional[str] = None,
    min_size: int = 2**16,
):
    """Tensor-parallel weight partitioning (Megatron column-parallel style).

    Matrix kernels shard their OUTPUT (last) dim over the model axis; the
    matching biases follow; conv kernels shard the output-channel dim.
    Activations are left unannotated — GSPMD propagates feature-dim shardings
    through matmul -> elementwise -> matmul chains and inserts the collectives
    (this is deliberate: hand-placing psums is the NCCL mindset, not the XLA
    one). With ``data_axis`` set, the remaining largest divisible dim is
    additionally ZeRO-sharded over data (tp + fsdp).

    The reference has no model-parallel story at all (DDP only,
    training.py:65-69); HULC's 47M params fit replicated — this exists for
    the larger variants (CLIP towers) and as the framework's scaling path.
    """
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis] if data_axis else 1

    def spec_for(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        if shape[-1] % n_model == 0:
            spec[-1] = model_axis
        if data_axis:
            order = sorted(range(len(shape) - 1), key=lambda i: -shape[i])
            for i in order:
                if shape[i] % n_data == 0:
                    spec[i] = data_axis
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)
