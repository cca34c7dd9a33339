"""Device mesh construction and sharding rules.

SURVEY §2.4: the reference is a single-host async app; multi-chip scale is a
first-class new subsystem here. Axes:

- `data`: shards the corpus (index rows) and training batches — the scale
  axis of a retrieval engine (corpus size, SURVEY §5 long-context note).
- `model`: tensor parallelism over attention heads / FFN width for the
  UniXcoder encoder (125M params fits one chip; tp exists for large-batch
  embedding throughput and as the generic tp lane).

Pipeline/sequence/expert parallelism are deliberately N/A for this model
family (12-layer encoder, 512-token max sequence, no MoE) — documented
rather than invented, per SURVEY §2.4/§5.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Multi-slice tier: the outermost axis crosses slice boundaries over DCN
# (data-center network, ~25 GB/s/link vs ICI's ~400), so collectives are
# laid out hierarchically — bulk gathers ride ICI inside a slice, only
# k-sized reductions cross DCN (scaling-book recipe: put the slowest
# network on the outermost, least-trafficked axis).
DCN_AXIS = "dcn"


def make_mesh(n_devices: int | None = None,
              model_parallel: int = 1) -> Mesh:
    """Mesh over the first `n_devices` devices, factored (data, model)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if n % model_parallel != 0:
        model_parallel = 1
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(n_slices: int,
                         n_devices: int | None = None) -> Mesh:
    """(dcn, data) mesh: slices outermost, chips-within-slice inner.

    On real multi-slice pods the device list is ordered slice-major (JAX
    guarantees `jax.devices()` groups by slice), so a row-major reshape
    puts same-slice chips on the inner `data` axis where ICI lives. On
    the virtual CPU mesh the same factoring exercises the collective
    structure (tests + dryrun).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % n_slices:
        raise ValueError(f"{n} devices do not factor into {n_slices} slices")
    grid = np.asarray(devices[:n]).reshape(n_slices, n // n_slices)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (corpus rows / batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def param_sharding_rules(path: tuple, value) -> P:
    """Tensor-parallel partition specs for the UniXcoder param tree.

    Megatron-style: qkv/intermediate kernels column-sharded, attention-output
    /FFN-output kernels row-sharded, everything else replicated. XLA GSPMD
    inserts the matching all-reduces.
    """
    keys = [getattr(p, "key", str(p)) for p in path]
    name = "/".join(str(k) for k in keys)
    if value.ndim == 2:
        if any(k in name for k in ("query", "key", "value", "intermediate")) \
                and name.endswith("kernel"):
            return P(None, MODEL_AXIS)
        if "output" in name and name.endswith("kernel"):
            return P(MODEL_AXIS, None)
    if value.ndim == 1 and "intermediate" in name and name.endswith("bias"):
        return P(MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh under the tp rules."""
    def place(path, value):
        spec = param_sharding_rules(path, value)
        return jax.device_put(value, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)
