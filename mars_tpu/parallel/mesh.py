"""Device mesh + sharding rules.

The reference has NO distributed execution in its live path (SURVEY §2.5);
its vendored torch.distributed/FSDP stack is unused.  The TPU-native scaling
design (this module):

  - **data axis**: episode parallelism — each chip processes whole episodes
    (the natural unit: per-episode state never crosses chips, collectives
    only aggregate metrics).  This is the primary axis; episode batches are
    sharded over it with NamedSharding.
  - **model axis**: tensor parallelism for the big frozen towers — packed
    qkv/fc1 kernels shard their OUTPUT features, proj/fc2 shard their INPUT
    features, so each attention/MLP block needs exactly one psum, inserted
    automatically by GSPMD from the parameter shardings.
  - pipeline/sequence/expert parallelism: consciously out of scope — max
    sequence is 1374 tokens and there is no MoE (SURVEY §5.7).

Collectives ride ICI within a slice; multi-slice episode farming over DCN
needs no code changes (the data axis spans slices).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# parameter-name suffixes whose kernels shard over the model axis:
# output-feature sharding for the "expanding" matmuls, input-feature for the
# "contracting" ones — one all-reduce per block.  q/k/v + gate/up expand,
# o/down contract (the LLaMA decoder in models/vip_llava.py); qkv/fc1 and
# proj/fc2 are the ViT tower names.
_OUT_SHARDED = ("qkv", "fc1", "q", "k", "v", "gate", "up")
_IN_SHARDED = ("proj", "fc2", "out", "o", "down")


def _q4_kernel_paths(params) -> frozenset:
    """Name-paths of quantized kernel dicts holding a packed-int4 'q4' leaf.

    Their sibling 'scale' must stay replicated to match the replicated q4
    weight (the Pallas int4 matmul is not GSPMD-partitionable); sharding
    only the scale would force a reshard in the matmul epilogue."""
    paths = set()

    def visit(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                      for k in path)
        if names and names[-1] == "q4":
            paths.add(names[:-1])
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return frozenset(paths)


def _spec_for(path, arr, n_model: int, q4_kernels: frozenset = frozenset()) -> P:
    if n_model <= 1 or arr.ndim == 0:
        return P()
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if (leaf == "q" and parent == "kernel" and arr.ndim == 2
            and len(names) >= 3):
        # weight-only-quantized int8 leaf (models/quantization.py): shards
        # like the kernel it replaced.  Packed-int4 ("q4") stays replicated:
        # its Pallas matmul is not GSPMD-partitionable.
        owner = names[-3]
        if owner in _OUT_SHARDED and arr.shape[1] % n_model == 0:
            return P(None, "model")
        if owner in _IN_SHARDED and arr.shape[0] % n_model == 0:
            return P("model", None)
        return P()
    if (leaf == "scale" and parent == "kernel" and len(names) >= 3
            and names[-3] in _OUT_SHARDED and arr.shape[-1] % n_model == 0
            and tuple(names[:-1]) not in q4_kernels):
        return P("model")
    if leaf == "kernel" and arr.ndim == 2:
        if parent in _OUT_SHARDED and arr.shape[1] % n_model == 0:
            return P(None, "model")
        if parent in _IN_SHARDED and arr.shape[0] % n_model == 0:
            return P("model", None)
    if leaf == "bias" and parent in _OUT_SHARDED and arr.shape[-1] % n_model == 0:
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree: tensor-parallel big kernels, replicate the rest."""
    n_model = mesh.shape["model"]
    q4 = _q4_kernel_paths(params)

    def place(path, arr):
        spec = _spec_for(path, arr, n_model, q4)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedShardings (for jit in_shardings) matching shard_params."""
    n_model = mesh.shape["model"]
    q4 = _q4_kernel_paths(params)
    return jax.tree_util.tree_map_with_path(
        lambda path, arr: NamedSharding(mesh, _spec_for(path, arr, n_model, q4)),
        params,
    )


def data_sharding(mesh: Mesh, *batch_dims) -> NamedSharding:
    """Shard the leading (episode/batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
