"""Device-mesh construction and sharding helpers.

Capability parity: /root/reference/vllm/model_executor/parallel_utils/
parallel_state.py (Megatron process groups over NCCL) +
tensor_parallel/layers.py (column/row-parallel layers) — replaced
wholesale by GSPMD: a Mesh with a ``model`` axis + PartitionSpecs on
the parameter pytree. XLA inserts and overlaps the all-reduces the
reference hand-captures in CUDA graphs (parallel_state.py:506-556).

The mesh reserves a ``data`` axis for future multi-slice replicas and
keeps ``model`` innermost so TP collectives ride ICI.
"""

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)

# KV cache payload [L, NB, 2, KVH, BS, D]: shard kv-heads over the
# model axis. The int8/int4 dequant scales [L, NB, 2, TPG, BS, LANES]
# carry an explicit tp-group axis (axis 3, OUTSIDE the trailing tiled
# [BS, LANES] pair — see ops/cache.py kv_scales_shape) that shards
# WITH the payload's heads: group g holds the scales for shard g's kv
# heads in its first KVH/tp lanes, so each shard's local scale page is
# still one lane-aligned DMA and nothing replicates (replicated scales
# would cost as much HBM per shard as the whole sharded int8 payload
# at tp=8).
KV_CACHE_SPEC = P(None, None, None, "model", None, None)
KV_SCALES_SPEC = P(None, None, None, "model", None, None)


# Trace-time mesh context: the executor wraps each step function's
# trace in ``active_mesh(mesh)`` so the attention/cache ops know
# whether (and over what) to shard_map their Pallas kernels. Scoped to
# tracing — nothing leaks across tests or engines.
_ACTIVE_MESH: Optional[Mesh] = None


class active_mesh:

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh
        self.prev: Optional[Mesh] = None

    def __enter__(self):
        global _ACTIVE_MESH
        self.prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self.prev
        return False


def current_tp_mesh() -> Optional[Mesh]:
    """The active mesh when its ``model`` axis is sharded (tp > 1)."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    return mesh


def build_mesh(tensor_parallel_size: int = 1,
               devices: Optional[list] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if tensor_parallel_size > len(devices):
        raise ValueError(
            f"tensor_parallel_size={tensor_parallel_size} exceeds the "
            f"{len(devices)} visible devices.")
    devs = np.array(devices[:tensor_parallel_size]).reshape(
        1, tensor_parallel_size)
    return Mesh(devs, ("data", "model"))


def shard_params(params: Any, shardings: Any, mesh: Mesh) -> Any:
    """device_put every param leaf with its PartitionSpec."""
    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, shardings)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
