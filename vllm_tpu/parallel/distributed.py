"""Multi-host runtime: single-controller engine over multi-process JAX.

Capability parity: the reference's Ray-based driver/worker split
(/root/reference/vllm/engine/ray_utils.py — actor placement;
/root/reference/vllm/worker/worker.py:286-301 — NCCL process groups).
TPU translation: one OS process per host (`jax.distributed.initialize`),
a global `Mesh` spanning every chip, and GSPMD-compiled collectives
over ICI. The Ray RPC role (shipping each step's plan to workers)
becomes a device-mediated broadcast: process 0 runs the scheduler /
tokenizer / HTTP servers and broadcasts the per-step host inputs; every
process then executes the SAME jitted step on its chips. Sampled
tokens come back replicated, so process 0 reads them locally.

Wire protocol per step (two broadcasts):
1. a fixed-size i32 header [kind, payload shapes...] so followers can
   allocate matching buffers (broadcast_one_to_all requires identical
   pytree shapes on all processes);
2. the payload arrays themselves.

Also usable on one machine for testing: N CPU processes over
localhost (tests/test_multihost.py drives a 2-process engine).
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)

# Step kinds on the wire.
STEP_EXECUTE = 1
STEP_SHUTDOWN = 2

_HEADER_LEN = 16


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     tensor_parallel_size: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper (one call per process,
    before any jax device use), with the cluster-shape validation the
    reference does at Ray init (ray_utils.py:49-76): every process must
    contribute the same device count, and the requested parallelism
    must divide evenly across them."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    local = jax.local_device_count()
    total = jax.device_count()
    if total != local * jax.process_count():
        raise RuntimeError(
            f"Uneven cluster: {total} global devices across "
            f"{jax.process_count()} processes with {local} local — every "
            "host must contribute the same number of chips.")
    if tensor_parallel_size is not None:
        if tensor_parallel_size % local != 0:
            raise RuntimeError(
                f"tensor_parallel_size={tensor_parallel_size} must be a "
                f"multiple of the {local} chips per host (KV shards "
                "cannot straddle partial hosts).")
        if tensor_parallel_size > total:
            raise RuntimeError(
                f"tensor_parallel_size={tensor_parallel_size} exceeds the "
                f"{total} devices in the cluster.")
    logger.info("Distributed runtime: process %d/%d, %d local / %d global "
                "devices.", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def is_driver() -> bool:
    import jax
    return jax.process_index() == 0


class PlanChannel:
    """Broadcasts one step's host-built arrays from the driver process
    to all follower processes (device-mediated; rides ICI/DCN)."""

    def __init__(self) -> None:
        from jax.experimental import multihost_utils
        self._bcast = multihost_utils.broadcast_one_to_all

    # -- driver side ---------------------------------------------------------

    def send(self, kind: int, arrays: List[np.ndarray]) -> None:
        header = np.zeros((_HEADER_LEN,), np.int32)
        header[0] = kind
        header[1] = len(arrays)
        # Encode each array's (ndim, shape...) compactly; all payload
        # arrays are i32/f32 — dtype flag per array.
        meta: List[np.ndarray] = []
        for a in arrays:
            assert a.ndim <= 2, "plan arrays are 1-D/2-D"
            meta.append(
                np.array([a.ndim, a.shape[0],
                          a.shape[1] if a.ndim == 2 else 0,
                          0 if a.dtype == np.int32 else 1], np.int32))
        meta_arr = (np.concatenate(meta)
                    if meta else np.zeros((0,), np.int32))
        header[2] = meta_arr.shape[0]
        self._bcast(header)
        if meta_arr.shape[0]:
            self._bcast(meta_arr)
        for a in arrays:
            self._bcast(np.ascontiguousarray(a))

    # -- follower side -------------------------------------------------------

    def recv(self) -> Tuple[int, List[np.ndarray]]:
        header = np.asarray(self._bcast(np.zeros((_HEADER_LEN,), np.int32)))
        kind = int(header[0])
        n = int(header[1])
        meta_len = int(header[2])
        metas = []
        if meta_len:
            meta_arr = np.asarray(
                self._bcast(np.zeros((meta_len,), np.int32)))
            metas = [meta_arr[i * 4:(i + 1) * 4] for i in range(n)]
        arrays = []
        for m in metas:
            ndim, d0, d1, dt = (int(m[0]), int(m[1]), int(m[2]), int(m[3]))
            shape = (d0,) if ndim == 1 else (d0, d1)
            dtype = np.int32 if dt == 0 else np.float32
            arrays.append(np.asarray(self._bcast(np.zeros(shape, dtype))))
        return kind, arrays


def pack_plan(kind_tag: int, named: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Stable ordering for a named array dict + leading tag array."""
    keys = sorted(named)
    order = np.array([kind_tag, len(keys)], np.int32)
    return [order] + [np.ascontiguousarray(named[k]) for k in keys]


def follower_loop(engine_args, tokenizer=None) -> None:
    """Run on every non-driver process: build the identical worker
    (same configs -> same mesh/shardings/compiled programs), then
    execute the steps the driver broadcasts until shutdown.

    The driver's TPUWorker calls into the same PlanChannel from its
    execute hooks (see worker.py `plan_channel`), so compiled programs
    and collectives line up across processes.
    """
    from vllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine.from_engine_args(engine_args, tokenizer=tokenizer)
    worker = engine.worker
    channel = PlanChannel()
    logger.info("Follower ready; waiting for step plans.")
    while True:
        kind, arrays = channel.recv()
        if kind == STEP_SHUTDOWN:
            logger.info("Follower shutting down.")
            return
        worker.execute_broadcast_plan(arrays)
