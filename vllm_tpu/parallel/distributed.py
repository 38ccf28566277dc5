"""Multi-host runtime: single-controller engine over multi-process JAX.

Capability parity: the reference's Ray-based driver/worker split
(/root/reference/vllm/engine/ray_utils.py — actor placement;
/root/reference/vllm/worker/worker.py:286-301 — NCCL process groups).
TPU translation: one OS process per host (`jax.distributed.initialize`),
a global `Mesh` spanning every chip, and GSPMD-compiled collectives
over ICI. The Ray RPC role (shipping each step's plan to workers,
one message per worker per step — reference llm_engine.py:281-308)
maps onto the JAX coordination service's key-value store: process 0
(the driver, which also hosts the coordination service) publishes each
step's packed plan under a monotonically increasing key and every
follower blocking-reads it. This is a pure HOST-side channel:

- ONE message per step (the round-2 design paid N+2 device-mediated
  `broadcast_one_to_all` round trips per step);
- the driver's `key_value_set_bytes` is a localhost RPC to its own
  coordination service (~0.8 ms measured at 1 KB, ~3 ms at 256 KB) and
  never blocks on followers — the driver's async (one-step-lagged)
  pipeline keeps running;
- no device work: plan shipping doesn't contend with step programs
  for chips or ICI (the old broadcasts compiled a psum per call).

Followers fall behind at most a couple of steps — their chips
participate in the driver program's collectives, so the driver's
one-step-lagged fetch can't complete until every follower has
dispatched the same program. A 256-key retention window is therefore
hugely conservative.

Also usable on one machine for testing: N CPU processes over
localhost (tests/test_multihost.py drives a 2-process engine).
"""

import time
import zlib
from typing import Any, List, Optional, Tuple

import numpy as np

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)

# Step kinds on the wire.
STEP_EXECUTE = 1
STEP_SHUTDOWN = 2

_DTYPES = (np.dtype(np.int32), np.dtype(np.float32), np.dtype(np.bool_))
_DTYPE_CODE = {dt: i for i, dt in enumerate(_DTYPES)}


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


# One channel per engine build per process (the worker constructs it;
# follower_loop reuses the worker's). Coordination-service keys are
# WRITE-ONCE (key_value_set_bytes raises ALREADY_EXISTS on reuse), so
# each channel namespaces its keys by a per-process epoch counter:
# every process builds engines in the same order (same script), so
# epoch e on the driver pairs with epoch e on every follower, a second
# engine in the same cluster session starts at a fresh prefix instead
# of colliding with (or replaying) the first engine's keys, and no
# cleanup-on-shutdown protocol is needed.
_CHANNEL_EPOCH = [0]


class PlanChannel:
    """Ships one step's host-built plan arrays from the driver process
    to all follower processes through the coordination-service KV
    store — one message per step, host-side only (see module doc)."""

    # Keys kept behind the newest; followers trail by at most the
    # driver's dispatch-ahead depth (~2 steps), so this is a safety
    # margin, not a tuning knob. 256 × ~10 KB compressed plans ≈ a few
    # MB of coordinator memory.
    _RETAIN = 256
    _POLL_MS = 60_000  # per-wait timeout; recv loops while idle

    def __init__(self) -> None:
        from jax._src import distributed
        client = distributed.global_state.client
        if client is None:
            raise RuntimeError(
                "PlanChannel needs jax.distributed.initialize (the "
                "coordination-service client is missing).")
        self._client = client
        self._prefix = f"vllm_tpu/plan/e{_CHANNEL_EPOCH[0]}/"
        _CHANNEL_EPOCH[0] += 1
        self._seq = 0
        # Driver-side instrumentation (scaling-efficiency evidence):
        # cumulative serialize+publish time and raw/wire bytes.
        self.sends = 0
        self.send_s = 0.0
        self.raw_bytes = 0
        self.wire_bytes = 0

    # -- driver side ---------------------------------------------------------

    def send(self, kind: int, arrays: List[np.ndarray]) -> None:
        t0 = time.perf_counter()
        raw = self._pack(kind, arrays)
        # Level-1 zlib: the plans are mostly bucket padding (PAD_SLOT /
        # PAD_TOKEN runs) and compress 10-50x for ~0.1 ms — keeps the
        # wire message well under the KV store's fast-path size (~3 ms
        # at 256 KB measured, a cliff past ~1 MB).
        payload = zlib.compress(raw, 1)
        self._client.key_value_set_bytes(self._prefix + str(self._seq),
                                         payload)
        if self._seq >= self._RETAIN:
            self._client.key_value_delete(
                self._prefix + str(self._seq - self._RETAIN))
        self._seq += 1
        self.sends += 1
        self.send_s += time.perf_counter() - t0
        self.raw_bytes += len(raw)
        self.wire_bytes += len(payload)

    # -- follower side -------------------------------------------------------

    def recv(self) -> Tuple[int, List[np.ndarray]]:
        key = self._prefix + str(self._seq)
        while True:
            try:
                payload = self._client.blocking_key_value_get_bytes(
                    key, self._POLL_MS)
                break
            except Exception as e:  # idle engine: wait again
                if "DEADLINE" in str(e).upper():
                    continue
                raise
        self._seq += 1
        return self._unpack(zlib.decompress(payload))

    # -- wire format ---------------------------------------------------------
    # i32 header_len | i32 header [kind, n, (dtype, ndim, shape...)*n]
    # | raw array bytes, concatenated.

    @staticmethod
    def _pack(kind: int, arrays: List[np.ndarray]) -> bytes:
        header: List[int] = [kind, len(arrays)]
        blobs: List[bytes] = []
        for a in arrays:
            a = np.ascontiguousarray(a)
            header.extend([_DTYPE_CODE[a.dtype], a.ndim])
            header.extend(int(d) for d in a.shape)
            blobs.append(a.tobytes())
        head = np.asarray(header, np.int32).tobytes()
        return (np.int32(len(head)).tobytes() + head + b"".join(blobs))

    @staticmethod
    def _unpack(raw: bytes) -> Tuple[int, List[np.ndarray]]:
        hlen = int(np.frombuffer(raw[:4], np.int32)[0])
        head = np.frombuffer(raw[4:4 + hlen], np.int32)
        kind, n = int(head[0]), int(head[1])
        arrays: List[np.ndarray] = []
        i, off = 2, 4 + hlen
        for _ in range(n):
            dt = _DTYPES[int(head[i])]
            ndim = int(head[i + 1])
            shape = tuple(int(d) for d in head[i + 2:i + 2 + ndim])
            i += 2 + ndim
            nbytes = dt.itemsize * int(np.prod(shape, dtype=np.int64))
            arrays.append(
                np.frombuffer(raw[off:off + nbytes],
                              dt).reshape(shape).copy())
            off += nbytes
        return kind, arrays

    def stats(self) -> dict:
        """Driver-side channel overhead (per-step cost the follower
        path adds on the driver's critical host path)."""
        return {
            "sends": self.sends,
            "send_ms_avg": (1e3 * self.send_s / self.sends
                            if self.sends else 0.0),
            "raw_kb_avg": (self.raw_bytes / 1024 / self.sends
                           if self.sends else 0.0),
            "wire_kb_avg": (self.wire_bytes / 1024 / self.sends
                            if self.sends else 0.0),
        }


def follower_loop(engine_args, tokenizer=None) -> None:
    """Run on every non-driver process: build the identical worker
    (same configs -> same mesh/shardings/compiled programs), then
    execute the steps the driver broadcasts until shutdown.

    The driver's TPUWorker publishes into the same PlanChannel from its
    execute hooks (see worker.py `_broadcast_plan`), so compiled
    programs and collectives line up across processes. The async token
    feed replays too: each plan carries the feed-patch indices and
    feed-record rows, and every process records its own (replicated)
    next-token device array from its own step outputs — no extra
    traffic (worker.py `_exec_mixed`/`_exec_decode`).
    """
    from vllm_tpu.engine.llm_engine import LLMEngine

    engine = LLMEngine.from_engine_args(engine_args, tokenizer=tokenizer)
    worker = engine.worker
    # Reuse the worker's channel (same epoch as the driver's worker
    # built in this engine-build round — see _CHANNEL_EPOCH).
    channel = worker._plan_channel or PlanChannel()
    logger.info("Follower ready; waiting for step plans.")
    while True:
        kind, arrays = channel.recv()
        if kind == STEP_SHUTDOWN:
            logger.info("Follower shutting down.")
            return
        worker.execute_broadcast_plan(arrays)
