"""Async wrapper around LLMEngine for online serving.

Capability parity: /root/reference/vllm/engine/async_llm_engine.py —
per-request output streams, `generate()` as an async generator,
`abort()` on client disconnect, request logging. The reference kicks
`engine_step` cooperatively from whichever request coroutine notices
the engine idle (async_llm_engine.py:120-129, with a 1 s anti-deadlock
timeout); here a single background task owns the engine and steps
while work exists, with the device-bound `step()` running in a worker
thread so tokenization/HTTP streaming overlap TPU time. The
`engine_use_ray` flag is accepted for CLI parity and ignored (the TPU
engine is single-controller; there is no Ray).
"""

import asyncio
import time
from typing import AsyncIterator, Dict, List, Optional, Set, Tuple

from vllm_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.logger import init_logger
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


class AsyncStream:
    """Per-request stream of RequestOutputs, consumed by one client."""

    def __init__(self, request_id: str) -> None:
        self.request_id = request_id
        self._queue: asyncio.Queue = asyncio.Queue()
        self._finished = False

    def put(self, item) -> None:
        if self._finished:
            return
        self._queue.put_nowait(item)

    def finish(self) -> None:
        self._finished = True
        self._queue.put_nowait(StopAsyncIteration())

    @property
    def finished(self) -> bool:
        return self._finished

    def __aiter__(self):
        return self

    async def __anext__(self) -> RequestOutput:
        result = await self._queue.get()
        if isinstance(result, StopAsyncIteration):
            raise result
        if isinstance(result, Exception):
            raise result
        return result


class AsyncLLMEngine:
    """Serving engine: add requests from any coroutine, stream outputs.

    All scheduler state is touched only by the background step loop
    (running on the event loop); new requests and aborts are staged in
    queues it drains between steps, so the blocking `step()` can run in
    a thread without locking.
    """

    def __init__(self, engine: LLMEngine, *, log_requests: bool = True,
                 max_log_len: Optional[int] = None) -> None:
        self.engine = engine
        self.log_requests = log_requests
        self.max_log_len = max_log_len
        self._streams: Dict[str, AsyncStream] = {}
        self._new_requests: List[Tuple[str, Optional[str], SamplingParams,
                                       Optional[List[int]], float]] = []
        self._aborts: Set[str] = set()
        self._work_event = asyncio.Event()
        self._loop_task: Optional[asyncio.Task] = None
        self._errored = False

    @classmethod
    def from_engine_args(cls, engine_args: AsyncEngineArgs,
                         tokenizer=None) -> "AsyncLLMEngine":
        engine = LLMEngine.from_engine_args(engine_args, tokenizer=tokenizer)
        return cls(engine,
                   log_requests=not engine_args.disable_log_requests,
                   max_log_len=engine_args.max_log_len)

    # -- public API ----------------------------------------------------------

    async def generate(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        request_id: str,
        prompt_token_ids: Optional[List[int]] = None,
    ) -> AsyncIterator[RequestOutput]:
        """Yields RequestOutputs as tokens arrive; the last has
        `finished=True`. Cancellation (client disconnect) aborts the
        request in the scheduler."""
        if self.log_requests:
            shown = prompt
            if shown is not None and self.max_log_len is not None:
                shown = shown[:self.max_log_len]
            logger.info("Received request %s: prompt=%r, params=%s",
                        request_id, shown, sampling_params)
        if request_id in self._streams:
            raise KeyError(f"Request {request_id} already exists.")

        stream = AsyncStream(request_id)
        self._streams[request_id] = stream
        self._new_requests.append(
            (request_id, prompt, sampling_params, prompt_token_ids,
             time.time()))
        self._ensure_loop()
        self._work_event.set()

        try:
            async for output in stream:
                yield output
        finally:
            if not stream.finished:
                await self.abort(request_id)

    async def abort(self, request_id: str) -> None:
        if request_id not in self._streams:
            return
        if self.log_requests:
            logger.info("Aborted request %s.", request_id)
        self._aborts.add(request_id)
        stream = self._streams.pop(request_id, None)
        if stream is not None:
            stream.finish()
        self._work_event.set()

    def has_unfinished_requests(self) -> bool:
        return (bool(self._new_requests)
                or self.engine.has_unfinished_requests())

    @property
    def is_running(self) -> bool:
        return self._loop_task is not None and not self._loop_task.done()

    # -- background step loop --------------------------------------------------

    def _ensure_loop(self) -> None:
        if self._loop_task is None or self._loop_task.done():
            self._loop_task = asyncio.get_running_loop().create_task(
                self._run_loop())

    def _drain_staged(self) -> None:
        new_requests, self._new_requests = self._new_requests, []
        for rid, prompt, params, token_ids, arrival in new_requests:
            if rid in self._aborts:
                continue
            try:
                self.engine.add_request(rid, prompt, params,
                                        prompt_token_ids=token_ids,
                                        arrival_time=arrival)
            except Exception as e:
                stream = self._streams.pop(rid, None)
                if stream is not None:
                    stream.put(e)
                    stream.finish()
        aborts, self._aborts = self._aborts, set()
        for rid in aborts:
            self.engine.abort_request(rid)

    async def _run_loop(self) -> None:
        try:
            while True:
                if not (self._new_requests or self._aborts
                        or self.engine.has_unfinished_requests()):
                    self._work_event.clear()
                    await self._work_event.wait()
                self._drain_staged()
                if not self.engine.has_unfinished_requests():
                    continue
                outputs = await asyncio.to_thread(self.engine.step)
                for output in outputs:
                    stream = self._streams.get(output.request_id)
                    if stream is None:
                        continue
                    stream.put(output)
                    if output.finished:
                        del self._streams[output.request_id]
                        stream.finish()
                # Yield so waiting coroutines consume before the next step.
                await asyncio.sleep(0)
        except Exception as e:  # engine died: fail all open streams
            self._errored = True
            logger.exception("Engine step loop died: %s", e)
            for stream in self._streams.values():
                stream.put(e)
                stream.finish()
            self._streams.clear()
            raise
