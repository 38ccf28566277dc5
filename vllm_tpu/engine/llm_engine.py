"""The serving engine: request intake -> scheduler -> executor -> outputs.

Capability parity: /root/reference/vllm/engine/llm_engine.py —
construction (tokenizer, workers, memory profile -> block counts,
scheduler, llm_engine.py:42-127), add_request tokenize + best_of
sequences (:143-183), and the step loop (:201-308): schedule, execute,
apply sampled tokens, incremental detokenize, stop-string /
max-tokens / EOS checks, RequestOutput assembly.

TPU re-design: one in-process TPUWorker drives the whole mesh (no Ray
actor fan-out / result-equality assertions, :281-308), and a step is a
typed PREFILL/DECODE program rather than a mixed batch.
"""

import time
from typing import Any, List, Optional

from vllm_tpu.config import (CacheConfig, ModelConfig, ParallelConfig,
                             SchedulerConfig)
from vllm_tpu.core.scheduler import Scheduler
from vllm_tpu.engine.arg_utils import EngineArgs
from vllm_tpu.engine.tokenizer_utils import (detokenize_incrementally,
                                             get_tokenizer)
from vllm_tpu.logger import init_logger
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_tpu.utils import Counter
from vllm_tpu.worker.worker import TPUWorker

logger = init_logger(__name__)


class LLMEngine:
    """Synchronous engine for offline batched generation; AsyncLLMEngine
    wraps it for serving."""

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        log_stats: bool = True,
        tokenizer: Any = None,
        precompile: bool = False,
        profile_dir: Optional[str] = None,
        async_scheduling: bool = True,
    ) -> None:
        logger.info(
            "Initializing engine: model=%r, dtype=%s, kv_cache=%s, "
            "tp=%d, block_size=%d, max_model_len=%d",
            model_config.model, model_config.dtype,
            cache_config.kv_cache_dtype,
            parallel_config.tensor_parallel_size, cache_config.block_size,
            scheduler_config.max_model_len)
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.log_stats = log_stats

        self.tokenizer = tokenizer if tokenizer is not None else get_tokenizer(
            model_config.tokenizer, model_config.tokenizer_mode)
        self.seq_counter = Counter()

        self.worker = TPUWorker(model_config, cache_config, parallel_config,
                                scheduler_config)
        num_device, num_cpu = self.worker.profile_num_available_blocks()
        cache_config.num_device_blocks = num_device
        cache_config.num_cpu_blocks = num_cpu
        self.worker.init_cache()
        if precompile:
            self.worker.precompile()

        self.scheduler = Scheduler(scheduler_config, cache_config, log_stats)
        self.profile_dir = profile_dir
        self._profiling = False
        # Async (one-step-lagged) scheduling: dispatch iteration N+1
        # before fetching N's results, overlapping ALL host work
        # (apply, detokenize, stop checks, next schedule + dispatch)
        # with device execution. Works multi-host too: plans carry the
        # token-feed patch indices and record selectors, and every
        # process replays the feed from its own replicated outputs
        # (worker.py _patch_tokens/_record_feed). Falls back to
        # synchronous when beam/penalty requests are present (their
        # host bookkeeping / count state needs last step's values).
        self.async_scheduling = async_scheduling
        # (metadata_list, sched_out, worker handle) of the dispatched,
        # not-yet-applied iteration.
        self._inflight: Optional[Tuple[Any, Any, Any]] = None
        # Per-step-kind wall-clock accounting (SURVEY §5 tracing row):
        # device+dispatch time vs host bookkeeping time per iteration.
        self.perf = {
            k: {"steps": 0, "exec_s": 0.0, "host_s": 0.0, "sched_s": 0.0,
                "prompt_tokens": 0, "decode_tokens": 0}
            for k in ("MIXED", "DECODE", "EMPTY")
        }

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs,
                         tokenizer: Any = None) -> "LLMEngine":
        configs = engine_args.create_engine_configs()
        return cls(*configs,
                   log_stats=not engine_args.disable_log_stats,
                   tokenizer=tokenizer,
                   precompile=engine_args.precompile,
                   profile_dir=engine_args.profile_dir,
                   async_scheduling=engine_args.async_scheduling)

    # -- profiling (SURVEY §5 tracing; no reference analog beyond
    # benchmark_latency.py's cudaProfilerStart bracket) -------------------

    def start_profile(self) -> None:
        """Begin a jax.profiler trace (view with TensorBoard)."""
        if self.profile_dir is None:
            raise ValueError("Engine was built without profile_dir")
        if not self._profiling:
            import jax
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            logger.info("Profiling to %s", self.profile_dir)

    def stop_profile(self) -> None:
        if self._profiling:
            import jax
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("Profile trace written to %s", self.profile_dir)

    # -- request lifecycle ---------------------------------------------------

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
    ) -> None:
        if arrival_time is None:
            arrival_time = time.time()
        if prompt_token_ids is None:
            assert prompt is not None
            prompt_token_ids = self.tokenizer.encode(prompt)
        if len(prompt_token_ids) == 0:
            # A zero-length prompt has no last position to sample from
            # (the prefill packer's logits index would be row -1).
            raise ValueError("prompt must contain at least one token")
        if (sampling_params.prompt_logprobs is not None
                and not self.scheduler_config.enable_prompt_logprobs):
            raise ValueError(
                "prompt_logprobs requests are disabled on this engine "
                "(started with --disable-prompt-logprobs).")
        if sampling_params.best_of > 1 and not self.worker.swap_enabled:
            # Multi-seq groups can only be preempted by SWAP (their
            # shared/CoW block structure can't be re-prefetched by
            # recompute); without host swap space a preemption would
            # kill the step loop mid-serving, so reject up front.
            raise ValueError(
                "best_of > 1 / beam search requires host swap space, "
                "which is disabled in this deployment (multi-host, or "
                "swap_space=0).")

        block_size = self.cache_config.block_size
        seqs = [
            Sequence(next(self.seq_counter), prompt, prompt_token_ids,
                     block_size) for _ in range(sampling_params.best_of)
        ]
        seq_group = SequenceGroup(request_id, seqs, sampling_params,
                                  arrival_time)
        self.scheduler.add_seq_group(seq_group)

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort_seq_group(request_id)

    def shutdown(self) -> None:
        """Release follower processes (multi-host); no-op single-host."""
        self.worker.shutdown_followers()

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    # -- the iteration -------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        """One engine iteration.

        Synchronous mode: schedule, run the device program, apply
        outputs, detokenize, check stops. Async mode: schedule and
        DISPATCH this iteration, then apply the PREVIOUS iteration's
        results while the device runs — host work and the runtime's
        result-poll latency disappear behind device execution. Outputs
        therefore lag one iteration in async mode.
        """
        t0 = time.perf_counter()
        pipeline = self.async_scheduling and not self._pipeline_blockers()
        outputs: List[RequestOutput] = []
        if self._inflight is not None and not pipeline:
            outputs += self._apply_inflight()

        metadata_list, sched_out = self.scheduler.schedule()
        has_work = (metadata_list or sched_out.blocks_to_swap_in
                    or sched_out.blocks_to_swap_out
                    or sched_out.blocks_to_copy)
        t1 = time.perf_counter()
        if has_work:
            handle = self.worker.dispatch_step(metadata_list, sched_out)
            self._mark_pending(metadata_list, sched_out)
            prev = self._inflight
            self._inflight = (metadata_list, sched_out, handle,
                              time.perf_counter() - t1, t1 - t0)
            if prev is not None:
                outputs += self._apply(prev)
            if not pipeline:
                outputs += self._apply_inflight()
        elif self._inflight is not None:
            outputs += self._apply_inflight()

        outputs += [
            RequestOutput.from_seq_group(g)
            for g in sched_out.ignored_seq_groups
        ]
        return outputs

    def _pipeline_blockers(self) -> bool:
        """Sampling modes whose host bookkeeping needs each token
        before the next step can be scheduled."""
        for queue in (self.scheduler.running, self.scheduler.swapped,
                      self.scheduler.waiting):
            for group in queue:
                p = group.sampling_params
                if (p.use_beam_search or p.presence_penalty != 0
                        or p.frequency_penalty != 0):
                    return True
        return False

    @staticmethod
    def _step_tokens(md, sched_out) -> int:
        """Tokens one dispatched iteration produces for ``md``'s seqs."""
        return (1 if (md.is_prompt or md.sampling_params.use_beam_search)
                else sched_out.num_decode_steps)

    def _mark_pending(self, metadata_list, sched_out) -> None:
        for md in metadata_list:
            steps = self._step_tokens(md, sched_out)
            for data in md.seq_data.values():
                data.pending_tokens += steps

    def _apply_inflight(self) -> List[RequestOutput]:
        prev, self._inflight = self._inflight, None
        return self._apply(prev) if prev is not None else []

    def _apply(self, inflight) -> List[RequestOutput]:
        metadata_list, sched_out, handle, dispatch_s, sched_s = inflight
        t2 = time.perf_counter()
        step_outputs = self.worker.fetch_step(handle)
        t3 = time.perf_counter()
        for md in metadata_list:
            steps = self._step_tokens(md, sched_out)
            for data in md.seq_data.values():
                data.pending_tokens = max(0, data.pending_tokens - steps)

        # A decode chunk carries num_decode_steps token sets; apply them
        # in order, re-checking stop conditions between sets so finished
        # sequences ignore their remaining (speculatively computed)
        # tokens. Beam groups only appear in the first set (they run
        # single-step beside the chunk), so collect the union of
        # updated groups across sets.
        seen_groups: dict = {}
        for seq_outputs in step_outputs:
            for seq_group in self.scheduler.update(
                    seq_outputs, sched_out.scheduled_groups):
                self._decode_sequences(seq_group)
                self._stop_sequences(seq_group)
                seen_groups[id(seq_group)] = seq_group
        self.scheduler.free_finished_seq_groups()

        request_outputs = [
            RequestOutput.from_seq_group(g)
            for g in seen_groups.values()
        ]
        p = self.perf[sched_out.kind.name]
        p["steps"] += 1
        p["sched_s"] += sched_s
        p["exec_s"] += dispatch_s + (t3 - t2)
        p["host_s"] += time.perf_counter() - t3
        # Per-row actual steps: beam groups run single-step beside a
        # chunk, so counting every non-prompt row at num_decode_steps
        # would overcount them (and push prompt_tokens negative).
        dec_tokens = sum(
            len(md.seq_data) * self._step_tokens(md, sched_out)
            for md in metadata_list if not md.is_prompt)
        p["decode_tokens"] += dec_tokens
        p["prompt_tokens"] += sched_out.num_batched_tokens - dec_tokens
        return request_outputs

    # -- detokenization + stopping --------------------------------------------

    def _decode_sequences(self, seq_group: SequenceGroup) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            if seq.prev_tokens is None:
                seq.prev_tokens = []
            new_token, new_text = detokenize_incrementally(
                self.tokenizer, seq.prev_tokens, seq.get_last_token_id(),
                skip_special_tokens=True)
            if new_token is not None:
                seq.prev_tokens.append(new_token)
                seq.output_text = new_text

    def _stop_sequences(self, seq_group: SequenceGroup) -> None:
        params = seq_group.sampling_params
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            stopped = False
            for stop_str in params.stop:
                if seq.output_text.endswith(stop_str):
                    # Cut the stop string out of the visible text.
                    seq.output_text = seq.output_text[:-len(stop_str)]
                    self.scheduler.free_seq(seq,
                                            SequenceStatus.FINISHED_STOPPED)
                    stopped = True
                    break
            if stopped:
                continue
            if (not params.ignore_eos and getattr(
                    self.tokenizer, "eos_token_id", None) is not None
                    and seq.get_last_token_id() == self.tokenizer.eos_token_id):
                self.scheduler.free_seq(seq, SequenceStatus.FINISHED_STOPPED)
                continue
            if seq.get_len() >= self.scheduler_config.max_model_len:
                self.scheduler.free_seq(
                    seq, SequenceStatus.FINISHED_LENGTH_CAPPED)
                continue
            if seq.get_output_len() >= params.max_tokens:
                self.scheduler.free_seq(
                    seq, SequenceStatus.FINISHED_LENGTH_CAPPED)
