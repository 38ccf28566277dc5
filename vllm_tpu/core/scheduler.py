"""Iteration-level (continuous-batching) scheduler.

Capability parity: /root/reference/vllm/core/scheduler.py — three
queues (waiting/running/swapped), FCFS priority, per-step slot
reservation with preempt-lowest-priority (RECOMPUTE for single-sequence
groups, SWAP for beam groups), swapped-queue strict priority over
waiting, the never-swap-in-and-out-in-one-step invariant
(scheduler.py:42), copy-on-write pair emission, beam-fork handling in
``update`` (scheduler.py:284-309), and 5-second throughput/usage
logging.

TPU re-design — *typed steps*: the reference builds one mixed batch of
prompt+generation tokens per step (worker.py:128-237); XLA would need a
compiled program per (prompt_tokens, gen_tokens) shape pair, so here a
step is either a PREFILL batch (newly admitted prompts, packed into a
token-bucket program) or a DECODE batch (one token per running
sequence, batch-bucket program). Prompts are admitted with priority
when block space allows; otherwise the step decodes. Prompts longer
than the model/batch budget are finished as IGNORED instead of
deadlocking admission.
"""

import enum
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Tuple

from vllm_tpu.config import CacheConfig, SchedulerConfig
from vllm_tpu.core.block_manager import BlockSpaceManager
from vllm_tpu.core.policy import PolicyFactory
from vllm_tpu.logger import init_logger
from vllm_tpu.sequence import (Sequence, SequenceData, SequenceGroup,
                               SequenceGroupMetadata, SequenceOutputs,
                               SequenceStatus)

logger = init_logger(__name__)

_LOGGING_INTERVAL_SEC = 5.0


class PreemptionMode(enum.Enum):
    # SWAP: move the victim's KV blocks to host DRAM and bring them
    # back later. RECOMPUTE: drop the blocks and re-prefill the victim
    # as a fresh prompt (cheaper; only valid for single-seq groups).
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


class StepKind(enum.Enum):
    PREFILL = enum.auto()
    DECODE = enum.auto()
    EMPTY = enum.auto()


class SchedulerOutputs:
    """Block-movement plan + step type for one engine iteration."""

    def __init__(
        self,
        kind: StepKind,
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        num_batched_tokens: int,
        ignored_seq_groups: Optional[List[SequenceGroup]] = None,
        num_decode_steps: int = 1,
    ) -> None:
        self.kind = kind
        self.blocks_to_swap_in = blocks_to_swap_in
        self.blocks_to_swap_out = blocks_to_swap_out
        self.blocks_to_copy = blocks_to_copy
        self.num_batched_tokens = num_batched_tokens
        self.ignored_seq_groups = ignored_seq_groups or []
        # Decode steps fused into one device program this iteration
        # (tokens feed back on device; the host applies them in order
        # afterwards). No reference analog — it amortizes host/dispatch
        # overhead, which on a tunneled TPU runtime dominates small
        # decode steps.
        self.num_decode_steps = num_decode_steps
        # Swap-in and swap-out must never happen in the same step: the
        # plan would otherwise race on host-buffer slots.
        assert not (blocks_to_swap_in and blocks_to_swap_out)

    def is_empty(self) -> bool:
        return self.kind == StepKind.EMPTY


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        log_stats: bool = True,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.log_stats = log_stats

        self.policy = PolicyFactory.get_policy("fcfs")
        assert cache_config.num_device_blocks is not None
        assert cache_config.num_cpu_blocks is not None
        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_device_blocks=cache_config.num_device_blocks,
            num_cpu_blocks=cache_config.num_cpu_blocks,
            max_blocks_per_seq=-(-scheduler_config.max_model_len //
                                 cache_config.block_size),
        )

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: List[SequenceGroup] = []
        self.swapped: List[SequenceGroup] = []
        # Groups that ran in the most recent schedule() call — the only
        # ones update() may touch (a prefill step runs just the newly
        # admitted groups, not the whole running queue).
        self._last_scheduled: List[SequenceGroup] = []

        self._last_logging_time = 0.0
        self._token_history: List[Tuple[float, int]] = []

    # -- request lifecycle ---------------------------------------------------

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: str) -> None:
        for queue in (self.waiting, self.running, self.swapped):
            for seq_group in queue:
                if seq_group.request_id == request_id:
                    queue.remove(seq_group)
                    for seq in seq_group.seqs:
                        if not seq.is_finished():
                            self.free_seq(seq,
                                          SequenceStatus.FINISHED_ABORTED)
                    return

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    def free_seq(self, seq: Sequence, finish_status: SequenceStatus) -> None:
        seq.status = finish_status
        self.block_manager.free(seq)

    def free_finished_seq_groups(self) -> None:
        self.running = [g for g in self.running if not g.is_finished()]

    # -- the per-step decision -----------------------------------------------

    def schedule(
        self,
    ) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        """Decide this step's batch; mutates queue/block state."""
        outputs, scheduled_groups = self._schedule()
        self._last_scheduled = scheduled_groups

        metadata_list: List[SequenceGroupMetadata] = []
        for seq_group in scheduled_groups:
            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = (
                    self.block_manager.get_block_table(seq))
            metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=outputs.kind == StepKind.PREFILL,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                ))
        self._maybe_log_stats(outputs)
        return metadata_list, outputs

    def _schedule(self) -> Tuple[SchedulerOutputs, List[SequenceGroup]]:
        now = time.time()

        # Swapped groups take strict priority over waiting prompts (to
        # bound host swap-space residency), so prompt admission is only
        # attempted when nothing is swapped out.
        ignored: List[SequenceGroup] = []
        if not self.swapped:
            prefill = self._schedule_prefill(now, ignored)
            if prefill is not None:
                return prefill
        outputs, scheduled = self._schedule_decode(now)
        outputs.ignored_seq_groups.extend(ignored)
        return outputs, scheduled

    def _schedule_prefill(
        self, now: float, ignored: List[SequenceGroup]
    ) -> Optional[Tuple[SchedulerOutputs, List[SequenceGroup]]]:
        """Admit waiting prompts into one packed prefill batch, or
        return None if nothing can be admitted this step. Over-long
        prompts are finished as IGNORED and appended to ``ignored``."""
        cfg = self.scheduler_config
        max_prompt_len = min(cfg.max_model_len, cfg.max_num_batched_tokens)

        admitted: List[SequenceGroup] = []
        num_tokens = 0
        num_curr_seqs = sum(
            g.num_seqs(status=SequenceStatus.RUNNING) for g in self.running)

        while self.waiting:
            seq_group = self.waiting[0]
            prompt_len = seq_group.get_seqs()[0].get_len()

            if prompt_len > max_prompt_len:
                # Can never be scheduled: finish as ignored instead of
                # wedging the head of the FCFS queue forever.
                logger.warning(
                    "Prompt of request %s (%d tokens) exceeds the limit "
                    "of %d tokens; ignoring.", seq_group.request_id,
                    prompt_len, max_prompt_len)
                for seq in seq_group.get_seqs():
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored.append(seq_group)
                self.waiting.popleft()
                continue

            if num_tokens + prompt_len > cfg.max_num_batched_tokens:
                break
            if len(admitted) + 1 > cfg.max_prefill_seqs:
                break
            num_new_seqs = seq_group.num_seqs(status=SequenceStatus.WAITING)
            if num_curr_seqs + num_new_seqs > cfg.max_num_seqs:
                break
            if not self.block_manager.can_allocate(seq_group):
                break

            self.waiting.popleft()
            self.block_manager.allocate(seq_group)
            for seq in seq_group.get_seqs():
                seq.status = SequenceStatus.RUNNING
            self.running.append(seq_group)
            admitted.append(seq_group)
            num_tokens += prompt_len
            num_curr_seqs += num_new_seqs

        if not admitted:
            return None
        outputs = SchedulerOutputs(
            kind=StepKind.PREFILL,
            blocks_to_swap_in={},
            blocks_to_swap_out={},
            blocks_to_copy={},
            num_batched_tokens=num_tokens,
            ignored_seq_groups=list(ignored),
        )
        ignored.clear()
        return outputs, admitted

    def _decode_chunk_steps(self) -> int:
        """How many decode steps this iteration fuses on device.

        Constant (the config value) so exactly ONE decode program
        exists per batch bucket — a variable chunk length would compile
        a program per (bucket, steps) pair, paying tens of seconds
        mid-serving. Sequences that hit max_tokens/EOS/stop inside a
        chunk simply discard the remaining speculative tokens (bounded
        waste: < num_decode_steps tokens per sequence, once).
        Collapsed to 1 when any group needs per-token host bookkeeping
        (beam forks) or per-token penalty state. Swapped groups may
        rejoin this very iteration, so they join the scan."""
        max_steps = self.scheduler_config.num_decode_steps
        if max_steps <= 1:
            return 1
        for group in list(self.running) + list(self.swapped):
            p = group.sampling_params
            if (p.use_beam_search or p.presence_penalty != 0
                    or p.frequency_penalty != 0):
                return 1
        return max_steps

    def _schedule_decode(
        self, now: float
    ) -> Tuple[SchedulerOutputs, List[SequenceGroup]]:
        """Reserve KV slots per running sequence (preempting if out of
        blocks), then swap groups back in if room remains."""
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}

        self.running = self.policy.sort_by_priority(now, self.running)
        num_steps = self._decode_chunk_steps()

        running: List[SequenceGroup] = []
        preempted: List[SequenceGroup] = []
        queue = deque(self.running)
        while queue:
            seq_group = queue.popleft()
            while not self.block_manager.can_append_slot(seq_group,
                                                         num_steps):
                if queue:
                    # Evict the lowest-priority group.
                    victim = queue.pop()
                    self._preempt(victim, blocks_to_swap_out)
                    preempted.append(victim)
                else:
                    # Nothing left to evict but this group itself.
                    self._preempt(seq_group, blocks_to_swap_out)
                    preempted.append(seq_group)
                    break
            else:
                self._append_slot(seq_group, blocks_to_copy, num_steps)
                running.append(seq_group)
        self.running = running

        # Resume swapped groups while room remains — but never in a step
        # that also swapped out.
        self.swapped = self.policy.sort_by_priority(now, self.swapped)
        preempted_ids = {g.request_id for g in preempted}
        while self.swapped and not blocks_to_swap_out:
            seq_group = self.swapped[0]
            if seq_group.request_id in preempted_ids:
                break
            if not self.block_manager.can_swap_in(seq_group):
                break
            num_new_seqs = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
            num_curr_seqs = sum(
                g.num_seqs(status=SequenceStatus.RUNNING)
                for g in self.running)
            if (num_curr_seqs + num_new_seqs
                    > self.scheduler_config.max_num_seqs):
                break

            self.swapped.pop(0)
            mapping = self.block_manager.swap_in(seq_group)
            blocks_to_swap_in.update(mapping)
            for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
                seq.status = SequenceStatus.RUNNING
            self._append_slot(seq_group, blocks_to_copy, num_steps)
            self.running.append(seq_group)

        num_batched_tokens = sum(
            g.num_seqs(status=SequenceStatus.RUNNING) for g in self.running)
        outputs = SchedulerOutputs(
            kind=StepKind.DECODE if self.running else StepKind.EMPTY,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_batched_tokens=num_batched_tokens * num_steps,
            num_decode_steps=num_steps,
        )
        return outputs, list(self.running)

    # -- post-step state update ------------------------------------------------

    def update(
        self,
        seq_outputs: Dict[int, SequenceOutputs],
    ) -> List[SequenceGroup]:
        """Apply one step's sampled tokens; handle beam forks.

        Only the groups scheduled by the latest ``schedule()`` call are
        updated (and returned) — in a prefill step that is just the
        newly admitted groups.
        """
        for seq_group in self._last_scheduled:
            # Beam-search forks first: a slot whose sampled continuation
            # came from a different parent rebinds to the parent's
            # blocks (copy-on-write deferred to the next append_slot).
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                output = seq_outputs[seq.seq_id]
                if seq.seq_id != output.parent_seq_id:
                    self.block_manager.free(seq)
                    parent = seq_group.find(output.parent_seq_id)
                    parent.fork(seq)
                    self.block_manager.fork(parent, seq)
            # Then append the new tokens.
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                output = seq_outputs[seq.seq_id]
                seq.append_token_id(output.output_token, output.logprobs)
        return self._last_scheduled.copy()

    # -- preemption helpers ------------------------------------------------

    def _append_slot(
        self,
        seq_group: SequenceGroup,
        blocks_to_copy: Dict[int, List[int]],
        num_steps: int = 1,
    ) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            cow = self.block_manager.append_slot(seq, num_steps)
            if cow is not None:
                src, dst = cow
                blocks_to_copy.setdefault(src, []).append(dst)

    def _preempt(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
        preemption_mode: Optional[PreemptionMode] = None,
    ) -> None:
        if preemption_mode is None:
            # Recompute is cheaper but only sound for a single sequence
            # (a beam group's shared/CoW block structure can't be
            # reconstructed by re-prefilling).
            if seq_group.num_seqs(status=SequenceStatus.RUNNING) == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        if preemption_mode == PreemptionMode.RECOMPUTE:
            seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
            assert len(seqs) == 1
            for seq in seqs:
                seq.status = SequenceStatus.WAITING
                self.block_manager.free(seq)
            # FCFS: a preempted group resumes at the head of the queue.
            self.waiting.appendleft(seq_group)
        else:
            if not self.block_manager.can_swap_out(seq_group):
                raise RuntimeError(
                    "Not enough host swap space for preemption; increase "
                    "--swap-space.")
            mapping = self.block_manager.swap_out(seq_group)
            blocks_to_swap_out.update(mapping)
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq.status = SequenceStatus.SWAPPED
            self.swapped.append(seq_group)

    # -- stats ---------------------------------------------------------------

    def _maybe_log_stats(self, outputs: SchedulerOutputs) -> None:
        if not self.log_stats:
            return
        now = time.time()
        if outputs.num_batched_tokens > 0:
            self._token_history.append((now, outputs.num_batched_tokens))
        if now - self._last_logging_time < _LOGGING_INTERVAL_SEC:
            return
        self._last_logging_time = now
        self._token_history = [(t, n) for t, n in self._token_history
                               if now - t < _LOGGING_INTERVAL_SEC]
        if len(self._token_history) > 1:
            total = sum(n for _, n in self._token_history[:-1])
            window = now - self._token_history[0][0]
            throughput = total / window if window > 0 else 0.0
        else:
            throughput = 0.0

        stats = self.get_stats()
        logger.info(
            "Throughput: %.1f tokens/s, Running: %d reqs, Swapped: %d reqs, "
            "Waiting: %d reqs, TPU KV cache usage: %.1f%%, "
            "CPU KV cache usage: %.1f%%", throughput, len(self.running),
            len(self.swapped), len(self.waiting),
            stats["device_cache_usage"] * 100, stats["cpu_cache_usage"] * 100)

    def get_stats(self) -> Dict[str, float]:
        total_dev = self.cache_config.num_device_blocks or 1
        used_dev = total_dev - self.block_manager.get_num_free_device_blocks()
        total_cpu = self.cache_config.num_cpu_blocks or 0
        if total_cpu > 0:
            used_cpu = total_cpu - self.block_manager.get_num_free_cpu_blocks()
            cpu_usage = used_cpu / total_cpu
        else:
            cpu_usage = 0.0
        return {
            "device_cache_usage": used_dev / total_dev,
            "cpu_cache_usage": cpu_usage,
            "running": len(self.running),
            "swapped": len(self.swapped),
            "waiting": len(self.waiting),
        }
