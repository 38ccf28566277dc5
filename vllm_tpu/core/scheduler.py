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
    # MIXED: newly admitted prompts packed into the prefill part of the
    # fused program, with every already-running sequence decoding one
    # token in the same program (the decode part may be empty at
    # startup). DECODE: no admission this step; running sequences decode
    # a multi-step chunk.
    MIXED = enum.auto()
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
        # Filled by Scheduler.schedule (async scheduling passes these
        # back to update()).
        self.scheduled_groups: List[SequenceGroup] = []
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
        self._last_admit_time = 0.0
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
        self._last_scheduled = [g for g, _ in scheduled_groups]
        # Async scheduling dispatches the NEXT step before applying
        # this one's outputs, so the engine passes these groups back to
        # update() explicitly instead of relying on _last_scheduled.
        outputs.scheduled_groups = self._last_scheduled

        metadata_list: List[SequenceGroupMetadata] = []
        for seq_group, is_prompt in scheduled_groups:
            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = (
                    self.block_manager.get_block_table(seq))
            metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=is_prompt,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                ))
        self._maybe_log_stats(outputs)
        return metadata_list, outputs

    def _schedule(
        self
    ) -> Tuple[SchedulerOutputs, List[Tuple[SequenceGroup, bool]]]:
        """One iteration's plan. Decode slots are reserved for every
        running sequence FIRST (possibly preempting); waiting prompts
        are then admitted into the same step's prefill part (a MIXED
        step) — running sequences never stall behind prompt admission,
        matching the reference's mixed prompt+generation batches
        (worker.py:128-237) in bucketed form.

        Swapped groups take strict priority over waiting prompts (to
        bound host swap-space residency), so admission is only
        attempted when nothing is swapped out, and skipped when this
        step preempted (blocks are scarce).
        """
        now = time.time()
        ignored: List[SequenceGroup] = []

        # Probe admission up front: a prefill this step forces the
        # decode part to a single step (one fused program), so only
        # give up the multi-step chunk when the head prompt will
        # actually be admitted — and admission itself is hysteretic
        # (see SchedulerConfig.admit_min_free_slots).
        want_prefill = not self.swapped and self._should_admit(now, ignored)
        num_steps = 1 if want_prefill else self._decode_chunk_steps()

        (blocks_to_swap_in, blocks_to_swap_out, blocks_to_copy,
         decode_groups, preempted) = self._schedule_decode(now, num_steps)

        admitted: List[SequenceGroup] = []
        num_prompt_tokens = 0
        if want_prefill and not preempted:
            admitted, num_prompt_tokens = self._admit_prompts(ignored)

        if admitted:
            kind = StepKind.MIXED
        elif decode_groups:
            kind = StepKind.DECODE
        else:
            kind = StepKind.EMPTY
        outputs = SchedulerOutputs(
            kind=kind,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_batched_tokens=(num_prompt_tokens + sum(
                g.num_seqs(status=SequenceStatus.RUNNING) *
                self._group_steps(g, num_steps) for g in decode_groups)),
            ignored_seq_groups=ignored,
            num_decode_steps=num_steps,
        )
        scheduled = ([(g, True) for g in admitted] +
                     [(g, False) for g in decode_groups])
        return outputs, scheduled

    def _max_prompt_len(self) -> int:
        cfg = self.scheduler_config
        return min(cfg.max_model_len, cfg.max_num_batched_tokens)

    def _drop_overlong_head(self, ignored: List[SequenceGroup]) -> None:
        """Finish never-schedulable prompts at the queue head as
        IGNORED instead of wedging FCFS admission forever."""
        max_prompt_len = self._max_prompt_len()
        while self.waiting:
            seq_group = self.waiting[0]
            prompt_len = seq_group.get_seqs()[0].get_len()
            if prompt_len <= max_prompt_len:
                return
            logger.warning(
                "Prompt of request %s (%d tokens) exceeds the limit "
                "of %d tokens; ignoring.", seq_group.request_id,
                prompt_len, max_prompt_len)
            for seq in seq_group.get_seqs():
                seq.status = SequenceStatus.FINISHED_IGNORED
            ignored.append(seq_group)
            self.waiting.popleft()

    def _should_admit(self, now: float,
                      ignored: List[SequenceGroup]) -> bool:
        """Admit this iteration? First a cheap head-of-queue
        admissibility check (_admit_prompts re-validates after decode
        scheduling has reserved its slots), then the hysteresis policy:
        prefill programs cost the same padded or full, so wait until
        the admissible prompts make a reasonably full batch — unless
        the fleet is empty/shrunken or the head prompt has waited too
        long (TTFT guard)."""
        cfg = self.scheduler_config
        self._drop_overlong_head(ignored)
        if not self.waiting:
            return False
        seq_group = self.waiting[0]
        num_curr_seqs = sum(
            g.num_seqs(status=SequenceStatus.RUNNING) for g in self.running)
        num_new_seqs = seq_group.num_seqs(status=SequenceStatus.WAITING)
        if num_curr_seqs + num_new_seqs > cfg.max_num_seqs:
            return False
        if not self.block_manager.can_allocate(seq_group):
            return False

        if not self.running:
            return True
        free_slots = cfg.max_num_seqs - num_curr_seqs
        if free_slots >= cfg.admit_min_free_slots:
            return True
        # TTFT guard, rate-limited: the head never waits more than
        # max_admit_delay_s past the previous admission (plain
        # arrival-time aging would defeat the hysteresis whenever a
        # backlog of same-arrival requests drains, e.g. offline runs).
        if (now - max(seq_group.arrival_time, self._last_admit_time)
                > cfg.max_admit_delay_s):
            return True
        # Tokens admissible right now (bounded by free slots and the
        # batch budget): enough to fill the largest prefill bucket?
        target = cfg.admit_fill_frac * cfg.prefill_token_buckets[-1]
        tokens = 0
        slots = free_slots
        for group in self.waiting:
            if slots <= 0 or tokens >= target:
                break
            prompt_len = group.get_seqs()[0].get_len()
            if tokens + prompt_len > cfg.max_num_batched_tokens:
                break
            tokens += prompt_len
            slots -= group.num_seqs(status=SequenceStatus.WAITING)
        return tokens >= target

    def _admit_prompts(
            self,
            ignored: List[SequenceGroup]) -> Tuple[List[SequenceGroup], int]:
        """Admit waiting prompts into this step's packed prefill part."""
        cfg = self.scheduler_config
        admitted: List[SequenceGroup] = []
        num_tokens = 0
        num_curr_seqs = sum(
            g.num_seqs(status=SequenceStatus.RUNNING) for g in self.running)

        while self.waiting:
            self._drop_overlong_head(ignored)
            if not self.waiting:
                break
            seq_group = self.waiting[0]
            prompt_len = seq_group.get_seqs()[0].get_len()
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
        if admitted:
            self._last_admit_time = time.time()
        return admitted, num_tokens

    def _decode_chunk_steps(self) -> int:
        """How many decode steps this iteration fuses on device.

        Constant (the config value) so exactly ONE decode program
        exists per batch bucket — a variable chunk length would compile
        a program per (bucket, steps) pair, paying tens of seconds
        mid-serving. Sequences that hit max_tokens/EOS/stop inside a
        chunk simply discard the remaining speculative tokens (bounded
        waste: < num_decode_steps tokens per sequence, once).

        Penalty requests chunk like everything else (the [B, V] count
        state rides the on-device scan carry). Beam groups can't chunk
        (host fork selection every token) but don't collapse anyone
        else's chunk: the worker runs them as a separate single-step
        program in the same iteration — only when EVERY group is beam
        does the chunk collapse to 1. Swapped groups may rejoin this
        very iteration, so they count too."""
        max_steps = self.scheduler_config.num_decode_steps
        if max_steps <= 1:
            return 1
        for group in list(self.running) + list(self.swapped):
            if not group.sampling_params.use_beam_search:
                return max_steps
        return 1

    @staticmethod
    def _group_steps(seq_group: SequenceGroup, num_steps: int) -> int:
        """Decode steps THIS group advances this iteration (beam groups
        run single-step beside the chunked program)."""
        return 1 if seq_group.sampling_params.use_beam_search else num_steps

    def _schedule_decode(
        self, now: float, num_steps: int
    ) -> Tuple[Dict[int, int], Dict[int, int], Dict[int, List[int]],
               List[SequenceGroup], List[SequenceGroup]]:
        """Reserve KV slots per running sequence (preempting if out of
        blocks), then swap groups back in if room remains. Returns
        (swap_in, swap_out, copy, decode_groups, preempted)."""
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}

        self.running = self.policy.sort_by_priority(now, self.running)

        running: List[SequenceGroup] = []
        preempted: List[SequenceGroup] = []
        queue = deque(self.running)
        while queue:
            seq_group = queue.popleft()
            group_steps = self._group_steps(seq_group, num_steps)
            pending = max(
                (s.data.pending_tokens
                 for s in seq_group.get_seqs(status=SequenceStatus.RUNNING)),
                default=0)
            while not self.block_manager.can_append_slot(
                    seq_group, group_steps + pending):
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
                self._append_slot(seq_group, blocks_to_copy, group_steps)
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
            self._append_slot(seq_group, blocks_to_copy,
                              self._group_steps(seq_group, num_steps))
            self.running.append(seq_group)

        return (blocks_to_swap_in, blocks_to_swap_out, blocks_to_copy,
                list(self.running), preempted)

    # -- post-step state update ------------------------------------------------

    def update(
        self,
        seq_outputs: Dict[int, SequenceOutputs],
        scheduled_groups: Optional[List[SequenceGroup]] = None,
    ) -> List[SequenceGroup]:
        """Apply one step's sampled tokens; handle beam forks.

        Only groups whose sequences appear in ``seq_outputs`` are
        updated (and returned): a decode chunk's later token sets don't
        cover beam groups (they run single-step beside the chunk), and
        a mixed step's outputs cover prompt + decode groups at once.
        ``scheduled_groups`` identifies the step being applied (async
        scheduling may have scheduled a newer step since).
        """
        if scheduled_groups is None:
            scheduled_groups = self._last_scheduled
        updated: List[SequenceGroup] = []
        for seq_group in scheduled_groups:
            if not any(seq.seq_id in seq_outputs for seq in
                       seq_group.get_seqs(status=SequenceStatus.RUNNING)):
                continue
            updated.append(seq_group)
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
        return updated

    # -- preemption helpers ------------------------------------------------

    def _append_slot(
        self,
        seq_group: SequenceGroup,
        blocks_to_copy: Dict[int, List[int]],
        num_steps: int = 1,
    ) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            # Reserve past any in-flight (async-dispatched) tokens too.
            cow = self.block_manager.append_slot(
                seq, num_steps + seq.data.pending_tokens)
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
