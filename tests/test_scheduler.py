from vllm_tpu.config import CacheConfig, SchedulerConfig
from vllm_tpu.core.scheduler import Scheduler, StepKind
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.sequence import SequenceOutputs, SequenceStatus

from .utils import make_seq_group

BLOCK = 4


def make_scheduler(
    num_device_blocks=16,
    num_cpu_blocks=8,
    max_num_seqs=8,
    max_num_batched_tokens=64,
    max_model_len=64,
    max_prefill_seqs=4,
):
    cache_config = CacheConfig(block_size=BLOCK, swap_space=0.001)
    cache_config.num_device_blocks = num_device_blocks
    cache_config.num_cpu_blocks = num_cpu_blocks
    scheduler_config = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs,
        max_model_len=max_model_len,
        max_prefill_seqs=max_prefill_seqs,
    )
    return Scheduler(scheduler_config, cache_config, log_stats=False)


def greedy_outputs(metadata_list, base_token=100):
    """Fabricate one sampled token per running sequence."""
    outs = {}
    for md in metadata_list:
        for seq_id in md.seq_data:
            outs[seq_id] = SequenceOutputs(seq_id, seq_id, base_token,
                                           {base_token: -0.1})
    return outs


def step(sched, base_token=100):
    metadata, outputs = sched.schedule()
    if metadata:
        sched.update(greedy_outputs(metadata, base_token))
    return metadata, outputs


def test_prefill_then_decode():
    sched = make_scheduler()
    sched.add_seq_group(make_seq_group("a", prompt_len=6, block_size=BLOCK))
    sched.add_seq_group(make_seq_group("b", prompt_len=5, block_size=BLOCK))

    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.MIXED
    assert [m.request_id for m in metadata] == ["a", "b"]
    assert all(m.is_prompt for m in metadata)
    assert outputs.num_batched_tokens == 11
    sched.update(greedy_outputs(metadata))

    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    assert not any(m.is_prompt for m in metadata)
    assert outputs.num_batched_tokens == 2  # one token per running seq


def test_mixed_step_decodes_while_admitting():
    """Running sequences keep decoding in the same step that admits a
    new prompt (the reference's mixed prompt+generation batch,
    worker.py:128-237)."""
    sched = make_scheduler()
    sched.add_seq_group(make_seq_group("a", prompt_len=6, block_size=BLOCK))
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.MIXED
    sched.update(greedy_outputs(metadata))

    sched.add_seq_group(make_seq_group("b", prompt_len=5, block_size=BLOCK))
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.MIXED
    by_id = {m.request_id: m for m in metadata}
    assert by_id["b"].is_prompt and not by_id["a"].is_prompt
    # 5 prompt tokens + 1 decode token.
    assert outputs.num_batched_tokens == 6
    assert outputs.num_decode_steps == 1
    sched.update(greedy_outputs(metadata))
    assert [s.get_output_len() for g in sched.running
            for s in g.get_seqs()] == [2, 1]


def test_token_budget_caps_prefill():
    sched = make_scheduler(max_num_batched_tokens=8)
    sched.add_seq_group(make_seq_group("a", prompt_len=6, block_size=BLOCK))
    sched.add_seq_group(make_seq_group("b", prompt_len=6, block_size=BLOCK))
    metadata, outputs = sched.schedule()
    assert [m.request_id for m in metadata] == ["a"]
    # b is admitted by the next step's prefill part, while a decodes.
    sched.update(greedy_outputs(metadata))
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.MIXED
    assert [m.request_id for m in metadata if m.is_prompt] == ["b"]
    assert [m.request_id for m in metadata if not m.is_prompt] == ["a"]


def test_max_prefill_seqs_caps_batch():
    sched = make_scheduler(max_prefill_seqs=2)
    for i in range(4):
        sched.add_seq_group(
            make_seq_group(f"r{i}", prompt_len=4, block_size=BLOCK))
    metadata, _ = sched.schedule()
    assert len(metadata) == 2


def test_overlong_prompt_ignored():
    sched = make_scheduler(max_model_len=8)
    sched.add_seq_group(make_seq_group("big", prompt_len=9, block_size=BLOCK))
    sched.add_seq_group(make_seq_group("ok", prompt_len=4, block_size=BLOCK))
    metadata, outputs = sched.schedule()
    assert [g.request_id for g in outputs.ignored_seq_groups] == ["big"]
    ignored_seq = outputs.ignored_seq_groups[0].get_seqs()[0]
    assert ignored_seq.status == SequenceStatus.FINISHED_IGNORED
    assert [m.request_id for m in metadata] == ["ok"]


def test_preempt_by_recompute():
    sched = make_scheduler(num_device_blocks=4, num_cpu_blocks=4)
    a = make_seq_group("a", prompt_len=8, block_size=BLOCK, arrival_time=1.0)
    b = make_seq_group("b", prompt_len=8, block_size=BLOCK, arrival_time=2.0)
    sched.add_seq_group(a)
    sched.add_seq_group(b)
    step(sched)  # prefill both: all 4 blocks in use, seqs now length 9

    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    # Newest group (b) is evicted by recompute and requeued at the head.
    assert [m.request_id for m in metadata] == ["a"]
    assert sched.waiting[0].request_id == "b"
    assert b.get_seqs()[0].status == SequenceStatus.WAITING
    assert not outputs.blocks_to_swap_out  # recompute frees, not swaps


def test_preempt_beam_group_by_swap():
    sched = make_scheduler(num_device_blocks=3, num_cpu_blocks=4)
    a = make_seq_group("a", prompt_len=4, block_size=BLOCK, arrival_time=1.0)
    beam = make_seq_group(
        "beam", prompt_len=4, num_seqs=2, block_size=BLOCK, arrival_time=2.0,
        sampling_params=SamplingParams(use_beam_search=True, best_of=2,
                                       temperature=0.0))
    sched.add_seq_group(a)
    sched.add_seq_group(beam)
    step(sched)  # prefill both (1 block each; beam shares its block)

    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    assert [m.request_id for m in metadata] == ["a"]
    assert len(outputs.blocks_to_swap_out) == 1  # the shared beam block
    assert all(s.status == SequenceStatus.SWAPPED
               for s in beam.get_seqs())
    assert sched.swapped == [beam]

    # While anything is swapped, new prompts are not admitted.
    sched.update(greedy_outputs(metadata))
    sched.add_seq_group(make_seq_group("c", prompt_len=4, block_size=BLOCK))
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    assert [m.request_id for m in metadata] == ["a"]
    assert len(sched.waiting) == 1


def test_swap_in_resumes_group():
    sched = make_scheduler(num_device_blocks=3, num_cpu_blocks=4)
    a = make_seq_group("a", prompt_len=4, block_size=BLOCK, arrival_time=1.0)
    beam = make_seq_group(
        "beam", prompt_len=4, num_seqs=2, block_size=BLOCK, arrival_time=2.0,
        sampling_params=SamplingParams(use_beam_search=True, best_of=2,
                                       temperature=0.0))
    sched.add_seq_group(a)
    sched.add_seq_group(beam)
    step(sched)
    step(sched)  # beam gets swapped out
    # Finish "a" to free its blocks.
    for seq in a.get_seqs():
        sched.free_seq(seq, SequenceStatus.FINISHED_STOPPED)
    sched.free_finished_seq_groups()

    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    assert [m.request_id for m in metadata] == ["beam"]
    assert outputs.blocks_to_swap_in
    assert all(s.status == SequenceStatus.RUNNING for s in beam.get_seqs())


def test_update_applies_beam_fork():
    sched = make_scheduler()
    beam = make_seq_group(
        "beam", prompt_len=5, num_seqs=2, block_size=BLOCK,
        sampling_params=SamplingParams(use_beam_search=True, best_of=2,
                                       temperature=0.0))
    sched.add_seq_group(beam)
    metadata, _ = sched.schedule()
    s0, s1 = beam.get_seqs()
    # Both beam slots continue from parent s0.
    outs = {
        s0.seq_id: SequenceOutputs(s0.seq_id, s0.seq_id, 11, {11: -0.5}),
        s1.seq_id: SequenceOutputs(s1.seq_id, s0.seq_id, 12, {12: -0.7}),
    }
    sched.update(outs)
    assert s0.get_output_token_ids() == [11]
    assert s1.get_output_token_ids() == [12]
    bm = sched.block_manager
    assert bm.get_block_table(s0) == bm.get_block_table(s1)
    # The shared trailing block now forces copy-on-write on next decode.
    _, outputs = sched.schedule()
    assert outputs.blocks_to_copy


def test_abort_releases_blocks():
    sched = make_scheduler()
    g = make_seq_group("a", prompt_len=8, block_size=BLOCK)
    sched.add_seq_group(g)
    step(sched)
    assert sched.block_manager.get_num_free_device_blocks() < 16
    sched.abort_seq_group("a")
    assert not sched.has_unfinished_seqs()
    assert sched.block_manager.get_num_free_device_blocks() == 16
    assert g.get_seqs()[0].status == SequenceStatus.FINISHED_ABORTED


def test_admission_hysteresis_defers_small_refills():
    """With a nearly full fleet, a single freed slot does not trigger a
    (mostly padded) prefill: admission waits for admit_min_free_slots,
    letting decode run full multi-step chunks in between."""
    sched = make_scheduler(max_num_seqs=8, num_device_blocks=64)
    sched.scheduler_config.num_decode_steps = 4
    sched.scheduler_config.admit_min_free_slots = 4
    sched.scheduler_config.max_admit_delay_s = 1e9  # disable TTFT guard
    sched.scheduler_config.admit_fill_frac = 0.9

    for i in range(8):
        sched.add_seq_group(
            make_seq_group(f"r{i}", prompt_len=4, block_size=BLOCK))
    step(sched)  # admits as slots allow (fleet empty -> immediate)
    while sched.waiting:
        step(sched)
    assert len(sched.running) == 8

    # One more prompt arrives; only 0 slots free -> defer.
    sched.add_seq_group(make_seq_group("late", prompt_len=4,
                                       block_size=BLOCK))
    # Finish ONE group: 1 free slot < admit_min_free_slots -> DECODE
    # chunk, not admission.
    g = sched.running[0]
    for s in g.get_seqs():
        sched.free_seq(s, SequenceStatus.FINISHED_STOPPED)
    sched.free_finished_seq_groups()
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.DECODE
    assert outputs.num_decode_steps == 4
    sched.update(greedy_outputs(metadata))

    # Finish three more: 4 free slots -> admission fires (MIXED).
    for g in list(sched.running[:3]):
        for s in g.get_seqs():
            sched.free_seq(s, SequenceStatus.FINISHED_STOPPED)
    sched.free_finished_seq_groups()
    metadata, outputs = sched.schedule()
    assert outputs.kind == StepKind.MIXED
    assert [m.request_id for m in metadata if m.is_prompt] == ["late"]
