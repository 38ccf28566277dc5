from vllm_tpu.sequence import Sequence, SequenceStatus


def make_seq(prompt_len=5, block_size=4, seq_id=0):
    return Sequence(seq_id, "p", list(range(prompt_len)), block_size)


def test_block_arithmetic():
    seq = make_seq(prompt_len=5, block_size=4)
    assert seq.num_logical_blocks == 2
    assert seq.last_block_free_slots == 3
    for t in range(3):
        seq.append_token_id(100 + t, {100 + t: -0.1})
    assert seq.get_len() == 8
    assert seq.num_logical_blocks == 2
    assert seq.last_block_free_slots == 0
    seq.append_token_id(200, {200: -0.2})
    assert seq.num_logical_blocks == 3


def test_token_accessors():
    seq = make_seq(prompt_len=3)
    assert seq.get_last_token_id() == 2
    seq.append_token_id(42, {42: -1.5})
    assert seq.get_last_token_id() == 42
    assert seq.get_token_ids() == [0, 1, 2, 42]
    assert seq.get_output_token_ids() == [42]
    assert abs(seq.get_cumulative_logprob() - (-1.5)) < 1e-9


def test_fork_into_child():
    parent = make_seq(prompt_len=4, seq_id=1)
    parent.append_token_id(7, {7: -0.5})
    child = make_seq(prompt_len=4, seq_id=2)
    parent.fork(child)
    assert child.seq_id == 2  # keeps its own id
    assert child.get_token_ids() == parent.get_token_ids()
    # Deep copy: further appends don't alias.
    parent.append_token_id(8, {8: -0.1})
    assert child.get_output_len() == 1


def test_finish_states():
    seq = make_seq()
    assert not seq.is_finished()
    seq.status = SequenceStatus.FINISHED_STOPPED
    assert seq.is_finished()
    assert SequenceStatus.get_finished_reason(seq.status) == "stop"
    assert SequenceStatus.get_finished_reason(
        SequenceStatus.FINISHED_LENGTH_CAPPED) == "length"
    assert SequenceStatus.get_finished_reason(
        SequenceStatus.RUNNING) is None
