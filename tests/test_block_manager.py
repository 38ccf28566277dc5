import pytest

from vllm_tpu.core.block_manager import BlockAllocator, BlockSpaceManager
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.sequence import SequenceStatus
from vllm_tpu.utils import Device

from .utils import make_seq_group

BLOCK = 4


def make_mgr(num_device=16, num_cpu=8, watermark=0.0):
    return BlockSpaceManager(block_size=BLOCK,
                             num_device_blocks=num_device,
                             num_cpu_blocks=num_cpu,
                             watermark=watermark)


def set_running(group):
    for s in group.get_seqs():
        s.status = SequenceStatus.RUNNING


def test_allocator_free_list():
    alloc = BlockAllocator(Device.TPU, BLOCK, 4)
    blocks = [alloc.allocate() for _ in range(4)]
    assert alloc.get_num_free_blocks() == 0
    with pytest.raises(RuntimeError):
        alloc.allocate()
    alloc.free(blocks[0])
    assert alloc.get_num_free_blocks() == 1
    with pytest.raises(RuntimeError):
        alloc.free(blocks[0])  # double free


def test_prompt_blocks_shared_across_group():
    mgr = make_mgr()
    group = make_seq_group("r0", prompt_len=6, num_seqs=3, block_size=BLOCK,
                           sampling_params=SamplingParams(n=3,
                                                          temperature=1.0))
    assert mgr.can_allocate(group)
    mgr.allocate(group)
    # 6 tokens -> 2 blocks, shared by 3 seqs: only 2 physical blocks used.
    assert mgr.get_num_free_device_blocks() == 14
    tables = [mgr.get_block_table(s) for s in group.get_seqs()]
    assert tables[0] == tables[1] == tables[2]


def test_append_slot_new_block_and_cow():
    mgr = make_mgr()
    group = make_seq_group("r0", prompt_len=4, num_seqs=2, block_size=BLOCK,
                           sampling_params=SamplingParams(n=2,
                                                          temperature=1.0))
    mgr.allocate(group)
    set_running(group)
    s0, s1 = group.get_seqs()

    # Prompt fills block 0 exactly; first decode token needs a new block
    # per sequence (no COW: the new blocks are unshared).
    s0.append_token_id(9, {9: 0.0})
    assert mgr.append_slot(s0) is None
    s1.append_token_id(8, {8: 0.0})
    assert mgr.append_slot(s1) is None
    assert mgr.get_block_table(s0)[0] == mgr.get_block_table(s1)[0]
    assert mgr.get_block_table(s0)[1] != mgr.get_block_table(s1)[1]


def test_cow_on_shared_last_block():
    mgr = make_mgr()
    # Prompt of 3 tokens: last block is partially filled and shared.
    group = make_seq_group("r0", prompt_len=3, num_seqs=2, block_size=BLOCK,
                           sampling_params=SamplingParams(n=2,
                                                          temperature=1.0))
    mgr.allocate(group)
    set_running(group)
    s0, s1 = group.get_seqs()
    shared = mgr.get_block_table(s0)[0]

    s0.append_token_id(9, {9: 0.0})
    cow = mgr.append_slot(s0)  # block still shared -> copy-on-write
    assert cow is not None
    src, dst = cow
    assert src == shared and dst != shared
    assert mgr.get_block_table(s0) == [dst]

    # Sibling now holds the last reference: no COW for it.
    s1.append_token_id(8, {8: 0.0})
    assert mgr.append_slot(s1) is None
    assert mgr.get_block_table(s1) == [shared]


def test_fork_shares_blocks():
    mgr = make_mgr()
    group = make_seq_group("r0", prompt_len=8, num_seqs=2, block_size=BLOCK,
                           sampling_params=SamplingParams(n=2,
                                                          temperature=1.0))
    mgr.allocate(group)
    set_running(group)
    s0, s1 = group.get_seqs()
    free_before = mgr.get_num_free_device_blocks()
    mgr.free(s1)
    mgr.fork(s0, s1)  # rebind child to parent's blocks
    assert mgr.get_num_free_device_blocks() == free_before
    assert mgr.get_block_table(s0) == mgr.get_block_table(s1)


def test_swap_out_and_in_roundtrip():
    mgr = make_mgr(num_device=8, num_cpu=8)
    group = make_seq_group("r0", prompt_len=8, num_seqs=2, block_size=BLOCK,
                           sampling_params=SamplingParams(n=2,
                                                          temperature=1.0))
    mgr.allocate(group)
    set_running(group)
    dev_table = mgr.get_block_table(group.get_seqs()[0])

    assert mgr.can_swap_out(group)
    out_map = mgr.swap_out(group)
    assert set(out_map.keys()) == set(dev_table)
    assert mgr.get_num_free_device_blocks() == 8
    for s in group.get_seqs():
        s.status = SequenceStatus.SWAPPED

    assert mgr.can_swap_in(group)
    in_map = mgr.swap_in(group)
    assert set(in_map.keys()) == set(out_map.values())
    assert mgr.get_num_free_cpu_blocks() == 8
    # Shared structure preserved: both seqs still share the same blocks.
    t0 = mgr.get_block_table(group.get_seqs()[0])
    t1 = mgr.get_block_table(group.get_seqs()[1])
    assert t0 == t1


def test_watermark_blocks_admission():
    mgr = make_mgr(num_device=10, num_cpu=0, watermark=0.5)  # reserve 5
    ok = make_seq_group("a", prompt_len=4 * 5, block_size=BLOCK)
    assert mgr.can_allocate(ok)
    too_big = make_seq_group("b", prompt_len=4 * 6, block_size=BLOCK)
    assert not mgr.can_allocate(too_big)


def test_free_and_reset():
    mgr = make_mgr()
    group = make_seq_group("r0", prompt_len=8, block_size=BLOCK)
    mgr.allocate(group)
    seq = group.get_seqs()[0]
    mgr.free(seq)
    assert mgr.get_num_free_device_blocks() == 16
    mgr.free(seq)  # idempotent
    mgr.allocate(group)
    mgr.reset()
    assert mgr.get_num_free_device_blocks() == 16
