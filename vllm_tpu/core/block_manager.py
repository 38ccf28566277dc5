"""Paged KV-cache block accounting (the PagedAttention memory manager).

Capability parity: /root/reference/vllm/core/block_manager.py —
free-list allocator with refcounts, prompt-block sharing across the
sequences of a group, copy-on-write on a shared trailing block,
fork/refcount semantics for beam search, device<->host swap mappings,
and watermark-gated admission. Device-agnostic pure Python; the TPU
executor consumes the emitted block numbers / copy pairs / swap maps.

Re-design notes vs. the reference: sequences carry no logical-block
objects — the number of blocks a sequence needs is
``ceil(len / block_size)`` (see vllm_tpu/sequence.py), and
``append_slot`` takes that arithmetic path.
"""

from typing import Dict, List, Optional, Tuple

from vllm_tpu.block import PhysicalTokenBlock
from vllm_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_tpu.utils import Device

BlockTable = List[PhysicalTokenBlock]


class BlockAllocator:
    """Free-list allocator for one device's physical blocks."""

    def __init__(self, device: Device, block_size: int,
                 num_blocks: int) -> None:
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.free_blocks: List[PhysicalTokenBlock] = [
            PhysicalTokenBlock(device=device,
                               block_number=i,
                               block_size=block_size)
            for i in range(num_blocks)
        ]

    def allocate(self) -> PhysicalTokenBlock:
        if not self.free_blocks:
            raise RuntimeError(
                f"Out of {self.device.name} KV-cache blocks.")
        block = self.free_blocks.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise RuntimeError(f"Double free of {block}.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self.free_blocks)


class BlockSpaceManager:
    """Maps sequences to physical KV blocks on TPU HBM and host DRAM."""

    def __init__(
        self,
        block_size: int,
        num_device_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        max_blocks_per_seq: Optional[int] = None,
    ) -> None:
        self.block_size = block_size
        self.num_total_device_blocks = num_device_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        # Cap on a sequence's table length (= ceil(max_model_len /
        # block_size)); multi-step chunks never write past it (the
        # executor PAD-drops those positions).
        self.max_blocks_per_seq = max_blocks_per_seq
        assert watermark >= 0.0
        # Keep a small reserve of free blocks so a burst of admissions
        # doesn't immediately force preemption.
        self.watermark_blocks = int(watermark * num_device_blocks)

        self.device_allocator = BlockAllocator(Device.TPU, block_size,
                                               num_device_blocks)
        self.cpu_allocator = BlockAllocator(Device.CPU, block_size,
                                            num_cpu_blocks)
        self.block_tables: Dict[int, BlockTable] = {}

    # -- prompt admission --------------------------------------------------

    def can_allocate(self, seq_group: SequenceGroup) -> bool:
        # All sequences of a group share the same prompt, hence the same
        # block count at admission time.
        seq = seq_group.get_seqs()[0]
        num_required = seq.num_logical_blocks
        num_free = self.device_allocator.get_num_free_blocks()
        return num_free - num_required >= self.watermark_blocks

    def allocate(self, seq_group: SequenceGroup) -> None:
        """Allocate prompt blocks once; every sequence of the group
        shares them (ref_count = group size) until copy-on-write."""
        seq = seq_group.get_seqs()[0]
        shared_table: BlockTable = []
        for _ in range(seq.num_logical_blocks):
            block = self.device_allocator.allocate()
            block.ref_count = seq_group.num_seqs()
            shared_table.append(block)
        for s in seq_group.get_seqs():
            self.block_tables[s.seq_id] = shared_table.copy()

    # -- decode-slot reservation -------------------------------------------

    def can_append_slot(self, seq_group: SequenceGroup,
                        num_steps: int = 1) -> bool:
        # Worst case: every running sequence needs ceil(n/bs)+1 new
        # blocks over a num_steps chunk (the +1 covers a mid-block
        # start rolling over).
        per_seq = -(-num_steps // self.block_size) + 1 if num_steps > 1 else 1
        num_free = self.device_allocator.get_num_free_blocks()
        return seq_group.num_seqs(
            status=SequenceStatus.RUNNING) * per_seq <= num_free

    def append_slot(self, seq: Sequence,
                    num_steps: int = 1) -> Optional[Tuple[int, int]]:
        """Reserve the KV slots the next ``num_steps`` decode steps will
        write (positions len-1 .. len+num_steps-2).

        Returns a (src, dst) block-number pair when copy-on-write is
        required (the trailing block is shared with a sibling sequence).
        """
        block_table = self.block_tables[seq.seq_id]

        cow: Optional[Tuple[int, int]] = None
        if len(block_table) >= seq.num_logical_blocks and block_table:
            # Position len-1 lands in the existing trailing block; copy
            # it first if a sibling shares it.
            last_block = block_table[-1]
            assert last_block.device == Device.TPU
            if last_block.ref_count > 1:
                new_block = self.device_allocator.allocate()
                block_table[-1] = new_block
                self.device_allocator.free(last_block)
                cow = (last_block.block_number, new_block.block_number)

        # Grow the table to cover the chunk's last written position.
        needed = -(-(seq.get_len() + num_steps - 1) // self.block_size)
        if self.max_blocks_per_seq is not None:
            needed = min(needed, self.max_blocks_per_seq)
        while len(block_table) < needed:
            block_table.append(self.device_allocator.allocate())
        return cow

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        """Beam fork: the child shares all parent blocks (no new memory;
        divergence is deferred to append_slot's copy-on-write)."""
        src_table = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = src_table.copy()
        for block in src_table:
            block.ref_count += 1

    # -- swap --------------------------------------------------------------

    def _get_physical_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        # Blocks are only shared within a group, so the union over the
        # group's live sequences is the full working set.
        blocks = dict.fromkeys(  # ordered de-dup
            block for seq in seq_group.get_seqs() if not seq.is_finished()
            for block in self.block_tables[seq.seq_id])
        return list(blocks)

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        num_swapped_seqs = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        num_free = self.device_allocator.get_num_free_blocks()
        # Each sequence may immediately need one more block after
        # resuming (mirrors can_append_slot).
        num_required = len(blocks) + num_swapped_seqs
        return num_free - num_required >= self.watermark_blocks

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Move the group's blocks host->device; returns
        {cpu_block_number: device_block_number}."""
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            new_table: BlockTable = []
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in mapping:
                    device_block = mapping[cpu_block]
                    device_block.ref_count += 1
                else:
                    device_block = self.device_allocator.allocate()
                    mapping[cpu_block] = device_block
                new_table.append(device_block)
                self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_table
        return {
            cpu.block_number: dev.block_number
            for cpu, dev in mapping.items()
        }

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Move the group's blocks device->host; returns
        {device_block_number: cpu_block_number}."""
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            new_table: BlockTable = []
            for device_block in self.block_tables[seq.seq_id]:
                if device_block in mapping:
                    cpu_block = mapping[device_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate()
                    mapping[device_block] = cpu_block
                new_table.append(cpu_block)
                self.device_allocator.free(device_block)
            self.block_tables[seq.seq_id] = new_table
        return {
            dev.block_number: cpu.block_number
            for dev, cpu in mapping.items()
        }

    # -- teardown / queries --------------------------------------------------

    def free(self, seq: Sequence) -> None:
        table = self.block_tables.pop(seq.seq_id, None)
        if table is None:
            return  # never scheduled, or already freed
        for block in table:
            if block.device == Device.TPU:
                self.device_allocator.free(block)
            else:
                self.cpu_allocator.free(block)

    def reset(self) -> None:
        for seq_id in list(self.block_tables):
            table = self.block_tables.pop(seq_id)
            for block in table:
                if block.device == Device.TPU:
                    self.device_allocator.free(block)
                else:
                    self.cpu_allocator.free(block)

    def get_block_table(self, seq: Sequence) -> List[int]:
        return [b.block_number for b in self.block_tables[seq.seq_id]]

    def get_num_free_device_blocks(self) -> int:
        return self.device_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()
