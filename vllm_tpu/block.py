"""Physical KV-cache blocks.

Capability parity: /root/reference/vllm/block.py. Re-designed: the
reference also keeps per-sequence *logical* token blocks
(block.py:9-45); here logical block counts are derived arithmetically
from sequence length (see vllm_tpu/sequence.py), so only the physical
block (a handle into the paged KV cache with a refcount for
copy-on-write sharing) remains as a class.
"""

from dataclasses import dataclass, field

from vllm_tpu.utils import Device


@dataclass(eq=False)  # identity semantics: blocks are handles, keyed by id
class PhysicalTokenBlock:
    """One fixed-size page of the paged KV cache on a given device."""

    device: Device
    block_number: int
    block_size: int
    ref_count: int = field(default=0)

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device.name}, "
                f"block_number={self.block_number}, ref_count={self.ref_count})")
