"""Small shared utilities.

Capability parity: /root/reference/vllm/utils.py (Device enum, Counter,
random_uuid) plus TPU-specific shape-bucketing helpers that have no
reference counterpart (XLA compiles one program per static shape, so the
engine quantizes batch/token counts to a small set of buckets).
"""

import enum
import uuid
from typing import List, Sequence


class Device(enum.Enum):
    """Where a physical KV block lives: device HBM or host DRAM."""

    TPU = enum.auto()
    CPU = enum.auto()


class Counter:
    """Monotonically increasing id generator."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        value = self.counter
        self.counter += 1
        return value

    def reset(self) -> None:
        self.counter = 0


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return cdiv(x, multiple) * multiple


def make_buckets(lo: int, hi: int, *, base: int = 2) -> List[int]:
    """Powers-of-`base` buckets covering [lo, hi], endpoints included.

    make_buckets(8, 100) -> [8, 16, 32, 64, 128] (last bucket covers hi).
    """
    if lo <= 0 or hi < lo:
        raise ValueError(f"bad bucket range [{lo}, {hi}]")
    buckets = [lo]
    while buckets[-1] < hi:
        buckets.append(buckets[-1] * base)
    return buckets


def pick_bucket(buckets: Sequence[int], n: int) -> int:
    """Smallest bucket >= n. Buckets must be sorted ascending."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


STR_DTYPE_TO_BITS = {
    "float32": 32,
    "bfloat16": 16,
    "float16": 16,
    "int8": 8,
    "float8_e4m3fn": 8,
}


def in_wsl() -> bool:  # parity shim; always False on TPU hosts
    return False
