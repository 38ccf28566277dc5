"""Request / sequence data model.

Capability parity: /root/reference/vllm/sequence.py (SequenceStatus,
SequenceData, Sequence with fork semantics for beam search,
SequenceGroup = one request, SequenceGroupMetadata = the scheduler ->
executor wire format, SequenceOutputs = one sampled token with its
beam-fork parent). Re-designed for the TPU engine: sequences do not own
logical token-block objects; the block count is ``ceil(len /
block_size)`` and the executor consumes flat numpy block tables.
"""

import copy
import enum
from typing import Dict, List, Optional

from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.utils import cdiv


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    SWAPPED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_IGNORED = enum.auto()

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status in _FINISHED_STATUSES

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        return _FINISH_REASON.get(status)


_FINISHED_STATUSES = frozenset([
    SequenceStatus.FINISHED_STOPPED,
    SequenceStatus.FINISHED_LENGTH_CAPPED,
    SequenceStatus.FINISHED_ABORTED,
    SequenceStatus.FINISHED_IGNORED,
])

_FINISH_REASON = {
    SequenceStatus.FINISHED_STOPPED: "stop",
    SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
    SequenceStatus.FINISHED_ABORTED: "abort",
    # Ignored = prompt longer than the model context; reported as "length".
    SequenceStatus.FINISHED_IGNORED: "length",
}


class SequenceData:
    """Token ids and cumulative logprob of one sequence."""

    def __init__(self, prompt_token_ids: List[int]) -> None:
        self.prompt_token_ids = prompt_token_ids
        self.output_token_ids: List[int] = []
        self.cumulative_logprob = 0.0
        # Tokens computed by a dispatched-but-not-yet-fetched step
        # (async scheduling): the scheduler reserves KV slots for them
        # and the executor positions past them; their values live on
        # device until the engine applies the step's outputs.
        self.pending_tokens = 0
        # Per-prompt-position logprob dicts (entry 0 is None — no
        # preceding context), filled by the worker when the request
        # asked for prompt_logprobs (echo+logprobs).
        self.prompt_logprobs: Optional[List[Dict[int, float]]] = None

    def append_token_id(self, token_id: int, logprob: float) -> None:
        self.output_token_ids.append(token_id)
        self.cumulative_logprob += logprob

    def get_len(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    def get_prompt_len(self) -> int:
        return len(self.prompt_token_ids)

    def get_output_len(self) -> int:
        return len(self.output_token_ids)

    def get_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def get_last_token_id(self) -> int:
        if self.output_token_ids:
            return self.output_token_ids[-1]
        return self.prompt_token_ids[-1]

    def __repr__(self) -> str:
        return (f"SequenceData(prompt_len={self.get_prompt_len()}, "
                f"output_len={self.get_output_len()}, "
                f"cumulative_logprob={self.cumulative_logprob})")


class Sequence:
    """One candidate completion: prompt + generated tokens + status."""

    def __init__(
        self,
        seq_id: int,
        prompt: str,
        prompt_token_ids: List[int],
        block_size: int,
    ) -> None:
        self.seq_id = seq_id
        self.prompt = prompt
        self.block_size = block_size
        self.data = SequenceData(prompt_token_ids)
        self.output_logprobs: List[Dict[int, float]] = []
        self.output_text = ""
        # Incremental-detokenization cursor state (see
        # engine/tokenizer_utils.py): last decoded token strings.
        self.prev_tokens: Optional[List[str]] = None
        self.prefix_offset = 0
        self.read_offset = 0
        self.status = SequenceStatus.WAITING

    # -- token bookkeeping ----------------------------------------------

    def append_token_id(self, token_id: int,
                        logprobs: Dict[int, float]) -> None:
        assert token_id in logprobs
        self.output_logprobs.append(logprobs)
        self.data.append_token_id(token_id, logprobs[token_id])

    def get_len(self) -> int:
        return self.data.get_len()

    def get_prompt_len(self) -> int:
        return self.data.get_prompt_len()

    def get_output_len(self) -> int:
        return self.data.get_output_len()

    def get_token_ids(self) -> List[int]:
        return self.data.get_token_ids()

    def get_last_token_id(self) -> int:
        return self.data.get_last_token_id()

    def get_output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    def get_cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    @property
    def num_logical_blocks(self) -> int:
        """KV blocks needed to hold every token of this sequence."""
        return cdiv(self.get_len(), self.block_size)

    @property
    def last_block_free_slots(self) -> int:
        """Unused token slots in the trailing KV block (0 if exactly full)."""
        return self.num_logical_blocks * self.block_size - self.get_len()

    def is_finished(self) -> bool:
        return SequenceStatus.is_finished(self.status)

    def fork(self, child_seq: "Sequence") -> None:
        """Overwrite ``child_seq`` with a deep copy of this sequence's
        state (beam-search branching), preserving the child's seq_id.

        The block manager separately remaps the child's KV blocks
        (copy-on-write); this only clones host-side state.
        """
        child_id = child_seq.seq_id
        child_seq.__dict__ = copy.deepcopy(self.__dict__)
        child_seq.seq_id = child_id

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
                f"num_blocks={self.num_logical_blocks})")


class SequenceGroup:
    """All candidate sequences spawned by one request."""

    def __init__(
        self,
        request_id: str,
        seqs: List[Sequence],
        sampling_params: SamplingParams,
        arrival_time: float,
    ) -> None:
        self.request_id = request_id
        self.seqs = seqs
        self.sampling_params = sampling_params
        self.arrival_time = arrival_time

    def get_seqs(
        self,
        status: Optional[SequenceStatus] = None,
    ) -> List[Sequence]:
        if status is None:
            return self.seqs
        return [seq for seq in self.seqs if seq.status == status]

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        return len(self.get_seqs(status))

    def find(self, seq_id: int) -> Sequence:
        for seq in self.seqs:
            if seq.seq_id == seq_id:
                return seq
        raise ValueError(f"sequence {seq_id} not found in group "
                         f"{self.request_id}")

    def is_finished(self) -> bool:
        return all(seq.is_finished() for seq in self.seqs)

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"sampling_params={self.sampling_params}, "
                f"num_seqs={len(self.seqs)})")


class SequenceGroupMetadata:
    """Scheduler -> executor step descriptor for one group.

    ``block_tables`` maps seq_id -> physical block numbers; ``is_prompt``
    selects the prefill vs. decode program.
    """

    def __init__(
        self,
        request_id: str,
        is_prompt: bool,
        seq_data: Dict[int, SequenceData],
        sampling_params: SamplingParams,
        block_tables: Dict[int, List[int]],
    ) -> None:
        self.request_id = request_id
        self.is_prompt = is_prompt
        self.seq_data = seq_data
        self.sampling_params = sampling_params
        self.block_tables = block_tables


class SequenceOutputs:
    """One sampled token for one sequence slot.

    ``parent_seq_id`` != ``seq_id`` signals a beam-search fork: this
    slot's continuation must branch from the parent's KV blocks.
    """

    def __init__(
        self,
        seq_id: int,
        parent_seq_id: int,
        output_token: int,
        logprobs: Dict[int, float],
    ) -> None:
        self.seq_id = seq_id
        self.parent_seq_id = parent_seq_id
        self.output_token = output_token
        self.logprobs = logprobs

    def __repr__(self) -> str:
        return (f"SequenceOutputs(seq_id={self.seq_id}, "
                f"parent_seq_id={self.parent_seq_id}, "
                f"output_token={self.output_token})")

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, SequenceOutputs):
            return NotImplemented
        return (self.seq_id == other.seq_id
                and self.parent_seq_id == other.parent_seq_id
                and self.output_token == other.output_token
                and self.logprobs == other.logprobs)
