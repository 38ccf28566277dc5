"""Shared test helpers."""

import time
from typing import List, Optional, Union


class MockTokenizer:
    """Char-level tokenizer over a small vocab for engine tests."""

    def __init__(self, vocab_size: int = 128, eos_token_id=None):
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id

    def encode(self, text: str) -> List[int]:
        return [ord(c) % self.vocab_size for c in text]

    def convert_ids_to_tokens(self, ids: Union[int, List[int]],
                              skip_special_tokens: bool = False):
        if isinstance(ids, int):
            return chr(ids)
        return [chr(i) for i in ids]

    def convert_tokens_to_string(self, tokens: List[str]) -> str:
        return "".join(tokens)

    def decode(self, ids: List[int], **kwargs) -> str:
        return "".join(chr(i) for i in ids)

    def get_added_vocab(self):
        return {}

from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.sequence import Sequence, SequenceGroup

_seq_counter = [0]


def make_seq_group(
    request_id: str,
    prompt_len: int = 4,
    num_seqs: int = 1,
    block_size: int = 4,
    sampling_params: Optional[SamplingParams] = None,
    arrival_time: Optional[float] = None,
) -> SequenceGroup:
    if sampling_params is None:
        if num_seqs == 1:
            sampling_params = SamplingParams(temperature=0.0)
        else:
            sampling_params = SamplingParams(temperature=0.8, n=num_seqs)
    prompt_token_ids = list(range(prompt_len))
    seqs: List[Sequence] = []
    for _ in range(num_seqs):
        seq_id = _seq_counter[0]
        _seq_counter[0] += 1
        seqs.append(
            Sequence(seq_id, "dummy prompt", prompt_token_ids, block_size))
    return SequenceGroup(
        request_id=request_id,
        seqs=seqs,
        sampling_params=sampling_params,
        arrival_time=arrival_time if arrival_time is not None else time.time(),
    )
