"""User-facing request outputs.

Capability parity: /root/reference/vllm/outputs.py (CompletionOutput and
RequestOutput.from_seq_group picking the top-n sequences by cumulative
logprob).
"""

from typing import Dict, List, Optional

from vllm_tpu.sequence import Sequence, SequenceGroup, SequenceStatus


class CompletionOutput:
    """One finished (or in-flight) completion of a request."""

    def __init__(
        self,
        index: int,
        text: str,
        token_ids: List[int],
        cumulative_logprob: float,
        logprobs: Optional[List[Dict[int, float]]],
        finish_reason: Optional[str] = None,
    ) -> None:
        self.index = index
        self.text = text
        self.token_ids = token_ids
        self.cumulative_logprob = cumulative_logprob
        self.logprobs = logprobs
        self.finish_reason = finish_reason

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (f"CompletionOutput(index={self.index}, text={self.text!r}, "
                f"token_ids={self.token_ids}, "
                f"cumulative_logprob={self.cumulative_logprob}, "
                f"finish_reason={self.finish_reason})")


class RequestOutput:
    """The streamed/final output of one request."""

    def __init__(
        self,
        request_id: str,
        prompt: str,
        prompt_token_ids: List[int],
        outputs: List[CompletionOutput],
        finished: bool,
        prompt_logprobs: Optional[List[Optional[Dict[int,
                                                     float]]]] = None,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.outputs = outputs
        self.finished = finished
        # Per-prompt-position logprobs (entry 0 None), present when the
        # request set SamplingParams.prompt_logprobs (echo+logprobs).
        self.prompt_logprobs = prompt_logprobs

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        # Return the n best sequences (by cumulative logprob over all
        # candidates when best_of > n).
        params = seq_group.sampling_params
        seqs = seq_group.get_seqs()
        if params.n == len(seqs):
            top_seqs = seqs
        else:
            sort_key = (Sequence.get_cumulative_logprob
                        if params.use_beam_search else
                        Sequence.get_cumulative_logprob)
            top_seqs = sorted(seqs, key=sort_key, reverse=True)[:params.n]

        include_logprobs = params.logprobs is not None
        outputs = [
            CompletionOutput(
                index=i,
                text=seq.output_text,
                token_ids=seq.get_output_token_ids(),
                cumulative_logprob=seq.get_cumulative_logprob(),
                logprobs=seq.output_logprobs if include_logprobs else None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
            ) for i, seq in enumerate(top_seqs)
        ]

        prompt = seq_group.seqs[0].prompt
        prompt_token_ids = seq_group.seqs[0].data.prompt_token_ids
        plp = seq_group.seqs[0].data.prompt_logprobs
        if plp is not None and len(plp) > len(prompt_token_ids):
            # RECOMPUTE re-prefills pack generated tokens too; the API
            # reports prompt positions only.
            plp = plp[:len(prompt_token_ids)]
        return cls(seq_group.request_id, prompt, prompt_token_ids, outputs,
                   seq_group.is_finished(), prompt_logprobs=plp)

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"prompt={self.prompt!r}, outputs={self.outputs}, "
                f"finished={self.finished})")
