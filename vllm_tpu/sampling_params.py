"""Sampling parameters for text generation.

Capability parity: /root/reference/vllm/sampling_params.py:41-135
(n/best_of, presence & frequency penalties, temperature, top_p, top_k,
beam search, stop strings, ignore_eos, max_tokens, logprobs, with the
same greedy/beam validation invariants). Beyond the reference:
``logit_bias`` (the reference's OpenAI server rejects it) and
``prompt_logprobs`` (per-prompt-position logprobs for echo+logprobs,
which the reference rejects outright).
"""

from typing import Dict, List, Optional, Union

_SAMPLING_EPS = 1e-5

# Per-request logit_bias entries are padded to a device bucket; more
# than this many distinct token biases in one request is rejected.
MAX_LOGIT_BIAS = 128

# Top-k logprob counts are padded to a device bucket whose largest
# rung is 128 (worker.TOPK_BUCKETS); values past it must be rejected
# HERE — an unbucketable count would otherwise raise inside
# engine.step() and kill the shared step loop for every client.
MAX_LOGPROBS = 128


class SamplingParams:
    """Per-request sampling configuration (OpenAI-API style).

    Args:
        n: number of output sequences to return for the request.
        best_of: number of sequences generated server-side, of which the
            best ``n`` are returned. Defaults to ``n``. Must be >= n, and
            is the beam width when ``use_beam_search`` is True.
        presence_penalty: penalizes tokens already present in the output
            (by presence, not count). Range [-2, 2].
        frequency_penalty: penalizes tokens by their output frequency.
            Range [-2, 2].
        temperature: randomness of sampling; 0 means greedy.
        top_p: cumulative-probability nucleus cutoff in (0, 1].
        top_k: number of top tokens to consider; -1 disables.
        use_beam_search: beam search instead of sampling.
        stop: string(s) that terminate generation when produced.
        ignore_eos: keep generating past EOS.
        max_tokens: maximum output tokens to generate.
        logprobs: number of top logprobs to return per output token.
        logit_bias: token id -> additive logit bias (OpenAI semantics:
            applied before temperature/sampling; [-100, 100]).
        prompt_logprobs: number of top logprobs to return per PROMPT
            position (None disables; 0 returns just each realized
            prompt token's logprob).
    """

    def __init__(
        self,
        n: int = 1,
        best_of: Optional[int] = None,
        presence_penalty: float = 0.0,
        frequency_penalty: float = 0.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        top_k: int = -1,
        use_beam_search: bool = False,
        stop: Union[None, str, List[str]] = None,
        ignore_eos: bool = False,
        max_tokens: int = 16,
        logprobs: Optional[int] = None,
        logit_bias: Optional[Dict[int, float]] = None,
        prompt_logprobs: Optional[int] = None,
    ) -> None:
        self.n = n
        self.best_of = best_of if best_of is not None else n
        self.presence_penalty = presence_penalty
        self.frequency_penalty = frequency_penalty
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.use_beam_search = use_beam_search
        if stop is None:
            self.stop: List[str] = []
        elif isinstance(stop, str):
            self.stop = [stop]
        else:
            self.stop = list(stop)
        self.ignore_eos = ignore_eos
        self.max_tokens = max_tokens
        self.logprobs = logprobs
        self.logit_bias = ({int(t): float(b)
                            for t, b in logit_bias.items()}
                           if logit_bias else None)
        self.prompt_logprobs = prompt_logprobs

        self._verify_args()
        if self.use_beam_search:
            self._verify_beam_search()
        elif self.is_greedy:
            self._verify_greedy_sampling()

    # -- derived properties -------------------------------------------------

    @property
    def is_greedy(self) -> bool:
        return not self.use_beam_search and self.temperature < _SAMPLING_EPS

    @property
    def sampling_type(self) -> str:
        if self.use_beam_search:
            return "beam"
        if self.is_greedy:
            return "greedy"
        return "random"

    # -- validation ---------------------------------------------------------

    def _verify_args(self) -> None:
        if self.n < 1:
            raise ValueError(f"n must be at least 1, got {self.n}.")
        if self.best_of < self.n:
            raise ValueError(
                f"best_of must be >= n, got n={self.n}, best_of={self.best_of}.")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError(
                f"presence_penalty must be in [-2, 2], got {self.presence_penalty}.")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError(
                f"frequency_penalty must be in [-2, 2], got {self.frequency_penalty}.")
        if self.temperature < 0.0:
            raise ValueError(
                f"temperature must be non-negative, got {self.temperature}.")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}.")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(
                f"top_k must be -1 (disable) or at least 1, got {self.top_k}.")
        if self.max_tokens < 1:
            raise ValueError(
                f"max_tokens must be at least 1, got {self.max_tokens}.")
        if self.logprobs is not None and not (
                0 <= self.logprobs <= MAX_LOGPROBS):
            raise ValueError(f"logprobs must be in [0, {MAX_LOGPROBS}], "
                             f"got {self.logprobs}.")
        if self.prompt_logprobs is not None and not (
                0 <= self.prompt_logprobs <= MAX_LOGPROBS):
            raise ValueError(
                f"prompt_logprobs must be in [0, {MAX_LOGPROBS}], "
                f"got {self.prompt_logprobs}.")
        if self.logit_bias is not None:
            if len(self.logit_bias) > MAX_LOGIT_BIAS:
                raise ValueError(
                    f"logit_bias supports at most {MAX_LOGIT_BIAS} "
                    f"entries, got {len(self.logit_bias)}.")
            for t, b in self.logit_bias.items():
                if t < 0:
                    raise ValueError(
                        f"logit_bias token ids must be >= 0, got {t}.")
                if not -100.0 <= b <= 100.0:
                    raise ValueError(
                        f"logit_bias values must be in [-100, 100], "
                        f"got {b}.")

    def _verify_beam_search(self) -> None:
        if self.best_of == 1:
            raise ValueError(
                f"best_of must be > 1 when using beam search, got {self.best_of}.")
        if self.temperature > _SAMPLING_EPS:
            raise ValueError("temperature must be 0 when using beam search.")
        if self.top_p < 1.0 - _SAMPLING_EPS:
            raise ValueError("top_p must be 1 when using beam search.")
        if self.top_k != -1:
            raise ValueError("top_k must be -1 when using beam search.")

    def _verify_greedy_sampling(self) -> None:
        if self.best_of > 1:
            raise ValueError(
                f"best_of must be 1 when using greedy sampling, got {self.best_of}.")
        if self.top_p < 1.0 - _SAMPLING_EPS:
            raise ValueError("top_p must be 1 when using greedy sampling.")
        if self.top_k != -1:
            raise ValueError("top_k must be -1 when using greedy sampling.")

    def __repr__(self) -> str:
        return (f"SamplingParams(n={self.n}, best_of={self.best_of}, "
                f"presence_penalty={self.presence_penalty}, "
                f"frequency_penalty={self.frequency_penalty}, "
                f"temperature={self.temperature}, top_p={self.top_p}, "
                f"top_k={self.top_k}, use_beam_search={self.use_beam_search}, "
                f"stop={self.stop}, ignore_eos={self.ignore_eos}, "
                f"max_tokens={self.max_tokens}, logprobs={self.logprobs})")
