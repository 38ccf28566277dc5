import pytest

from vllm_tpu.sampling_params import SamplingParams


def test_defaults():
    p = SamplingParams()
    assert p.n == 1 and p.best_of == 1
    assert p.sampling_type == "random"
    assert p.stop == []


def test_greedy():
    p = SamplingParams(temperature=0.0)
    assert p.is_greedy and p.sampling_type == "greedy"


def test_greedy_invariants():
    with pytest.raises(ValueError):
        SamplingParams(temperature=0.0, best_of=2)
    with pytest.raises(ValueError):
        SamplingParams(temperature=0.0, top_p=0.5)
    with pytest.raises(ValueError):
        SamplingParams(temperature=0.0, top_k=5)


def test_beam_invariants():
    p = SamplingParams(use_beam_search=True, best_of=4, temperature=0.0)
    assert p.sampling_type == "beam"
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=1, temperature=0.0)
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=4, temperature=0.7)
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=4, temperature=0.0,
                       top_k=5)


def test_range_validation():
    with pytest.raises(ValueError):
        SamplingParams(n=0)
    with pytest.raises(ValueError):
        SamplingParams(n=3, best_of=2)
    with pytest.raises(ValueError):
        SamplingParams(presence_penalty=3.0)
    with pytest.raises(ValueError):
        SamplingParams(frequency_penalty=-2.5)
    with pytest.raises(ValueError):
        SamplingParams(temperature=-0.1)
    with pytest.raises(ValueError):
        SamplingParams(top_p=0.0)
    with pytest.raises(ValueError):
        SamplingParams(top_k=0)
    with pytest.raises(ValueError):
        SamplingParams(max_tokens=0)
    with pytest.raises(ValueError):
        SamplingParams(logprobs=-1)


def test_stop_normalization():
    assert SamplingParams(stop="foo").stop == ["foo"]
    assert SamplingParams(stop=["a", "b"]).stop == ["a", "b"]


def test_logprobs_capped_at_device_bucket():
    """MAX_LOGPROBS must track the worker's largest top-k bucket: a
    validated-but-unbucketable count would raise inside engine.step()
    and kill the shared step loop."""
    from vllm_tpu.sampling_params import MAX_LOGPROBS
    from vllm_tpu.worker.worker import TOPK_BUCKETS
    assert MAX_LOGPROBS == TOPK_BUCKETS[-1]
    SamplingParams(logprobs=MAX_LOGPROBS)
    with pytest.raises(ValueError):
        SamplingParams(logprobs=MAX_LOGPROBS + 1)
    with pytest.raises(ValueError):
        SamplingParams(prompt_logprobs=MAX_LOGPROBS + 1)
