"""Offline batched-generation entrypoint.

Capability parity: /root/reference/vllm/entrypoints/llm.py — the `LLM`
class: construct an engine from kwargs, `generate(prompts |
prompt_token_ids, sampling_params, use_tqdm)` running the step loop to
completion.
"""

from typing import Any, List, Optional, Union

from vllm_tpu.engine.arg_utils import EngineArgs
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.utils import Counter


class LLM:
    """Batteries-included offline generation over the TPU engine."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[Union[str, Any]] = None,
        tokenizer_mode: str = "auto",
        tensor_parallel_size: int = 1,
        dtype: str = "auto",
        seed: int = 0,
        **kwargs,
    ) -> None:
        if "disable_log_stats" not in kwargs:
            kwargs["disable_log_stats"] = True
        tokenizer_obj = None
        tokenizer_name = tokenizer
        if tokenizer is not None and not isinstance(tokenizer, str):
            tokenizer_obj = tokenizer  # pre-built tokenizer instance
            tokenizer_name = None
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer_name,
            tokenizer_mode=tokenizer_mode,
            tensor_parallel_size=tensor_parallel_size,
            dtype=dtype,
            seed=seed,
            **kwargs,
        )
        self.llm_engine = LLMEngine.from_engine_args(engine_args,
                                                     tokenizer=tokenizer_obj)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = True,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Provide prompts and/or prompt_token_ids.")
        if isinstance(prompts, str):
            prompts = [prompts]
        if (prompts is not None and prompt_token_ids is not None
                and len(prompts) != len(prompt_token_ids)):
            raise ValueError(
                "prompts and prompt_token_ids must have the same length.")
        if sampling_params is None:
            sampling_params = SamplingParams()

        num_requests = (len(prompts)
                        if prompts is not None else len(prompt_token_ids))
        for i in range(num_requests):
            self._add_request(
                prompts[i] if prompts is not None else None,
                sampling_params,
                prompt_token_ids[i] if prompt_token_ids is not None else None,
            )
        return self._run_engine(use_tqdm)

    def _add_request(self, prompt, sampling_params, token_ids) -> None:
        request_id = str(next(self.request_counter))
        self.llm_engine.add_request(request_id, prompt, sampling_params,
                                    token_ids)

    def _run_engine(self, use_tqdm: bool) -> List[RequestOutput]:
        pbar = None
        if use_tqdm:
            from tqdm import tqdm
            pbar = tqdm(total=self.llm_engine.get_num_unfinished_requests(),
                        desc="Processed prompts")
        outputs: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    outputs.append(output)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        # Restore submission order (steps finish out of order).
        outputs.sort(key=lambda o: int(o.request_id))
        return outputs
