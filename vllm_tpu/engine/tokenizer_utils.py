"""Tokenizer loading + incremental detokenization.

Capability parity: /root/reference/vllm/engine/tokenizer_utils.py —
get_tokenizer with the LLaMA fast-tokenizer guidance (:25-31) and
detokenize_incrementally (:43-88): convert the one new id to a token,
then re-join the full output (with the added-token special path).
"""

from typing import List, Tuple, Union

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)

_SLOW_LLAMA_WARNING = (
    "For LLaMA-family models the fast tokenizer is substantially quicker; "
    "converted checkpoints should include tokenizer.json.")


def get_tokenizer(tokenizer_name: str,
                  tokenizer_mode: str = "auto",
                  **kwargs):
    from transformers import AutoTokenizer
    if tokenizer_mode == "slow":
        kwargs["use_fast"] = False
    try:
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_name, **kwargs)
    except ValueError as e:
        raise e
    if ("llama" in tokenizer_name.lower()
            and getattr(tokenizer, "is_fast", True) is False):
        logger.warning(_SLOW_LLAMA_WARNING)
    return tokenizer


def detokenize_incrementally(
    tokenizer,
    prev_output_tokens: List[str],
    new_token_id: int,
    skip_special_tokens: bool = False,
) -> Tuple[str, str]:
    """Returns (new_token, full_output_text) after appending one id."""
    new_token: Union[str, None] = tokenizer.convert_ids_to_tokens(
        new_token_id, skip_special_tokens=skip_special_tokens)
    output_tokens = prev_output_tokens + [new_token]

    # Added (user-defined) tokens don't round-trip through
    # convert_tokens_to_string; splice them in with spaces.
    added = set(tokenizer.get_added_vocab())
    if not added.intersection(output_tokens):
        return new_token, tokenizer.convert_tokens_to_string(output_tokens)
    sub_texts = []
    current: List[str] = []
    for token in output_tokens:
        if token in added:
            if current:
                sub_texts.append(tokenizer.convert_tokens_to_string(current))
                current = []
            sub_texts.append(token)
        else:
            current.append(token)
    if current:
        sub_texts.append(tokenizer.convert_tokens_to_string(current))
    return new_token, " ".join(sub_texts)
