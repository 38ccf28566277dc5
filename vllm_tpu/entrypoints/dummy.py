"""--dummy support for the API servers: a tiny on-disk OPT checkpoint
plus a char-level tokenizer, so servers can be driven end-to-end with
zero network egress (TPU hosts are commonly egress-less)."""

import tempfile


class CharTokenizer:
    """Char-level tokenizer over a small vocab."""

    def __init__(self, vocab_size: int = 128):
        self.vocab_size = vocab_size
        self.eos_token_id = None

    def encode(self, text):
        return [ord(c) % self.vocab_size for c in text]

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        if isinstance(ids, int):
            return chr(ids)
        return [chr(i) for i in ids]

    def convert_tokens_to_string(self, tokens):
        return "".join(tokens)

    def decode(self, ids, **kwargs):
        return "".join(chr(i) for i in ids)

    def get_added_vocab(self):
        return {}


def make_dummy_checkpoint(max_len: int = 64) -> str:
    """Write a tiny random OPT checkpoint to a temp dir, return path."""
    import torch
    import transformers as tf
    cfg = tf.OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=max_len,
                       word_embed_proj_dim=64)
    torch.manual_seed(0)
    path = tempfile.mkdtemp(prefix="vllm-tpu-dummy-")
    tf.OPTForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
    return path


def apply_dummy_args(args) -> "CharTokenizer":
    """Mutate parsed engine args for a dummy run; returns the tokenizer
    to pass to the engine."""
    args.model = make_dummy_checkpoint()
    args.dtype = "float32"
    args.block_size = 4
    args.num_device_blocks_override = 128
    args.swap_space = 0.01
    args.max_model_len = 64
    args.max_num_batched_tokens = 64
    args.max_num_seqs = 8
    args.max_prefill_seqs = 4
    return CharTokenizer()
