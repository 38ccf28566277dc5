"""Offline batched generation example.

Capability parity: /root/reference/examples/offline_inference.py.
With --dummy it builds a tiny OPT checkpoint on the fly (no network)
so the example runs anywhere, including CPU
(JAX_PLATFORMS handled automatically by the engine).
"""

import argparse

from vllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="facebook/opt-125m")
    parser.add_argument("--dummy", action="store_true",
                        help="tiny random OPT + char tokenizer, no network")
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--temperature", type=float, default=0.8)
    args = parser.parse_args()

    prompts = [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
    sampling_params = SamplingParams(temperature=args.temperature,
                                     top_p=0.95,
                                     max_tokens=args.max_tokens,
                                     ignore_eos=args.dummy)

    if args.dummy:
        import tempfile

        import torch
        import transformers as tf

        class CharTokenizer:
            vocab_size = 128
            eos_token_id = None

            def encode(self, text):
                return [ord(c) % 128 for c in text]

            def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
                return chr(ids) if isinstance(ids, int) else [
                    chr(i) for i in ids
                ]

            def convert_tokens_to_string(self, tokens):
                return "".join(tokens)

            def get_added_vocab(self):
                return {}

        cfg = tf.OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=64,
                           word_embed_proj_dim=64)
        torch.manual_seed(0)
        path = tempfile.mkdtemp(prefix="opt-tiny-")
        tf.OPTForCausalLM(cfg).save_pretrained(path, safe_serialization=True)
        llm = LLM(model=path, tokenizer=CharTokenizer(), dtype="float32",
                  block_size=4, num_device_blocks_override=128,
                  max_model_len=64, max_num_batched_tokens=64,
                  swap_space=0.01)
    else:
        llm = LLM(model=args.model)

    outputs = llm.generate(prompts, sampling_params)
    for output in outputs:
        print(f"Prompt: {output.prompt!r}, "
              f"Generated: {output.outputs[0].text!r}")


if __name__ == "__main__":
    main()
