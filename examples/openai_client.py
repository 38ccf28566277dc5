"""OpenAI-compatible client example.

Capability parity: /root/reference/examples/openai_client.py. The
reference uses the `openai` SDK; this image doesn't ship it, so the
same calls are made with plain HTTP (httpx) against the identical
/v1 surface — point any real OpenAI SDK at the same base_url and it
works.
Start the server first:
    python -m vllm_tpu.entrypoints.openai.api_server --model <model>
"""

import argparse
import json

import httpx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--prompt", type=str,
                        default="San Francisco is a")
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()
    base = f"http://{args.host}:{args.port}/v1"

    models = httpx.get(f"{base}/models").json()
    model = models["data"][0]["id"]
    print("Models:", [m["id"] for m in models["data"]])

    body = {
        "model": model,
        "prompt": args.prompt,
        "max_tokens": 32,
        "temperature": 0.8,
        "top_p": 0.95,
        "logprobs": 1,
        "n": 1,
        "stream": args.stream,
    }

    if not args.stream:
        completion = httpx.post(f"{base}/completions", json=body,
                                timeout=120).json()
        print("Completion result:", json.dumps(completion, indent=2))
        return

    with httpx.stream("POST", f"{base}/completions", json=body,
                      timeout=120) as r:
        for line in r.iter_lines():
            if not line.startswith("data: "):
                continue
            data = line[len("data: "):]
            if data == "[DONE]":
                break
            chunk = json.loads(data)
            print(chunk["choices"][0]["text"], end="", flush=True)
    print()


if __name__ == "__main__":
    main()
