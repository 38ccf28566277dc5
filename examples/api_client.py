"""Minimal client for the engine's simple REST API.

Wire protocol (see vllm_tpu/entrypoints/api_server.py):
  POST /generate  body: JSON with "prompt", sampling parameters, and
  "stream". Non-streaming responses are one JSON object
  {"text": [...]}; streaming responses are a sequence of JSON objects
  separated by NUL bytes, each carrying the full text so far.

Uses only the standard library. Start a server first:
    python -m vllm_tpu.entrypoints.api_server --model <model>
"""

import argparse
import json
import urllib.request


def _request(api_url: str, payload: dict):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(api_url, data=data,
                                 headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req)


def generate(api_url: str, payload: dict) -> list:
    """Blocking call; returns the completed texts."""
    with _request(api_url, {**payload, "stream": False}) as resp:
        return json.loads(resp.read())["text"]


def generate_stream(api_url: str, payload: dict):
    """Yields the candidate texts each time the server emits a chunk."""
    buf = b""
    with _request(api_url, {**payload, "stream": True}) as resp:
        while True:
            block = resp.read(4096)
            if not block:
                break
            buf += block
            while b"\0" in buf:
                chunk, buf = buf.split(b"\0", 1)
                if chunk:
                    yield json.loads(chunk)["text"]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--prompt", default="The capital of France is")
    parser.add_argument("--n", type=int, default=1,
                        help="number of completions (n > 1 uses beam search)")
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    api_url = f"http://{args.host}:{args.port}/generate"
    payload = {
        "prompt": args.prompt,
        "n": args.n,
        "best_of": args.n if args.n > 1 else None,
        "use_beam_search": args.n > 1,
        "temperature": args.temperature,
        "max_tokens": args.max_tokens,
    }
    payload = {k: v for k, v in payload.items() if v is not None}

    print(f"prompt: {args.prompt!r}")
    if args.stream:
        shown = 0
        for texts in generate_stream(api_url, payload):
            # Print only what's new on candidate 0; show the rest at
            # the end.
            new = texts[0][shown:]
            shown = len(texts[0])
            print(new, end="", flush=True)
        print()
    else:
        for i, text in enumerate(generate(api_url, payload)):
            print(f"[{i}] {text!r}")


if __name__ == "__main__":
    main()
