"""Browser playground for the engine's simple REST API.

A small gradio UI that streams completions from a running api_server
through the NUL-delimited /generate protocol (reusing the stdlib
client in examples/api_client.py). `gradio` is not shipped in this
image — install it wherever you run the UI:
    pip install gradio
    python -m vllm_tpu.entrypoints.api_server --model <model> --port 8000
    python examples/gradio_webserver.py --api-url http://localhost:8000/generate
"""

import argparse

from api_client import generate_stream

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise SystemExit(
        "gradio is not installed; `pip install gradio` to run this UI"
    ) from e


def build_ui(api_url: str):

    def complete(prompt, max_tokens, temperature):
        payload = {
            "prompt": prompt,
            "max_tokens": int(max_tokens),
            "temperature": float(temperature),
        }
        for texts in generate_stream(api_url, payload):
            yield texts[0]

    with gr.Blocks(title="vllm_tpu playground") as ui:
        gr.Markdown("## vllm_tpu completion playground")
        prompt = gr.Textbox(label="Prompt", lines=4,
                            placeholder="Type a prompt, then press Generate")
        with gr.Row():
            max_tokens = gr.Slider(1, 512, value=128, step=1,
                                   label="max_tokens")
            temperature = gr.Slider(0.0, 2.0, value=0.7, step=0.05,
                                    label="temperature")
        run = gr.Button("Generate", variant="primary")
        output = gr.Textbox(label="Completion", lines=8)
        run.click(complete, [prompt, max_tokens, temperature], [output])
        prompt.submit(complete, [prompt, max_tokens, temperature], [output])
    return ui


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--api-url",
                        default="http://localhost:8000/generate")
    args = parser.parse_args()
    build_ui(args.api_url).queue().launch(server_name=args.host,
                                          server_port=args.port)


if __name__ == "__main__":
    main()
