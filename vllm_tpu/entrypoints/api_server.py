"""Minimal HTTP inference server.

Capability parity: /root/reference/vllm/entrypoints/api_server.py —
POST /generate accepting {prompt, stream, <sampling params>},
streaming NUL-delimited JSON chunks, abort on client disconnect.

Built on aiohttp (this image has no FastAPI/uvicorn); the handler
surface and wire format match the reference exactly.
"""

import argparse
import asyncio
import json

from aiohttp import web

from vllm_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_tpu.logger import init_logger
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.utils import random_uuid

logger = init_logger(__name__)

ENGINE_KEY = web.AppKey("engine", AsyncLLMEngine)


async def generate(request: web.Request) -> web.StreamResponse:
    """Generate completion for the request.

    Body: {"prompt": str, "stream": bool, **SamplingParams kwargs}.
    Non-stream responses and each stream chunk are
    {"text": [prompt + completion, ...]} (one entry per n).
    """
    engine = request.app[ENGINE_KEY]
    body = await request.json()
    prompt = body.pop("prompt")
    stream = bool(body.pop("stream", False))
    try:
        sampling_params = SamplingParams(**body)
    except (ValueError, TypeError) as e:
        return web.json_response({"error": str(e)}, status=400)
    request_id = random_uuid()

    results = engine.generate(prompt, sampling_params, request_id)

    def payload(request_output) -> bytes:
        text = [
            request_output.prompt + output.text
            for output in request_output.outputs
        ]
        return (json.dumps({"text": text}) + "\0").encode()

    if stream:
        response = web.StreamResponse(
            headers={"Content-Type": "application/json"})
        await response.prepare(request)
        try:
            async for request_output in results:
                await response.write(payload(request_output))
        except (ConnectionResetError, asyncio.CancelledError):
            await engine.abort(request_id)
            raise
        await response.write_eof()
        return response

    final_output = None
    try:
        async for request_output in results:
            if request.transport is not None and request.transport.is_closing(
            ):
                await engine.abort(request_id)
                return web.json_response({"error": "client disconnected"},
                                         status=499)
            final_output = request_output
    except Exception:
        await engine.abort(request_id)
        raise
    assert final_output is not None
    text = [final_output.prompt + output.text
            for output in final_output.outputs]
    return web.json_response({"text": text})


async def health(request: web.Request) -> web.Response:
    return web.json_response({"status": "ok"})


def build_app(engine: AsyncLLMEngine) -> web.Application:
    app = web.Application()
    app[ENGINE_KEY] = engine
    app.router.add_post("/generate", generate)
    app.router.add_get("/health", health)
    return app


def main() -> None:
    parser = argparse.ArgumentParser(
        description="vllm-tpu simple API server")
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--dummy", action="store_true",
                        help="serve a tiny random model, no network")
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    tokenizer = None
    if args.dummy:
        from vllm_tpu.entrypoints.dummy import apply_dummy_args
        tokenizer = apply_dummy_args(args)
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args,
                                             tokenizer=tokenizer)
    web.run_app(build_app(engine), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
