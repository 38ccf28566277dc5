"""OpenAI-compatible API server.

Capability parity: /root/reference/vllm/entrypoints/openai/api_server.py
— GET /v1/models, POST /v1/completions with SSE streaming
(`data: <json>\\n\\n` chunks terminated by `data: [DONE]\\n\\n`),
logprobs formatting, usage accounting, abort on disconnect, model-name
check, rejection of suffix, fake streaming when n != best_of
(beam/parallel sampling can't stream incrementally), and the
served-model-name CLI. Built on aiohttp (no FastAPI in image).

Beyond the reference (which rejects all three,
api_server.py:107-120): multi-prompt batches, echo (including
echo+logprobs via the engine's prompt-logprob prefill variant), and
logit_bias.
"""

import argparse
import asyncio
import json
from typing import AsyncIterator, Dict, List, Optional

from aiohttp import web

from vllm_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse, ErrorResponse,
    LogProbs, ModelCard, ModelList, ModelPermission, UsageInfo)
from vllm_tpu.logger import init_logger
from vllm_tpu.outputs import RequestOutput
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.utils import random_uuid

logger = init_logger(__name__)

ENGINE_KEY = web.AppKey("engine", AsyncLLMEngine)
SERVED_MODEL_KEY = web.AppKey("served_model", str)


def error_response(message: str, status: int = 400) -> web.Response:
    err = ErrorResponse(message=message, type="invalid_request_error")
    return web.json_response(err.model_dump(), status=status)


async def show_available_models(request: web.Request) -> web.Response:
    served_model = request.app[SERVED_MODEL_KEY]
    cards = ModelList(data=[
        ModelCard(id=served_model, root=served_model,
                  permission=[ModelPermission()])
    ])
    return web.json_response(cards.model_dump())


def _create_logprobs(
    tokenizer,
    token_ids: List[int],
    id_logprobs: List[Dict[int, float]],
    initial_text_offset: int = 0,
) -> LogProbs:
    """Parity: openai/api_server.py:66-85. A None entry in
    ``id_logprobs`` (a sequence's first prompt position under
    echo+logprobs — no preceding context) yields null
    logprob/top_logprobs for that token, as OpenAI does."""
    logprobs = LogProbs()
    last_token_len = 0
    for token_id, id_logprob in zip(token_ids, id_logprobs):
        token = tokenizer.convert_ids_to_tokens(token_id)
        logprobs.tokens.append(token)
        if id_logprob is None:
            logprobs.token_logprobs.append(None)
            logprobs.top_logprobs.append(None)
        else:
            logprobs.token_logprobs.append(id_logprob[token_id])
            logprobs.top_logprobs.append({
                tokenizer.convert_ids_to_tokens(i): p
                for i, p in id_logprob.items()
            })
        if len(logprobs.text_offset) == 0:
            logprobs.text_offset.append(initial_text_offset)
        else:
            logprobs.text_offset.append(logprobs.text_offset[-1] +
                                        last_token_len)
        last_token_len = len(token)
    return logprobs


def _normalize_prompts(prompt):
    """OpenAI `prompt` field -> list of (text, token_ids) pairs, or an
    error string. Accepts a string, a token-id list, a list of
    strings, or a list of token-id lists."""
    if isinstance(prompt, str):
        if not prompt:
            # A zero-token prompt would only fail deep inside the
            # engine's step loop (as a stream-killing 500); reject at
            # the wire like the empty token-list form below.
            return "prompt entries must not be empty"
        return [(prompt, None)]
    if not isinstance(prompt, list) or len(prompt) == 0:
        return "please provide at least one prompt"
    if isinstance(prompt[0], int):
        return [(None, prompt)]  # one tokenized prompt
    out = []
    for p in prompt:
        if isinstance(p, (str, list)) and not p:
            # A zero-length prompt has no last token to sample from —
            # the prefill packer would index row -1 and return garbage.
            return "prompt entries must not be empty"
        if isinstance(p, str):
            out.append((p, None))
        elif isinstance(p, list) and isinstance(p[0], int):
            out.append((None, p))
        else:
            return "prompt entries must be strings or token-id lists"
    return out


class _ClientDisconnected(Exception):
    pass


async def create_completion(request: web.Request) -> web.StreamResponse:
    engine = request.app[ENGINE_KEY]
    served_model = request.app[SERVED_MODEL_KEY]
    try:
        body = CompletionRequest(**(await request.json()))
    except Exception as e:
        return error_response(f"invalid request: {e}")
    logger.info("Received completion request: %s", body)

    if body.model != served_model:
        err = ErrorResponse(message=f"The model `{body.model}` does not exist.",
                            type="invalid_request_error", code="404")
        return web.json_response(err.model_dump(), status=404)
    want_prompt_logprobs = body.echo and body.logprobs is not None
    if (want_prompt_logprobs and
            not engine.engine.scheduler_config.enable_prompt_logprobs):
        return error_response(
            "echo with logprobs is disabled on this server "
            "(started with --disable-prompt-logprobs)")
    if body.suffix is not None:
        return error_response("suffix is not currently supported")

    request_id = f"cmpl-{random_uuid()}"
    # Multi-prompt batches are supported (beyond the reference, which
    # rejected them, api_server.py:100-105): each prompt becomes its
    # own engine request; choice index = prompt_index * n + sample.
    prompts = _normalize_prompts(body.prompt)
    if isinstance(prompts, str):
        return error_response(prompts)

    try:
        # OpenAI wire format carries logit_bias token ids as STRING
        # keys; non-numeric keys land in this except like any other
        # bad sampling parameter.
        logit_bias = ({int(t): float(b) for t, b in body.logit_bias.items()}
                      if body.logit_bias else None)
        sampling_params = SamplingParams(
            n=body.n,
            best_of=body.best_of,
            presence_penalty=body.presence_penalty,
            frequency_penalty=body.frequency_penalty,
            temperature=body.temperature,
            top_p=body.top_p,
            top_k=body.top_k,
            stop=body.stop,
            ignore_eos=body.ignore_eos,
            max_tokens=body.max_tokens,
            logprobs=body.logprobs,
            use_beam_search=body.use_beam_search,
            logit_bias=logit_bias,
            prompt_logprobs=body.logprobs if want_prompt_logprobs else None,
        )
    except ValueError as e:
        return error_response(str(e))

    n_prompts = len(prompts)
    sub_ids = ([request_id] if n_prompts == 1 else
               [f"{request_id}-{i}" for i in range(n_prompts)])
    generators = [
        engine.generate(text, sampling_params, sid, prompt_token_ids=ids)
        for (text, ids), sid in zip(prompts, sub_ids)
    ]

    async def abort_all():
        for sid in sub_ids:
            await engine.abort(sid)

    tokenizer = engine.engine.tokenizer
    model_name = body.model
    created_time = int(__import__("time").time())

    # Streaming is incremental only when each step's partial outputs
    # are the final n sequences (parity: api_server.py:149-158).
    stream = (body.stream and
              (sampling_params.best_of == sampling_params.n)
              and not sampling_params.use_beam_search)

    def prompt_text(final_res: RequestOutput) -> str:
        if final_res.prompt is not None:
            return final_res.prompt
        return tokenizer.decode(final_res.prompt_token_ids)

    def make_stream_chunk(index: int, text: str,
                          logprobs: Optional[LogProbs] = None,
                          finish_reason: Optional[str] = None) -> bytes:
        choice = CompletionResponseStreamChoice(index=index, text=text,
                                                logprobs=logprobs,
                                                finish_reason=finish_reason)
        chunk = CompletionStreamResponse(id=request_id, created=created_time,
                                         model=model_name, choices=[choice])
        data = chunk.model_dump_json(exclude_unset=False)
        return f"data: {data}\n\n".encode()

    if stream:
        response = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await response.prepare(request)
        if body.echo and not want_prompt_logprobs:
            # OpenAI echo semantics under streaming: the prompt text
            # arrives as each choice's first chunk. (With logprobs the
            # echo chunk must carry the PROMPT logprobs, which only
            # exist after the prefill step — emitted on each prompt's
            # first result below instead.)
            for i, (text, ids) in enumerate(prompts):
                ptext = text if text is not None else tokenizer.decode(ids)
                for j in range(body.n):
                    await response.write(
                        make_stream_chunk(i * body.n + j, ptext))
        echo_pending = [want_prompt_logprobs] * n_prompts
        previous_texts = [[""] * body.n for _ in range(n_prompts)]
        previous_num_tokens = [[0] * body.n for _ in range(n_prompts)]
        # With echo, each choice's accumulated text starts with the
        # echoed prompt, so completion logprobs' text_offset must
        # continue AFTER it (matching the non-streaming path, where one
        # LogProbs covers prompt + completion contiguously).
        echo_len = [0] * n_prompts
        if body.echo:
            for i, (text, ids) in enumerate(prompts):
                echo_len[i] = len(
                    text if text is not None else tokenizer.decode(ids))

        # All prompts' streams merge into one queue; chunks interleave
        # as tokens arrive, each tagged with its global choice index.
        queue: asyncio.Queue = asyncio.Queue()

        async def pump(i: int, gen) -> None:
            try:
                async for res in gen:
                    await queue.put((i, res))
            except Exception as e:  # noqa: BLE001 — forwarded
                await queue.put((i, e))
            finally:
                await queue.put((i, None))

        tasks = [
            asyncio.get_running_loop().create_task(pump(i, gen))
            for i, gen in enumerate(generators)
        ]
        try:
            open_streams = n_prompts
            while open_streams:
                i, item = await queue.get()
                if item is None:
                    open_streams -= 1
                    continue
                if isinstance(item, Exception):
                    raise item
                if echo_pending[i]:
                    echo_pending[i] = False
                    ptext = prompt_text(item)
                    plp = _create_logprobs(tokenizer, item.prompt_token_ids,
                                           item.prompt_logprobs or
                                           [None] * len(item.prompt_token_ids))
                    for j in range(body.n):
                        await response.write(
                            make_stream_chunk(i * body.n + j, ptext, plp))
                for output in item.outputs:
                    j = output.index
                    prev_text = previous_texts[i][j]
                    delta_text = output.text[len(prev_text):]
                    logprobs = None
                    if body.logprobs is not None:
                        taken = previous_num_tokens[i][j]
                        logprobs = _create_logprobs(
                            tokenizer, output.token_ids[taken:],
                            output.logprobs[taken:],
                            echo_len[i] + len(prev_text))
                    previous_texts[i][j] = output.text
                    previous_num_tokens[i][j] = len(output.token_ids)
                    await response.write(
                        make_stream_chunk(i * body.n + j, delta_text,
                                          logprobs, output.finish_reason))
            await response.write(b"data: [DONE]\n\n")
            await response.write_eof()
        except BaseException:
            # Any failure mid-stream (disconnect, cancellation, or one
            # prompt's generator raising) must release EVERY sibling
            # engine request — they would otherwise keep consuming
            # engine capacity after the response is dead.
            await abort_all()
            raise
        finally:
            for task in tasks:
                task.cancel()
        return response

    # Non-streaming (or fake-streamed) path.
    finals: List[Optional[RequestOutput]] = [None] * n_prompts

    async def consume(i: int, gen) -> None:
        async for res in gen:
            if (request.transport is not None
                    and request.transport.is_closing()):
                raise _ClientDisconnected()
            finals[i] = res

    try:
        await asyncio.gather(*(consume(i, g)
                               for i, g in enumerate(generators)))
    except _ClientDisconnected:
        await abort_all()
        return error_response("client disconnected", status=499)
    except Exception:
        await abort_all()
        raise
    assert all(res is not None for res in finals)

    choices = []
    for i, final_res in enumerate(finals):
        for output in final_res.outputs:
            logprobs = None
            if body.logprobs is not None:
                if want_prompt_logprobs:
                    # echo+logprobs: one LogProbs covering prompt then
                    # completion tokens (entry 0 null — no context).
                    plp = (final_res.prompt_logprobs or
                           [None] * len(final_res.prompt_token_ids))
                    logprobs = _create_logprobs(
                        tokenizer,
                        final_res.prompt_token_ids + output.token_ids,
                        list(plp) + list(output.logprobs))
                else:
                    logprobs = _create_logprobs(tokenizer, output.token_ids,
                                                output.logprobs)
            text = output.text
            if body.echo:
                text = prompt_text(final_res) + text
            choices.append(
                CompletionResponseChoice(index=i * body.n + output.index,
                                         text=text,
                                         logprobs=logprobs,
                                         finish_reason=output.finish_reason))

    num_prompt_tokens = sum(len(res.prompt_token_ids) for res in finals)
    num_generated_tokens = sum(
        len(output.token_ids) for res in finals for output in res.outputs)
    usage = UsageInfo(prompt_tokens=num_prompt_tokens,
                      completion_tokens=num_generated_tokens,
                      total_tokens=num_prompt_tokens + num_generated_tokens)
    completion = CompletionResponse(id=request_id, created=created_time,
                                    model=model_name, choices=choices,
                                    usage=usage)

    if body.stream:
        # Fake streaming: one full chunk then [DONE]
        # (parity: api_server.py:259-266).
        response = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"})
        await response.prepare(request)
        for choice in completion.choices:
            await response.write(
                make_stream_chunk(choice.index, choice.text, choice.logprobs,
                                  choice.finish_reason))
        await response.write(b"data: [DONE]\n\n")
        await response.write_eof()
        return response

    return web.json_response(completion.model_dump())


@web.middleware
async def cors_middleware(request: web.Request, handler):
    response = await handler(request)
    response.headers["Access-Control-Allow-Origin"] = "*"
    response.headers["Access-Control-Allow-Methods"] = "*"
    response.headers["Access-Control-Allow-Headers"] = "*"
    return response


def build_app(engine: AsyncLLMEngine, served_model: str,
              allow_cors: bool = False) -> web.Application:
    app = web.Application(middlewares=[cors_middleware] if allow_cors else [])
    app[ENGINE_KEY] = engine
    app[SERVED_MODEL_KEY] = served_model
    app.router.add_get("/v1/models", show_available_models)
    app.router.add_post("/v1/completions", create_completion)
    return app


def main() -> None:
    parser = argparse.ArgumentParser(
        description="vllm-tpu OpenAI-compatible API server")
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--allow-cors", action="store_true",
                        help="allow all CORS origins/methods/headers")
    parser.add_argument(
        "--served-model-name", type=str, default=None,
        help="model name used in the API; defaults to --model")
    parser.add_argument("--dummy", action="store_true",
                        help="serve a tiny random model, no network")
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    tokenizer = None
    if args.dummy:
        from vllm_tpu.entrypoints.dummy import apply_dummy_args
        tokenizer = apply_dummy_args(args)
    served_model = args.served_model_name or args.model
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args,
                                             tokenizer=tokenizer)
    logger.info("Serving model %s at http://%s:%d/v1", served_model,
                args.host, args.port)
    web.run_app(build_app(engine, served_model, args.allow_cors),
                host=args.host, port=args.port)


if __name__ == "__main__":
    main()
