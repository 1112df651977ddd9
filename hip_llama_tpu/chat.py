"""Interactive chat mode with the Llama-2 chat schema.

The reference declares chat in its CLI but ships it disabled
(src/llama.cpp:1578-1580 calls a commented-out function); the working
implementation it inherited lives in run.cc:942-1022. This is a re-design of
that loop on top of the engine's jitted decode step, with the same
[INST] <<SYS>> rendering and EOS-ends-turn behavior.

BEYOND the reference loop: each turn's prompt is consumed by the engine's
CHUNKED PREFILL instead of one decode step per token (run.cc force-feeds,
like generate's llama.cpp:1030-1033) — long system prompts and pasted
context cost one prefill dispatch instead of len(prompt) sequential steps.
Output parity with the force-feed loop is exact: at temperature > 0 the
reference samples (and discards) one RNG coin per forced token, so the
prefill path advances the sampler RNG by the same count."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.sampler import Sampler
from hip_llama_tpu.tokenizer import EOS_ID, printable_piece


def render_turn(user_prompt: str, system_prompt: str | None, first_turn: bool) -> str:
    if first_turn and system_prompt:
        return f"[INST] <<SYS>>\n{system_prompt}\n<</SYS>>\n\n{user_prompt} [/INST]"
    return f"[INST] {user_prompt} [/INST]"


def chat(
    engine,
    cli_user_prompt: str | None,
    cli_system_prompt: str | None,
    steps: int,
    temperature: float,
    topp: float,
    seed: int,
    input_fn=input,
    output_fn=print,
) -> None:
    cfg = engine.cfg
    sampler = Sampler(cfg.vocab_size, temperature, topp, seed)
    cache = engine.new_cache(batch=1)

    pos = 0
    user_turn = True
    next_tok = 0
    prompt_tokens: list[int] = []
    user_idx = 0

    while pos < steps:
        if user_turn:
            if pos == 0:
                system_prompt = (
                    cli_system_prompt
                    if cli_system_prompt is not None
                    else input_fn("Enter system prompt (optional): ")
                )
                user_prompt = (
                    cli_user_prompt
                    if cli_user_prompt is not None
                    else input_fn("User: ")
                )
            else:
                system_prompt = None
                user_prompt = input_fn("User: ")
            rendered = render_turn(user_prompt, system_prompt, first_turn=pos == 0)
            prompt_tokens = engine.tokenizer.encode(rendered, bos=True, eos=False)
            user_idx = 0
            user_turn = False
            output_fn("Assistant: ", end="")
            if engine.use_prefill and len(prompt_tokens) > 1:
                # chunked prefill of the turn's prompt (all but the last
                # token, whose step yields the first assistant logits);
                # capped so the pos < steps budget is honored exactly like
                # the force-feed loop, and stopping at any literal EOS so
                # the fed-token EOS check below still fires
                n_pre = min(len(prompt_tokens) - 1, steps - pos)
                if EOS_ID in prompt_tokens[:n_pre]:
                    n_pre = prompt_tokens.index(EOS_ID)
                if n_pre > 0:
                    _, cache = engine._prefill_tokens(
                        cache, 1, {0: prompt_tokens[:n_pre]}, {0: pos}
                    )
                    if sampler.temperature != 0.0:
                        # force-feeding would have drawn one coin per step
                        for _ in range(n_pre):
                            sampler.rng.next_f32()
                    pos += n_pre
                    user_idx = n_pre
                    if pos >= steps:
                        break

        if user_idx < len(prompt_tokens):
            token = prompt_tokens[user_idx]
            user_idx += 1
        else:
            token = next_tok
        if token == EOS_ID:
            user_turn = True

        logits, cache = engine._step(
            engine.params, cache, jnp.array([token]), jnp.array([pos], jnp.int32)
        )
        next_tok = sampler.sample(np.asarray(logits[0]))
        pos += 1

        if user_idx >= len(prompt_tokens) and next_tok != EOS_ID:
            piece = printable_piece(engine.tokenizer.decode_piece(token, next_tok))
            output_fn(piece.decode("utf-8", errors="replace"), end="", flush=True)
        if next_tok == EOS_ID:
            output_fn("")
    output_fn("")
