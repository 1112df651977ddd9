"""Engine tests: generate-mode parity with the oracle, continuous batching
state machine, prefill-vs-forced-feed output equality, request file I/O."""

import jax.numpy as jnp
import numpy as np
import pytest

from hip_llama_tpu.engine import InferenceEngine, Requests, read_inputfile, write_outputfile
from hip_llama_tpu.models import params_from_weights
from hip_llama_tpu.models import reference as ref
from hip_llama_tpu.sampler import Sampler
from hip_llama_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def toy_setup(tiny_cfg, tiny_weights, toy_tokenizer):
    # tiny vocab (512) > toy tokenizer vocab (269): fine, ids stay in range
    params = params_from_weights(tiny_weights, dtype=jnp.float32)
    return tiny_cfg, tiny_weights, params, toy_tokenizer


def make_engine(setup, **kw):
    cfg, w, params, tok = setup
    kw.setdefault("batch_size", 4)
    return InferenceEngine(cfg, params, tok, **kw)


def test_generate_greedy_matches_oracle(toy_setup):
    cfg, w, params, tok = toy_setup
    engine = make_engine(toy_setup)
    prompt = "hello hello"
    res = engine.generate(prompt, steps=24, sampler=Sampler(cfg.vocab_size, temperature=0.0))
    prompt_tokens = tok.encode(prompt, bos=True, eos=False)
    want_ids = ref.generate_greedy(cfg, w, prompt_tokens, n_steps=24)
    got_ids = prompt_tokens[1:] + res.token_ids  # engine emits prompt echo too
    # compare only the sampled continuation
    assert res.token_ids == want_ids[len(prompt_tokens) - 1 :]


def test_generate_prefill_equals_forced_feed(toy_setup):
    cfg, _, _, _ = toy_setup
    e1 = make_engine(toy_setup, use_prefill=True)
    e2 = make_engine(toy_setup, use_prefill=False)
    s1 = Sampler(cfg.vocab_size, temperature=0.0)
    s2 = Sampler(cfg.vocab_size, temperature=0.0)
    r1 = e1.generate("hello hello hello", steps=20, sampler=s1)
    r2 = e2.generate("hello hello hello", steps=20, sampler=s2)
    assert r1.token_ids == r2.token_ids
    assert r1.text == r2.text


def test_serve_continuous_batching(toy_setup):
    cfg, _, _, _ = toy_setup
    engine = make_engine(toy_setup, batch_size=2)
    reqs = Requests(
        prompts=["hello", "hello hello", "he", "llo hello", "o"],
        generations=[""] * 5,
    )
    gen_cnt = engine.serve(reqs, steps=16)
    assert gen_cnt > 0
    assert all(g.endswith("\n") for g in reqs.generations)


def test_serve_prefill_equals_forced_feed(toy_setup):
    cfg, _, _, _ = toy_setup
    prompts = ["hello", "hello hello", "he llo", "llo"]
    e1 = make_engine(toy_setup, batch_size=2, use_prefill=True)
    e2 = make_engine(toy_setup, batch_size=2, use_prefill=False)
    r1 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    r2 = Requests(prompts=list(prompts), generations=[""] * len(prompts))
    c1 = e1.serve(r1, steps=16)
    c2 = e2.serve(r2, steps=16)
    assert r1.generations == r2.generations
    assert c1 == c2


def test_serve_batch_size_invariance(toy_setup):
    """Generations must not depend on slot count (per-request fixed-seed
    samplers make this deterministic, like llama.cpp:897-900)."""
    prompts = ["hello", "he", "llo hello", "hello hello hello", "o he"]
    outs = []
    for bs in (1, 3):
        e = make_engine(toy_setup, batch_size=bs)
        r = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        e.serve(r, steps=12)
        outs.append(r.generations)
    assert outs[0] == outs[1]


def test_request_file_roundtrip(tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("3\nfirst prompt\nsecond prompt\nthird\n")
    reqs = read_inputfile(str(p))
    assert reqs.num_reqs == 3
    assert reqs.prompts == ["first prompt", "second prompt", "third"]
    reqs.generations = ["a\n", "b\n", "c\n"]
    out = tmp_path / "out.txt"
    write_outputfile(str(out), reqs)
    assert out.read_text() == "3\na\n\nb\n\nc\n\n"


def test_device_sampling_greedy_matches_host(tiny_cfg, tiny_weights, toy_tokenizer):
    """On-device greedy sampling must produce the same text as the host
    argmax sampler (bit-equivalent path; 4 bytes/slot fetched per step)."""
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.models import params_from_weights
    from hip_llama_tpu.sampler import Sampler

    params = params_from_weights(tiny_weights)
    eng_h = InferenceEngine(tiny_cfg, params, toy_tokenizer, batch_size=1)
    eng_d = InferenceEngine(
        tiny_cfg, params, toy_tokenizer, batch_size=1, device_sampling=True
    )
    a = eng_h.generate("hello", steps=24, sampler=Sampler(tiny_cfg.vocab_size, 0.0))
    b = eng_d.generate("hello", steps=24)
    assert a.text == b.text


def test_device_sampling_stochastic_valid(tiny_cfg, tiny_weights, toy_tokenizer):
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.models import params_from_weights

    params = params_from_weights(tiny_weights)
    eng = InferenceEngine(
        tiny_cfg, params, toy_tokenizer, batch_size=1,
        device_sampling=True, ds_temperature=1.0, ds_topp=0.9, ds_seed=7,
    )
    r1 = eng.generate("hello", steps=16)
    assert all(0 <= t < tiny_cfg.vocab_size for t in r1.token_ids)
    # different seed -> (almost surely) different sample stream
    eng2 = InferenceEngine(
        tiny_cfg, params, toy_tokenizer, batch_size=1,
        device_sampling=True, ds_temperature=1.0, ds_topp=0.9, ds_seed=8,
    )
    r2 = eng2.generate("hello", steps=16)
    assert isinstance(r2.text, str)


def test_chat_mode_scripted(tiny_cfg, tiny_weights, toy_tokenizer):
    """Chat loop drives turns end-to-end with scripted input (the reference
    declares chat but ships it disabled, llama.cpp:1578-1580)."""
    from hip_llama_tpu.chat import chat
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.models import params_from_weights

    params = params_from_weights(tiny_weights)
    eng = InferenceEngine(tiny_cfg, params, toy_tokenizer, batch_size=1)
    inputs = iter(["hello there", "hello again", "bye"])
    outputs = []

    def fake_input(prompt=""):
        return next(inputs)

    def fake_print(*args, **kw):
        outputs.append(" ".join(str(a) for a in args))

    chat(eng, None, "be brief", steps=48, temperature=0.0, topp=0.9, seed=1,
         input_fn=fake_input, output_fn=fake_print)
    text = "".join(outputs)
    assert "Assistant:" in text


def test_overlong_prompt_truncates_at_step_budget(tiny_weights, toy_tokenizer):
    """A prompt longer than the step budget truncates at it (the reference's
    pos < steps bound, llama.cpp:540) instead of clamp-writing KV rows past
    the window; co-batched requests are unaffected."""
    from hip_llama_tpu.config import tiny_config

    cfg = tiny_config(seq_len=32)
    params = params_from_weights(tiny_weights)
    long_prompt = "hello " * 80  # far beyond the 32-token window

    eng = InferenceEngine(cfg, params, toy_tokenizer, batch_size=1,
                          max_seq_len=32)
    r = eng.generate(long_prompt, steps=32, sampler=Sampler(cfg.vocab_size, 0.0))
    assert r.n_gen_tokens <= 32 and r.token_ids == []  # echo only, no gen

    def serve(prompts, paged=False):
        e = InferenceEngine(cfg, params, toy_tokenizer, batch_size=2,
                            max_seq_len=32, paged=paged, page_size=8)
        reqs = Requests(prompts=list(prompts), generations=[""] * len(prompts))
        e.serve(reqs, steps=32,
                samplers=[Sampler(cfg.vocab_size, 0.0) for _ in prompts])
        return reqs.generations

    solo = serve(["hi there"])[0]
    for paged in (False, True):
        outs = serve([long_prompt, "hi there"], paged=paged)
        assert outs[1] == solo, f"co-batched request corrupted (paged={paged})"


@pytest.mark.parametrize("temperature", [0.0, 0.9])
def test_chat_prefill_matches_force_feed(tiny_cfg, tiny_weights, toy_tokenizer,
                                         temperature):
    """Chat's chunked-prefill prompt consumption must produce the same
    transcript as the force-feed loop (use_prefill=False engine) — including
    at temperature > 0, where force-feeding draws one discarded RNG coin per
    forced token and the prefill path advances the RNG by the same count."""
    from hip_llama_tpu.chat import chat
    from hip_llama_tpu.engine import InferenceEngine
    from hip_llama_tpu.models import params_from_weights

    params = params_from_weights(tiny_weights)

    def run(use_prefill):
        eng = InferenceEngine(tiny_cfg, params, toy_tokenizer, batch_size=1,
                              use_prefill=use_prefill)
        inputs = iter(["hello there hello there hello", "hello again", "bye"])
        outputs = []
        chat(eng, None, "be very brief and helpful", steps=56,
             temperature=temperature, topp=0.9, seed=7,
             input_fn=lambda prompt="": next(inputs),
             output_fn=lambda *a, **k: outputs.append(
                 " ".join(str(x) for x in a)))
        return outputs

    assert run(True) == run(False)


def test_chunked_serve_matches_single_step():
    """Multi-step scheduling (chunk_steps=4, greedy on-device sampling) must
    produce byte-identical generations to the per-step host-argmax loop —
    post-EOS chunk-tail tokens are discarded, never emitted."""
    import jax.numpy as jnp

    from hip_llama_tpu.config import ModelConfig
    from hip_llama_tpu.engine.engine import InferenceEngine
    from hip_llama_tpu.engine.requests import Requests
    from hip_llama_tpu.io.checkpoint import random_weights
    from hip_llama_tpu.models.params import params_from_weights
    from hip_llama_tpu.sampler import Sampler

    cfg = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=2,
                      n_kv_heads=2, vocab_size=256, seq_len=64)
    params = params_from_weights(random_weights(cfg, seed=21))

    class _Tok:
        bos_id, eos_id = 1, 2
        def encode(self, text, bos=True, eos=False):
            return ([1] if bos else []) + [3 + (ord(c) % 200) for c in text]
        def decode_piece(self, prev, tok):
            return (chr(97 + tok % 26)).encode()

    def run(chunk):
        eng = InferenceEngine(cfg, params, _Tok(), batch_size=2,
                              attn_impl="xla", max_seq_len=48,
                              chunk_steps=chunk)
        reqs = Requests(prompts=["ab", "wxyz", "m"], generations=[""] * 3)
        samplers = [Sampler(cfg.vocab_size, 0.0, 0.9, 314028) for _ in range(3)]
        n = eng.serve(reqs, steps=21, samplers=samplers)
        return n, list(reqs.generations)

    n1, g1 = run(chunk=1)
    n4, g4 = run(chunk=4)
    assert g1 == g4
    assert n1 == n4
