"""Inference engine: single-prompt generation and continuous batching.

TPU re-design of the reference's schedulers (SURVEY.md N24):
- the reference runs one OS thread per GPU, each with a `batch_size`-slot
  continuous-batching loop (src/llama.cpp:891-1083). Here the whole batch is
  ONE fixed-shape jitted step on a (possibly sharded) device mesh; the slot
  state machine lives on the host exactly like the reference's
  (fill / step / sample / retire on BOS-or-EOS-or-length, llama.cpp:968-1073).
- new requests are chunk-prefilled (bucketed shapes, bounded recompiles)
  instead of being force-fed one token per step — strictly fewer steps per
  prompt than the reference while keeping behavioral parity for outputs.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from hip_llama_tpu.config import ModelConfig
from hip_llama_tpu.engine.block_manager import BlockManager, OutOfPagesError
from hip_llama_tpu.engine.requests import Requests
from hip_llama_tpu.models.llama import KVCache, init_kv_cache, make_decode_step, make_prefill
from hip_llama_tpu.models.params import LlamaParams
from hip_llama_tpu.sampler import Sampler, request_sampler
from hip_llama_tpu.tokenizer import BOS_ID, EOS_ID, Tokenizer, printable_piece


@dataclasses.dataclass
class GenerationResult:
    text: str
    token_ids: list[int]
    n_gen_tokens: int
    elapsed_s: float
    ttft_s: float

    @property
    def tok_per_s(self) -> float:
        return self.n_gen_tokens / self.elapsed_s if self.elapsed_s > 0 else 0.0


class SharedRequestQueue:
    """Thread-safe FIFO of request indices — the multi-replica serving
    topology of the reference: N independent engine replicas each run
    their own continuous-batching loop and pull the next request from ONE
    shared queue under a lock (llama.cpp:919-983 `omp critical
    (get_batch_idx)`). Under skewed request lengths this load-balances
    dynamically where a lockstep dp batch would stall every shard on the
    longest request."""

    def __init__(self, num_reqs: int):
        import threading

        self.n = num_reqs
        self._i = 0
        self._lock = threading.Lock()

    def pop(self) -> int | None:
        with self._lock:
            if self._i >= self.n:
                return None
            i = self._i
            self._i += 1
            return i


class _SeqQueue:
    """Single-replica request source (no lock)."""

    def __init__(self, num_reqs: int):
        self.n = num_reqs
        self._i = 0

    def pop(self) -> int | None:
        if self._i >= self.n:
            return None
        i = self._i
        self._i += 1
        return i


def serve_replicated(
    engines: "list[InferenceEngine]",
    requests: Requests,
    steps: int | None = None,
    stats: dict | None = None,
    stop_on_eos: bool = True,
    samplers: "list[Sampler] | None" = None,
) -> int:
    """Run N engine replicas against one shared request queue, one Python
    thread per replica (each engine's params/caches live on its own device
    or device group). Each request is served by exactly one replica, so
    `requests.generations` fills without write conflicts; greedy outputs
    are byte-identical to single-replica serving because per-slot math is
    independent of batch composition. Returns the total generated-token
    count. Replicates /root/reference/src/llama.cpp:919-983 (N per-GPU
    engines + `omp critical` queue) the TPU way: one process, N device
    groups, declarative placement."""
    import threading

    q = SharedRequestQueue(requests.num_reqs)
    counts = [0] * len(engines)
    rep_stats: list[dict] = [{} for _ in engines]
    errs: list[BaseException | None] = [None] * len(engines)

    def run(i: int, eng: "InferenceEngine"):
        try:
            # samplers are per-REQUEST (indexed by request id) and each
            # request is served by exactly one replica, so sharing the
            # list across replicas is conflict-free
            counts[i] = eng.serve(
                requests, steps=steps, stats=rep_stats[i],
                stop_on_eos=stop_on_eos, req_queue=q, samplers=samplers,
            )
        except BaseException as e:  # surface replica failures to the caller
            errs[i] = e

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=run, args=(i, eng), daemon=True)
        for i, eng in enumerate(engines)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errs:
        if e is not None:
            raise e
    if stats is not None:
        wall = time.perf_counter() - t0
        stats["wall_s"] = wall
        stats["tok_per_s"] = sum(counts) / wall if wall > 0 else 0.0
        stats["per_replica"] = rep_stats
        stats["per_replica_tokens"] = list(counts)
        ttfts = [
            t for st in rep_stats for t in st.get("ttft_all_s", [])
        ]
        if ttfts:
            ttfts.sort()
            stats["ttft_p50_s"] = ttfts[len(ttfts) // 2]
            stats["ttft_p95_s"] = ttfts[min(len(ttfts) - 1,
                                            int(len(ttfts) * 0.95))]
    return sum(counts)


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params: LlamaParams,
        tokenizer: Tokenizer,
        *,
        batch_size: int = 8,
        cache_dtype=None,
        attn_impl: str = "xla",
        precision: str = "highest",
        max_seq_len: int | None = None,
        use_prefill: bool = True,
        prefill_buckets: tuple[int, ...] = (16, 64, 256),
        shardings=None,
        paged: bool = False,
        page_size: int = 128,
        num_pages: int | None = None,
        custom_step=None,
        custom_prefill=None,
        host_step=None,
        host_prefill=None,
        cache_factory=None,
        cache_sharding=None,
        device_sampling: bool = False,
        ds_temperature: float = 0.0,
        ds_topp: float = 0.9,
        ds_seed: int = 0,
        kv_quant: bool = False,
        chunk_steps: int = 1,
        prefix_cache: bool = False,
        spec_lookup: int = 0,
        device=None,
    ):
        from hip_llama_tpu.models.llama import _act_dtype

        from hip_llama_tpu.xla_tuning import decode_compiler_options

        # measured-on-chip XLA MSA tuning (hip_llama_tpu/xla_tuning.py);
        # None on CPU / when disabled
        copts = decode_compiler_options()

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self._custom = custom_step is not None
        # replica pinning: when set, serve() wraps itself in
        # jax.default_device(device) so every array this engine creates
        # (caches, per-step tokens) lands on its replica's device — the
        # declarative-placement analog of the reference's one-engine-per-GPU
        # replicas (llama.cpp:919-983)
        self.device = device
        self.attn_impl = attn_impl
        self.precision = precision
        self.cache_dtype = cache_dtype or _act_dtype(params)
        self.kv_quant = kv_quant
        self.chunk_steps = chunk_steps
        self._chunk = None
        if chunk_steps > 1:
            if paged:
                from hip_llama_tpu.models.paged import (
                    make_paged_chunked_sampling_step,
                )

                # host reserves pages for the whole chunk before dispatch
                # (serve loop); idle/retired slots write to the trash page
                self._chunk = jax.jit(
                    make_paged_chunked_sampling_step(
                        cfg, chunk_steps, precision=precision,
                        temperature=ds_temperature, topp=ds_topp,
                    ),
                    donate_argnums=(1,), compiler_options=copts,
                )
            else:
                from hip_llama_tpu.models.llama import make_chunked_sampling_step

                self._chunk = jax.jit(
                    make_chunked_sampling_step(
                        cfg, chunk_steps, attn_impl=attn_impl,
                        precision=precision,
                        temperature=ds_temperature, topp=ds_topp,
                    ),
                    donate_argnums=(1,), compiler_options=copts,
                )
            self._ds_key = jax.random.PRNGKey(ds_seed)
            self._ds_ctr = 0
        self.max_seq_len = max_seq_len or cfg.seq_len
        self.use_prefill = use_prefill
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= self.max_seq_len
        ) or (min(16, self.max_seq_len),)
        self.shardings = shardings
        self.paged = paged
        self.page_size = page_size
        self.spec_lookup = spec_lookup
        if spec_lookup:
            # serve-mode prompt-lookup speculation: each slot's repeated
            # n-grams propose tokens, one bucketed prefill verifies the
            # whole batch. Needs the prefill path (the verify IS a prefill)
            # and the contiguous cache (verify starts are not page-aligned).
            if paged:
                raise ValueError("spec_lookup requires paged=False")
            if not use_prefill:
                raise ValueError("spec_lookup requires use_prefill=True")
            if chunk_steps > 1 or device_sampling:
                raise ValueError(
                    "spec_lookup is incompatible with chunk_steps/"
                    "device_sampling (each is its own dispatch schedule)"
                )
        self.prefix_cache = prefix_cache
        if prefix_cache and not paged:
            raise ValueError("prefix_cache requires paged=True (shared pages)")
        if prefix_cache and not use_prefill:
            # force-feeding writes every prompt row through the decode step,
            # which would scribble on shared pages
            raise ValueError("prefix_cache requires use_prefill=True")
        if paged:
            from hip_llama_tpu.models.paged import (
                make_paged_decode_step,
                make_paged_prefill,
            )

            # paged prefill requires page-aligned chunk starts: chunk in
            # exactly-page_size buckets (models/paged.py docstring)
            self.prefill_buckets = (page_size,)
            self.num_pages = num_pages or (
                batch_size * -(-self.max_seq_len // page_size)
            )
            self.max_pages = -(-self.max_seq_len // page_size)
            pstep = make_paged_decode_step(cfg, precision=precision)
            pprefill = make_paged_prefill(cfg, precision=precision)
            self._paged_step = jax.jit(pstep, donate_argnums=(1,), compiler_options=copts)
            self._paged_prefill = jax.jit(pprefill, donate_argnums=(1,), compiler_options=copts)
            # last-valid-row logits for the chunked scheduler: skips the
            # (B, T, V) classifier + transfer it never reads
            self._paged_prefill_last = jax.jit(
                make_paged_prefill(cfg, precision=precision, last_only=True),
                donate_argnums=(1,), compiler_options=copts,
            )

        self._cache_sharding = cache_sharding
        self._sstep = None
        if device_sampling:
            if paged:
                # _sstep drives the contiguous cache; every use site gates
                # on bm is None, so the flag would be silently ignored
                raise ValueError(
                    "device_sampling is not supported with paged=True"
                )
            # sampling on device: the host fetches 4 bytes/slot instead of
            # the (B, V) logits. Greedy == host argmax; stochastic uses the
            # JAX PRNG (not the reference RNG stream — disable for parity
            # runs against golden corpora).
            from hip_llama_tpu.models.llama import make_sampling_decode_step

            sstep = make_sampling_decode_step(
                cfg, attn_impl=attn_impl, precision=precision,
                temperature=ds_temperature, topp=ds_topp,
            )
            self._sstep = jax.jit(sstep, donate_argnums=(1,), compiler_options=copts)
            self._ds_key = jax.random.PRNGKey(ds_seed)
            self._ds_ctr = 0
        self._cache_factory = cache_factory
        if host_step is not None:
            # host-driven step (weight streaming, models/streaming.py): a
            # plain Python callable with the step/prefill signatures that
            # internally drives per-layer jitted compute + H2D transfers.
            # NOT wrapped in jax.jit — the layer loop IS host code (the
            # reference's test_70B scheduler shape, llama.cpp:1085-1278).
            if paged or spec_lookup or chunk_steps > 1 or device_sampling:
                raise ValueError(
                    "host_step (weight streaming) is incompatible with "
                    "paged/spec_lookup/chunk_steps/device_sampling — each "
                    "drives the resident jitted step"
                )
            if cache_factory is None:
                raise ValueError("host_step requires cache_factory")
            self._step = host_step
            if host_prefill is not None:
                self._prefill = host_prefill
            else:
                self.use_prefill = False
            return
        if custom_step is not None:
            # externally built step (e.g. the shard_map TP step for int8,
            # parallel/tp.py); prefill falls back to force-feeding via the
            # step when no custom prefill is given
            self._step = jax.jit(custom_step, donate_argnums=(1,), compiler_options=copts)
            if custom_prefill is not None:
                self._prefill = jax.jit(custom_prefill, donate_argnums=(1,), compiler_options=copts)
            else:
                self.use_prefill = False
                if spec_lookup:
                    # fail NOW, not mid-serve at the first verify dispatch
                    raise ValueError(
                        "spec_lookup requires a prefill path, but this "
                        "custom_step has no custom_prefill (force-feed only)"
                    )
            return

        step = make_decode_step(cfg, attn_impl=attn_impl, precision=precision)
        prefill = make_prefill(cfg, attn_impl=attn_impl, precision=precision)
        # chunked-scheduler variant: logits for each slot's LAST valid row
        # only — the (B, T, V) classifier matmul (0.5 GB of fp32 logits at
        # 7B b8xT512) and its D2H transfer are skipped; the full variant
        # stays for the speculative verifier (needs per-position logits)
        prefill_last = make_prefill(
            cfg, attn_impl=attn_impl, precision=precision, last_only=True
        )
        donate = dict(donate_argnums=(1,), compiler_options=copts)
        if shardings is not None:
            self._step = jax.jit(
                step,
                in_shardings=(shardings.params, shardings.cache, None, None),
                out_shardings=(None, shardings.cache),
                **donate,
            )
            self._prefill = jax.jit(
                prefill,
                in_shardings=(shardings.params, shardings.cache, None, None, None),
                out_shardings=(None, shardings.cache),
                **donate,
            )
            self._prefill_last = jax.jit(
                prefill_last,
                in_shardings=(shardings.params, shardings.cache, None, None, None),
                out_shardings=(None, shardings.cache),
                **donate,
            )
        else:
            self._step = jax.jit(step, **donate)
            self._prefill = jax.jit(prefill, **donate)
            self._prefill_last = jax.jit(prefill_last, **donate)

    # -- helpers ------------------------------------------------------------

    def new_cache(self, batch: int | None = None):
        b = batch or self.batch_size
        if self._cache_factory is not None:
            return self._cache_factory(b)
        if self.paged:
            from hip_llama_tpu.models.paged import init_paged_kv_cache

            n_pages = max(self.num_pages, b)  # at least one page per slot
            # +1: physical page 0 is the BlockManager's reserved trash page
            # (idle-slot writes land there; see block_manager.py TRASH_PAGE)
            return init_paged_kv_cache(
                self.cfg, n_pages + 1, self.page_size, dtype=self.cache_dtype,
                quantized=self.kv_quant,
            )
        cache = init_kv_cache(
            self.cfg,
            b,
            dtype=self.cache_dtype,
            seq_len=self.max_seq_len,
            quantized=self.kv_quant,
            # shard_map custom steps (tp/sp) derive local head counts from
            # cfg — give them the unpadded layout (models/llama.py)
            pad=False if self._custom else None,
        )
        if self._cache_sharding is not None:
            cache = jax.device_put(cache, self._cache_sharding)
        elif self.shardings is not None:
            cache = jax.device_put(cache, self.shardings.cache)
        return cache

    def new_block_manager(self, batch: int | None = None) -> "BlockManager | None":
        if not self.paged:
            return None
        b = batch or self.batch_size
        return BlockManager(
            num_pages=max(self.num_pages, b), page_size=self.page_size, num_slots=b
        )

    def _table(self, bm: "BlockManager", b: int):
        return jnp.asarray(
            [bm.table_array(s, self.max_pages) for s in range(b)], jnp.int32
        )

    def _do_step(self, cache, tokens, pos, bm=None, b: int | None = None):
        if self.paged:
            table = self._table(bm, b)
            return self._paged_step(self.params, cache, table, tokens, pos)
        return self._step(self.params, cache, tokens, pos)

    def _do_prefill(self, cache, toks, start, valid, bm=None, b: int | None = None):
        """Scheduler-side prefill: uses the last-valid-row logits variant
        when available ((B, V) instead of (B, T, V) — the scheduler only
        reads row valid-1); host/custom prefills return full logits and
        _prefill_tokens handles both shapes."""
        if self.paged:
            table = self._table(bm, b)
            pf = getattr(self, "_paged_prefill_last", None) or self._paged_prefill
            return pf(self.params, cache, table, toks, start, valid)
        pf = getattr(self, "_prefill_last", None) or self._prefill
        return pf(self.params, cache, toks, start, valid)

    def _prefill_tokens(
        self,
        cache: KVCache,
        batch: int,
        slot_tokens: dict[int, list[int]],
        slot_start: dict[int, int],
        bm=None,
    ) -> tuple[np.ndarray | None, KVCache]:
        """Prefill each slot's token list starting at its offset. Returns the
        logits (B, V) at each slot's final prefilled position (None if no
        tokens were prefilled) and the updated cache."""
        if not slot_tokens:
            return None, cache
        remaining = {s: list(t) for s, t in slot_tokens.items() if t}
        offset = dict(slot_start)
        last_logits = np.zeros((batch, self.cfg.vocab_size), np.float32)
        while any(remaining.values()):
            t = _bucket(max(len(v) for v in remaining.values()), self.prefill_buckets)
            toks = np.zeros((batch, t), np.int32)
            start = np.zeros((batch,), np.int32)
            valid = np.zeros((batch,), np.int32)
            for s, v in remaining.items():
                chunk = v[:t]
                toks[s, : len(chunk)] = chunk
                start[s] = offset[s]
                valid[s] = len(chunk)
                offset[s] += len(chunk)
                remaining[s] = v[t:]
                if bm is not None and valid[s]:
                    bm.ensure_capacity(s, int(start[s]) + int(valid[s]))
            logits, cache = self._do_prefill(
                cache, jnp.asarray(toks), jnp.asarray(start), jnp.asarray(valid),
                bm=bm, b=batch,
            )
            logits_h = np.asarray(logits)
            for s in list(remaining):
                if valid[s] > 0:
                    last_logits[s] = (
                        logits_h[s] if logits_h.ndim == 2
                        else logits_h[s, valid[s] - 1]
                    )
        return last_logits, cache

    # -- generate mode (llama.cpp:522-579) -----------------------------------

    def generate(
        self,
        prompt: str | None,
        steps: int | None = None,
        sampler: Sampler | None = None,
        echo: bool = False,
    ) -> GenerationResult:
        cfg = self.cfg
        steps = steps or self.max_seq_len
        steps = min(steps, self.max_seq_len)
        sampler = sampler or Sampler(cfg.vocab_size, temperature=0.0)
        prompt_tokens = self.tokenizer.encode(prompt or "", bos=True, eos=False)

        cache = self.new_cache(batch=1)
        bm = self.new_block_manager(batch=1)
        t0 = time.perf_counter()
        ttft = None
        out_pieces: list[bytes] = []
        token_ids: list[int] = []

        pos = 0
        token = prompt_tokens[0]
        if self.use_prefill and len(prompt_tokens) > 1:
            # prefill all but the last prompt token; the decode step below
            # consumes the last one and produces the first sampled logits.
            # A prompt longer than the step budget is truncated at it — the
            # reference's per-step pos < steps bound does the same
            # (llama.cpp:540), and unbounded prefill would clamp-write past
            # the KV window
            n_feed = min(len(prompt_tokens) - 1, steps)
            _, cache = self._prefill_tokens(
                cache, 1, {0: prompt_tokens[:n_feed]}, {0: 0}, bm=bm
            )
            pos = n_feed
            token = prompt_tokens[min(n_feed, len(prompt_tokens) - 1)]
            # reproduce the prompt echo the reference prints while force-feeding
            # (llama.cpp:560-563)
            for a, nxt in zip(prompt_tokens[:n_feed], prompt_tokens[1:n_feed + 1]):
                piece = printable_piece(self.tokenizer.decode_piece(a, nxt))
                if echo and piece:
                    print(piece.decode("utf-8", errors="replace"), end="", flush=True)
                out_pieces.append(piece)

        while pos < steps:
            if bm is not None:
                bm.append_token(0, pos)
            if self._sstep is not None and bm is None:
                self._ds_ctr += 1
                key = jax.random.fold_in(self._ds_key, self._ds_ctr)
                nxt_dev, cache = self._sstep(
                    self.params, cache, jnp.array([token]),
                    jnp.array([pos], jnp.int32), key,
                )
                logits = None
            else:
                logits, cache = self._do_step(
                    cache, jnp.array([token]), jnp.array([pos], jnp.int32),
                    bm=bm, b=1,
                )
            if pos < len(prompt_tokens) - 1:
                nxt = prompt_tokens[pos + 1]
            else:
                nxt = (
                    int(np.asarray(nxt_dev)[0])
                    if logits is None
                    else sampler.sample(np.asarray(logits[0]))
                )
                if ttft is None:
                    ttft = time.perf_counter() - t0
            pos += 1
            # data-dependent terminating condition: BOS (llama.cpp:556-558)
            if nxt == BOS_ID:
                break
            piece = printable_piece(self.tokenizer.decode_piece(token, nxt))
            if echo and piece:
                print(piece.decode("utf-8", errors="replace"), end="", flush=True)
            if pos > len(prompt_tokens) - 1:
                token_ids.append(nxt)
            out_pieces.append(piece)
            token = nxt

        elapsed = time.perf_counter() - t0
        text = b"".join(out_pieces).decode("utf-8", errors="replace")
        return GenerationResult(
            text=text,
            token_ids=token_ids,
            n_gen_tokens=max(pos - 1, 0),
            elapsed_s=elapsed,
            ttft_s=ttft if ttft is not None else elapsed,
        )

    # -- test mode: continuous batching (llama.cpp:891-1083) -----------------

    def serve(self, *args, **kwargs) -> int:
        """Continuous-batching serve; see _serve_impl for the contract.
        Replica-pinned engines (device=...) run under their device context
        so thread-local array creation stays on the replica's device."""
        if self.device is not None:
            with jax.default_device(self.device):
                return self._serve_impl(*args, **kwargs)
        return self._serve_impl(*args, **kwargs)

    def _serve_impl(
        self,
        requests: Requests,
        steps: int | None = None,
        samplers: list[Sampler] | None = None,
        verbose: bool = False,
        stats: dict | None = None,
        draft: "InferenceEngine | None" = None,
        stop_on_eos: bool = True,
        req_queue=None,
    ) -> int:
        """Continuous-batching over a request list; fills
        `requests.generations` in place and returns the generated-token count
        (the reference's gen_cnt, llama.cpp:1062).

        `stats`, if given, is filled with serving metrics: total wall time,
        tok/s, and per-request TTFT p50/p95/max (the reference printed only
        the aggregate tok/s, llama.cpp:1614-1615).

        `stop_on_eos`: True retires a slot on EOS like the reference's GPU
        scheduler (llama.cpp:1052-1056); False stops on BOS only — the
        reference's CPU benchmark engine prints EOS and keeps sampling
        (run.cc:1075-1077), which the golden-corpus regression tier
        (tests/test_goldens.py) must reproduce byte-for-byte.

        `draft` (requires spec_lookup > 0): a small draft engine sharing the
        tokenizer/vocab proposes each round's spec_lookup tokens with ONE
        batched on-device chain instead of prompt-lookup n-grams — the
        draft's KV cache tracks the committed stream under the same
        stale-rows-overwritten invariant as generate-mode speculation
        (engine/speculative.py docstring). Greedy acceptance only."""
        cfg = self.cfg
        b = self.batch_size
        steps = min(steps or self.max_seq_len, self.max_seq_len)
        if samplers is None:
            # per-request fixed-seed samplers (llama.cpp:897-900)
            samplers = [request_sampler(cfg.vocab_size) for _ in requests.prompts]
        t_start = time.perf_counter()
        assign_time = [0.0] * requests.num_reqs
        ttft = [None] * requests.num_reqs

        cache = self.new_cache(batch=b)
        bm = self.new_block_manager(batch=b)
        # request source: a sequential counter by default, or a shared
        # thread-safe queue when running as one of N replicas
        # (serve_replicated). Admission-blocked requests are held back
        # locally (their matched prefix pages live in THIS replica).
        if req_queue is None:
            req_queue = _SeqQueue(requests.num_reqs)
        held_back: list[int] = []
        gen_cnt = 0

        # native C++ scheduler (csrc sched_*): per-token advance — sampling
        # with the reference RNG, prompt force-feed, retirement decisions —
        # runs in native code when the samplers expose the standard
        # (temperature, topp, xorshift64* state) triple; the Python loop
        # below stays as the fallback and the semantics oracle.
        sched = None
        if not self.spec_lookup and all(
            hasattr(sp, "temperature") and hasattr(sp, "topp")
            and hasattr(getattr(sp, "rng", None), "state")
            for sp in samplers
        ):
            try:
                from hip_llama_tpu.native import NativeScheduler, get_lib

                if get_lib() is not None:
                    sched = NativeScheduler(b, cfg.vocab_size)
            except Exception:
                sched = None
        self.used_native_sched = sched is not None

        # admission-blocked prompts keep their token lists here so each
        # scheduler iteration does not re-run the BPE encode (O(n^2) merges)
        tok_cache: dict[int, list[int]] = {}
        req_id = [-1] * b  # batch_token_id
        token = np.zeros(b, np.int32)
        pos = np.zeros(b, np.int32)
        prompt_toks: list[list[int]] = [[] for _ in range(b)]
        gen_bytes: list[bytearray] = [bytearray() for _ in range(b)]
        # per-slot token history for prompt-lookup speculation proposals
        hist: list[list[int]] = [[] for _ in range(b)]
        spec_proposed = spec_accepted = 0
        d_cache = d_chain = None
        if draft is not None:
            if not self.spec_lookup:
                raise ValueError("serve(draft=...) requires spec_lookup > 0")
            from hip_llama_tpu.models.llama import make_chunked_sampling_step

            from hip_llama_tpu.xla_tuning import decode_compiler_options

            d_cache = draft.new_cache(batch=b)
            d_chain = jax.jit(
                make_chunked_sampling_step(
                    draft.cfg, self.spec_lookup, attn_impl=draft.attn_impl,
                    precision=draft.precision, temperature=0.0,
                ),
                compiler_options=decode_compiler_options(),
                donate_argnums=(1,),
            )
            _d_key = jax.random.PRNGKey(0)

        sched_iters = 0
        while True:
            sched_iters += 1
            # assign new requests to empty slots (llama.cpp:973-1007)
            newly_assigned: dict[int, list[int]] = {}
            prefill_start: dict[int, int] = {}
            n_idle = 0
            for s in range(b):
                if req_id[s] == -1:
                    ridx = (
                        held_back.pop(0) if held_back else req_queue.pop()
                    )
                    if ridx is not None:
                        toks = tok_cache.pop(ridx, None)
                        if toks is None:
                            toks = self.tokenizer.encode(
                                requests.prompts[ridx], bos=True, eos=False
                            )
                            # a prompt longer than the step budget truncates
                            # at it (the reference's pos < steps bound
                            # consumes at most `steps` prompt tokens,
                            # llama.cpp:1027-1049); keeps every KV write
                            # inside the window
                            if len(toks) > steps:
                                toks = toks[:steps]
                        n_cached = 0
                        if bm is not None:
                            # prefix cache: attach indexed prompt-prefix pages
                            # (shared, refcounted) before sizing the remainder
                            if self.prefix_cache and len(toks) > 1:
                                n_cached = bm.match_prefix(s, toks)
                            # admission control: don't admit a request whose
                            # prompt can't get pages; it waits for a retire
                            # (the reference would abort — BatchManager had
                            # no free path at all)
                            need = -(-(len(toks) + 1) // self.page_size) - len(
                                bm.page_tables[s]
                            )
                            if bm.num_free < need:
                                tok_cache[ridx] = toks  # retry later
                                held_back.insert(0, ridx)
                                free_before = bm.num_free
                                bm.free_slot(s)  # detach matched prefix pages
                                n_active = sum(1 for r in req_id if r != -1)
                                if n_active == 0:
                                    raise RuntimeError(
                                        f"prompt needs {need} more KV pages "
                                        f"beyond its {n_cached}-token cached "
                                        f"prefix but the pool has "
                                        f"{free_before} free in total"
                                    )
                                continue
                            bm.prefix_hit_tokens += n_cached
                        req_id[s] = ridx
                        assign_time[ridx] = time.perf_counter()
                        prompt_toks[s] = toks
                        hist[s] = list(toks)
                        gen_bytes[s] = bytearray()
                        token[s] = toks[0]
                        pos[s] = 0
                        if self.use_prefill and len(toks) > 1:
                            # skip prompt rows served by the prefix cache
                            newly_assigned[s] = toks[n_cached:-1]
                            prefill_start[s] = n_cached
                            token[s] = toks[-1]
                            pos[s] = len(toks) - 1
                            # prompt echo parity: the reference appends decoded
                            # pieces while force-feeding (llama.cpp:1040-1046)
                            for a, nx in zip(toks, toks[1:]):
                                gen_bytes[s] += printable_piece(
                                    self.tokenizer.decode_piece(a, nx)
                                )
                        if sched is not None:
                            sp = samplers[req_id[s]]
                            sched.bind(
                                s, req_id[s], toks, int(pos[s]), int(token[s]),
                                steps, float(sp.temperature), float(sp.topp),
                                int(sp.rng.state),
                            )
                        if verbose:
                            print(f"slot {s} <- request {req_id[s]}")
                    else:
                        n_idle += 1
            if n_idle == b:
                break

            if newly_assigned:
                _, cache = self._prefill_tokens(
                    cache, b, newly_assigned,
                    {s: prefill_start.get(s, 0) for s in newly_assigned}, bm=bm,
                )
                if d_cache is not None:
                    # the draft's cache tracks every slot's prompt too,
                    # truncated to ITS window (clamp-writes past it would
                    # scribble on the last row; the decode gate already
                    # disables draft proposals once pos nears that window)
                    d_lim = draft.max_seq_len - 1
                    _, d_cache = draft._prefill_tokens(
                        d_cache, b,
                        {s: t[:d_lim] for s, t in newly_assigned.items()},
                        {s: 0 for s in newly_assigned},
                    )
            if bm is not None and self.prefix_cache:
                # index the freshly prefilled prompt pages for future sharing
                for s in newly_assigned:
                    bm.register_prefix(s, prompt_toks[s])

            def retire_slot(s):
                nonlocal gen_cnt
                text = gen_bytes[s].decode("utf-8", errors="replace") + "\n"
                requests.generations[req_id[s]] = text
                gen_cnt += int(pos[s]) - 1
                if verbose:
                    print(f"slot {s} DONE request {req_id[s]}")
                req_id[s] = -1
                pos[s] = 0
                token[s] = 0
                if sched is not None:
                    sched.release(s)
                if bm is not None:
                    bm.free_slot(s)

            def advance_and_retire(logits_h, nxt_h):
                # advance state machines (llama.cpp:1027-1049)
                nonlocal gen_cnt
                done = [False] * b
                if sched is not None:
                    sampled_now = [
                        req_id[s] != -1 and pos[s] >= len(prompt_toks[s]) - 1
                        for s in range(b)
                    ]
                    feed_tok, feed_pos, done_n, eprev, enext = sched.advance(
                        logits=logits_h,
                        sampled=nxt_h if logits_h is None else None,
                        bos_id=BOS_ID,
                        # -1 never matches a token id: disables EOS retirement
                        eos_id=EOS_ID if stop_on_eos else -1,
                    )
                    for s in range(b):
                        if req_id[s] == -1:
                            continue
                        if sampled_now[s] and ttft[req_id[s]] is None:
                            ttft[req_id[s]] = (
                                time.perf_counter() - assign_time[req_id[s]]
                            )
                        if enext[s] >= 0:
                            gen_bytes[s] += printable_piece(
                                self.tokenizer.decode_piece(eprev[s], enext[s])
                            )
                        token[s] = feed_tok[s]
                        pos[s] = feed_pos[s]
                        done[s] = bool(done_n[s])
                else:
                    for s in range(b):
                        if req_id[s] == -1:
                            continue
                        in_prompt = pos[s] < len(prompt_toks[s]) - 1
                        if in_prompt:
                            nxt = prompt_toks[s][pos[s] + 1]
                        else:
                            nxt = (
                                int(nxt_h[s])
                                if logits_h is None
                                else samplers[req_id[s]].sample(logits_h[s])
                            )
                            if ttft[req_id[s]] is None:
                                ttft[req_id[s]] = (
                                    time.perf_counter() - assign_time[req_id[s]]
                                )
                        pos[s] += 1
                        if nxt == BOS_ID or (stop_on_eos and nxt == EOS_ID):
                            done[s] = True
                        else:
                            piece = printable_piece(
                                self.tokenizer.decode_piece(int(token[s]), nxt)
                            )
                            gen_bytes[s] += piece
                            token[s] = nxt
                            if not in_prompt:  # prompt tokens are in hist
                                hist[s].append(nxt)
                            if pos[s] >= steps:
                                done[s] = True

                # retire (llama.cpp:1052-1070)
                for s in range(b):
                    if done[s] and req_id[s] > -1:
                        retire_slot(s)

            if bm is not None:
                for s in range(b):
                    if req_id[s] != -1:
                        bm.append_token(s, int(pos[s]))

            # serve-mode prompt-lookup speculation: each active slot's
            # repeated n-grams propose up to spec_lookup tokens, ONE
            # bucketed prefill verifies the whole batch (per-slot valid
            # lengths), and each slot commits its accepted prefix plus a
            # correction/bonus token — greedy slots by argmax prefix-match,
            # stochastic slots by point-mass rejection sampling against the
            # warped target distribution (engine/speculative.py semantics).
            # Rows written for rejected positions sit at >= the new decode
            # point and are overwritten before ever being read.
            spec_props = None
            if (
                self.spec_lookup > 0
                and all(
                    req_id[s] == -1 or pos[s] >= len(prompt_toks[s]) - 1
                    for s in range(b)
                )
            ):
                from hip_llama_tpu.engine.speculative import _lookup_propose

                d_all = None
                d_ok = [False] * b
                if d_chain is not None:
                    # per-slot eligibility: a slot within spec_lookup of the
                    # DRAFT's window end uses prompt-lookup instead (the
                    # fixed-k chain would clamp-write garbage into ITS last
                    # draft rows — harmless for that slot, which never uses
                    # the draft again before retiring, and slot-local)
                    d_s = d_cache.k.shape[3]
                    for s in range(b):
                        d_ok[s] = (
                            req_id[s] != -1
                            and int(pos[s]) + self.spec_lookup <= d_s
                        )
                    if any(d_ok):
                        d_dev, d_cache = d_chain(
                            draft.params, d_cache, jnp.asarray(token),
                            jnp.asarray(pos), _d_key,
                        )
                        d_all = np.asarray(d_dev)  # (B, spec_lookup)
                spec_props = {}
                # verify needs kk+1 slots in one prefill bucket
                kk_cap = max(self.prefill_buckets) - 1
                for s in range(b):
                    if req_id[s] == -1:
                        continue
                    kk = min(self.spec_lookup, kk_cap,
                             self.max_seq_len - 1 - int(pos[s]))
                    if d_all is not None and d_ok[s]:
                        spec_props[s] = [int(t) for t in d_all[s, :kk]]
                    else:
                        spec_props[s] = (
                            _lookup_propose(hist[s], kk) if kk > 0 else []
                        )
                if not any(spec_props.values()):
                    spec_props = None  # nothing proposed: plain step instead
            if spec_props is not None:
                from hip_llama_tpu.engine.speculative import (
                    _verify_round,
                    _warp,
                )  # local import: speculative.py imports engine constants

                tb = _bucket(
                    max(len(p) for p in spec_props.values()) + 1,
                    self.prefill_buckets,
                )
                chunk_toks = np.zeros((b, tb), np.int32)
                valid = np.zeros((b,), np.int32)
                for s, pr in spec_props.items():
                    chunk_toks[s, 0] = token[s]
                    chunk_toks[s, 1:1 + len(pr)] = pr
                    valid[s] = 1 + len(pr)
                logits, cache = self._prefill(
                    self.params, cache, jnp.asarray(chunk_toks),
                    jnp.asarray(pos), jnp.asarray(valid),
                )
                logits_h = np.asarray(logits)
                for s, pr in spec_props.items():
                    sp = samplers[req_id[s]]
                    rows = logits_h[s, : valid[s]]
                    if getattr(sp, "temperature", None) == 0.0:
                        g = np.argmax(rows, axis=1)
                        n_acc = 0
                        while n_acc < len(pr) and pr[n_acc] == int(g[n_acc]):
                            n_acc += 1
                        commits = pr[:n_acc] + [int(g[n_acc])]
                    else:
                        ws = [_warp(r, sp.temperature, sp.topp) for r in rows]
                        commits, n_acc = _verify_round(ws, None, pr, sp.rng)
                    if d_all is not None and d_ok[s] and pr and n_acc == len(pr):
                        # full acceptance with a draft: drop the bonus token
                        # — the draft never wrote the KV row for its LAST
                        # proposal, so committing past it would leave a
                        # permanent hole at that row in the draft cache (the
                        # next chain re-derives the dropped token instead)
                        commits = commits[:n_acc]
                    spec_proposed += len(pr)
                    spec_accepted += n_acc
                    done_s = False
                    for nxt in commits:
                        if ttft[req_id[s]] is None:
                            ttft[req_id[s]] = (
                                time.perf_counter() - assign_time[req_id[s]]
                            )
                        pos[s] += 1
                        if nxt == BOS_ID or (stop_on_eos and nxt == EOS_ID):
                            done_s = True
                            break
                        piece = printable_piece(
                            self.tokenizer.decode_piece(int(token[s]), nxt)
                        )
                        gen_bytes[s] += piece
                        token[s] = nxt
                        hist[s].append(nxt)
                        if pos[s] >= steps:
                            done_s = True
                            break
                    if done_s:
                        retire_slot(s)
                continue

            # multi-step scheduling: when every active slot is past its
            # prompt and has >= chunk_steps of budget, decode the whole
            # chunk in one dispatch (on-device sampling feeding itself) and
            # run the scheduler over the returned (B, N) tokens. A slot
            # that retires mid-chunk is released immediately, so the
            # remaining sub-steps skip it and its post-EOS tokens are
            # discarded along with the cache rows they wrote.
            chunk_ok = (
                self._chunk is not None
                and all(
                    req_id[s] == -1 or pos[s] >= len(prompt_toks[s]) - 1
                    for s in range(b)
                )
                and max(
                    (int(pos[s]) for s in range(b) if req_id[s] != -1),
                    default=steps,
                ) + self.chunk_steps <= steps
            )
            if chunk_ok and bm is not None:
                # the page table is fixed for the whole chunk: reserve pages
                # covering positions [pos, pos + chunk_steps) per active
                # slot; if the pool can't cover it, fall back to single
                # steps until a retirement frees pages
                try:
                    for s in range(b):
                        if req_id[s] != -1:
                            bm.ensure_capacity(s, int(pos[s]) + self.chunk_steps)
                except OutOfPagesError:
                    chunk_ok = False
            if chunk_ok:
                self._ds_ctr += 1
                key = jax.random.fold_in(self._ds_key, self._ds_ctr)
                if bm is not None:
                    toks_dev, cache = self._chunk(
                        self.params, cache, self._table(bm, b),
                        jnp.asarray(token), jnp.asarray(pos), key,
                    )
                else:
                    toks_dev, cache = self._chunk(
                        self.params, cache, jnp.asarray(token), jnp.asarray(pos), key
                    )
                toks_ch = np.asarray(toks_dev)  # (B, N)
                for t in range(self.chunk_steps):
                    advance_and_retire(None, toks_ch[:, t])
            elif self._sstep is not None and bm is None:
                self._ds_ctr += 1
                key = jax.random.fold_in(self._ds_key, self._ds_ctr)
                nxt_dev, cache = self._sstep(
                    self.params, cache, jnp.asarray(token), jnp.asarray(pos), key
                )
                advance_and_retire(None, np.asarray(nxt_dev))
            else:
                logits, cache = self._do_step(
                    cache, jnp.asarray(token), jnp.asarray(pos), bm=bm, b=b
                )
                advance_and_retire(np.asarray(logits), None)

        if stats is not None:
            elapsed = time.perf_counter() - t_start
            tt = sorted(t for t in ttft if t is not None)
            stats.update(
                total_tokens=gen_cnt,
                elapsed_s=elapsed,
                tok_per_s=gen_cnt / elapsed if elapsed > 0 else 0.0,
                ttft_p50_s=tt[len(tt) // 2] if tt else None,
                ttft_p95_s=tt[min(len(tt) - 1, int(len(tt) * 0.95))] if tt else None,
                ttft_max_s=tt[-1] if tt else None,
                prefix_hit_tokens=bm.prefix_hit_tokens if bm is not None else 0,
                spec_proposed=spec_proposed,
                spec_accepted=spec_accepted,
                ttft_all_s=tt,  # per-request; serve_replicated aggregates
                # slot-step accounting: scheduler iterations x slots = the
                # topology-level utilization denominator (tokens per
                # slot-step), meaningful even where wall time is not
                # (shared-core fake devices)
                scheduler_iters=sched_iters,
                slot_steps=sched_iters * b,
            )
        return gen_cnt
