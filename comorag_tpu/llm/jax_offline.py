"""Offline (in-process) LLM generation on TPU — the reference's
``VLLMOffline`` counterpart (llm/vllm_offline.py:26-97), rebuilt TPU-native.

Where the reference wraps the vLLM CUDA engine (tensor_parallel_size /
pipeline_parallel_size ints, guided JSON via ``guided_options_request``),
this engine IS the model: a pure-JAX llama-/qwen2-class decoder
(models/decoder.py) with

  - real batched generation: one prefill + one ``lax.while_loop`` decode
    per batch (prompt lengths bucketed so the jit cache stays small);
  - guided-JSON decoding compiled to a DFA token table and applied ON
    DEVICE per step (llm/guided.py) — ``batch_infer(json_template=...)``
    keeps the reference's exact call signature semantics
    (vllm_offline.py:77-97);
  - tensor parallelism as mesh shardings (models/decoder.py
    ``param_shardings``), not engine config ints;
  - a hermetic byte-level tokenizer + minimal chat template so the whole
    engine runs with zero egress (random weights), while
    ``model_name_or_path`` loads a real local llama checkpoint + HF
    tokenizer via ``load_hf_decoder_checkpoint``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.llm.base import BaseLLM, LLMResponse, Messages
from comorag_tpu.llm.guided import JSON_TEMPLATES, compile_json_schema, make_token_table
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class ByteTokenizer:
    """Hermetic byte-level tokenizer: ids 0..255 are raw bytes, plus
    PAD/BOS/EOS specials. Guided decoding over this vocab degenerates to
    the byte DFA itself — the exact-constraint fast path."""

    pad_token_id = 256
    bos_token_id = 257
    eos_token_id = 258
    vocab_size = 259

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")

    def token_bytes(self) -> List[Optional[bytes]]:
        return [bytes([i]) for i in range(256)] + [None, None, None]


def _gpt2_byte_unicode() -> Dict[int, str]:
    """The byte-level-BPE bytes->unicode alphabet (GPT-2 lineage; public
    algorithm): printable latin-1 bytes map to themselves, everything else
    shifts into 0x100+ so every token is printable. Inverting this map is
    the only correct way to recover a byte-level token's bytes."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def render_chat(messages: Messages) -> str:
    """Minimal chat template (the reference delegates to
    ``tokenizer.apply_chat_template``, vllm_offline.py:14-25; a byte-level
    model has no pretrained template, so the framing is explicit)."""
    parts = []
    for m in messages:
        parts.append(f"### {m['role'].capitalize()}:\n{m['content']}\n\n")
    parts.append("### Assistant:\n")
    return "".join(parts)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


_PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)
_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)
_NEW_TOKEN_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _common_prefix_len(id_rows: Sequence[List[int]]) -> int:
    """Longest common token prefix across rows, capped so every row keeps
    at least one token to prefill (the last-prompt-logits source)."""
    first = id_rows[0]
    min_len = min(len(r) for r in id_rows)
    common = 0
    while common < min_len - 1 and all(r[common] == first[common] for r in id_rows):
        common += 1
    return common


class JaxOfflineLLM(BaseLLM):
    """In-process TPU generation engine with the BaseLLM interface."""

    # OpenIE passes json_template="ner"/"triples" when the client can
    # constrain decoding (the reference's guided path, vllm_offline.py:77-86)
    supports_guided_json = True

    def __init__(
        self,
        model_name_or_path: Optional[str] = None,
        params: Optional[Dict[str, Any]] = None,
        arch=None,
        tokenizer=None,
        mesh=None,
        max_model_len: int = 4096,
        max_new_tokens: int = 2048,
        temperature: float = 0.0,
        seed: int = 0,
        compute_dtype=jnp.float32,
        param_dtype=None,
        speculative: bool = False,
        draft_len: int = 7,
        kv_dtype=None,  # None (compute dtype) | "int8": quantized KV cache
        kv_budget_bytes: int = 6 << 30,  # per-call KV-cache ceiling (see below)
        spec_fallback_ratio: float = 2.2,  # spec step cost / plain step cost
    ):
        from comorag_tpu.models.decoder import (
            DecoderArch,
            init_params,
            load_hf_decoder_checkpoint,
            param_shardings,
        )

        if model_name_or_path is not None:
            params, arch = load_hf_decoder_checkpoint(model_name_or_path)
            if tokenizer is None:
                from transformers import AutoTokenizer

                try:
                    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
                except Exception:
                    # some checkpoints ship slow-only tokenizer files whose
                    # fast (tokenizers-rust) conversion fails; the engine
                    # only needs encode/decode + get_vocab, which the slow
                    # classes provide
                    tokenizer = AutoTokenizer.from_pretrained(
                        model_name_or_path, use_fast=False
                    )
        elif params is None or arch is None:
            # hermetic engine: tiny random weights, byte vocab — used by
            # tests, benches, and the offline-OpenIE dryrun path
            arch = arch or DecoderArch.tiny()
            params = init_params(jax.random.PRNGKey(seed), arch)

        self.arch = arch
        self.tokenizer = tokenizer or ByteTokenizer()
        self.mesh = mesh
        self.max_model_len = min(max_model_len, arch.max_seq_len)
        # the new-token budget must leave prompt room inside the model
        # window (the hermetic tiny arch has max_seq_len 512 but the
        # default budget is 2048 — unclamped, `max_model_len - max_new`
        # goes negative and prompt truncation/padding break)
        self.max_new_tokens = max(
            1, min(max_new_tokens, self.max_model_len - _PROMPT_BUCKETS[0])
        )
        self.temperature = temperature
        self.compute_dtype = compute_dtype
        self.kv_dtype = "int8" if kv_dtype in ("int8", jnp.int8) else None
        self._rng = jax.random.PRNGKey(seed)
        # infer() may be called from up to 16 question threads
        # (ComoRAG.try_answer); the rng split and prefix LRU are the
        # engine's only mutable host state
        import threading

        self._state_lock = threading.Lock()
        self._token_tables: Dict[str, jnp.ndarray] = {}
        # prefix caching (vLLM enable_prefix_caching counterpart): batch-1
        # KV caches of shared prompt headers, LRU-bounded on device
        from collections import OrderedDict

        self._prefix_lru: "OrderedDict[tuple, Any]" = OrderedDict()
        self._prefix_lru_max = 4
        self.prefix_cache_min = 64  # tokens; shorter prefixes aren't worth a phase

        # Token-budget batching (the vLLM max_num_batched_tokens counterpart,
        # /root/reference/src/comorag/llm/vllm_offline.py engine args): a
        # batch is admitted by KV-cache BYTES, not row count. Request-count
        # batching let 32 x 4096-token summarization prompts allocate a
        # 4 GB cache whose placement temps OOMed the 16 GB chip; short
        # OpenIE-shaped rows still batch at full width (their slot cost is
        # ~1/4 of a summarization row's). batch_infer caps each device call
        # at `kv_budget_bytes // (slot_row_bytes * total_slots)` rows.
        hd = arch.head_dim
        if kv_dtype in ("int8", jnp.int8):
            slot_bytes = arch.num_layers * 2 * arch.num_kv_heads * (hd + 4)
        else:
            slot_bytes = (
                arch.num_layers * 2 * arch.num_kv_heads * hd
                * jnp.dtype(compute_dtype).itemsize
            )
        # The chunked-prefill f32 score + probs slabs ([B, 512, heads,
        # total] each) scale with admitted rows exactly like the KV cache
        # and peak at the same moment — charging KV bytes alone let the
        # int8-KV halving double the admitted rows and OOM a 32 x 3.5k-token
        # summarization batch at the 0.76B arch (scores 4.4 GB + probs
        # 4.4 GB + KV 4.5 GB + weights; repro: scripts/exp_kv_admission.py).
        from comorag_tpu.models.decoder import _PREFILL_CHUNK

        slot_bytes += arch.num_heads * _PREFILL_CHUNK * 4 * 2
        self._slot_row_budget = max(1, int(kv_budget_bytes) // slot_bytes)

        quantized = param_dtype in ("int8", jnp.int8)
        if param_dtype == "int4":
            # 1/8 the weight HBM traffic (half of int8) via the fused
            # nibble-unpack Pallas matmul (decoder.Int4Weight /
            # ops/pallas_int4) — VERDICT r3 #7
            from comorag_tpu.models.decoder import quantize_params_int4

            params = quantize_params_int4(params)
            quantized = "int4"
        elif quantized:
            # 1/4 the weight HBM traffic and 4x model capacity per chip;
            # matmuls upcast int8 in the operand read (decoder.QuantWeight)
            from comorag_tpu.models.decoder import quantize_params

            params = quantize_params(params)
        elif param_dtype is not None:
            # decode is weight-traffic-bound: bf16 storage halves the HBM
            # reads per step (compute stays whatever compute_dtype says)
            params = jax.tree.map(
                lambda p: p.astype(param_dtype)
                if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                params,
            )
        if mesh is not None and "model" in getattr(mesh, "shape", {}):
            # float AND int8 trees shard over the TP axis: quantized
            # weights split q + per-output-channel scale together
            # (decoder.param_shardings quantized=True) — 1/4-HBM weights
            # and 1/n-per-chip weights compose (VERDICT r2 #3)
            shardings = param_shardings(mesh, arch=arch, quantized=quantized)
            params = jax.tree.map(
                lambda p, s: jax.device_put(p, s), params, shardings
            )
        self.params = params

        from comorag_tpu.models.decoder import generate, generate_speculative

        self._generate = jax.jit(
            generate,
            static_argnames=(
                "arch", "max_new_tokens", "eos_id", "pad_id", "temperature",
                "compute_dtype", "kv_dtype",
            ),
        )
        # self-speculative (prompt-lookup) decoding: exact at temp 0,
        # distribution-preserving rejection sampling at temp > 0; commits
        # multiple tokens per device step when the output echoes the
        # prompt (RAG answers, OpenIE, summarization all do)
        self.speculative = bool(speculative)
        self.draft_len = int(draft_len)
        # Adaptive fallback (chip-measured, scripts/exp_openie_profile.py):
        # a spec step verifies draft_len+1 positions and costs ~2.2x a
        # plain 1-token step (8.2 vs 3.8 ms at 0.76B/B=32/896 slots). Spec
        # only pays when it commits > that ratio in tokens per step — the
        # trained checkpoint's echo-heavy outputs do (~4 tok/step), random
        # or non-quoting models don't (~1). Track committed-tokens-per-step
        # (vs the plain loop's budget) as an EMA and permanently fall back
        # to the plain program once the evidence says spec loses; vLLM's
        # dynamic speculative disable is the same production idea.
        self._spec_active = self.speculative
        self._spec_ratio = float(spec_fallback_ratio)
        self._spec_eff_ema: Optional[float] = None
        self._spec_calls = 0
        self._generate_spec = jax.jit(
            generate_speculative,
            static_argnames=(
                "arch", "max_new_tokens", "eos_id", "pad_id", "draft_len",
                "temperature", "compute_dtype", "kv_dtype",
            ),
        )

    # ----------------------------------------------------------- tokenizer
    def _render(self, messages: Messages) -> Tuple[str, bool]:
        """Render a chat with the checkpoint's OWN template when the
        tokenizer carries one (the reference delegates to
        ``tokenizer.apply_chat_template``, vllm_offline.py:14-25 — an
        instruct model answers its trained framing, not a generic one).
        Returns ``(text, add_special_tokens)``: a template's output
        already embeds its special tokens (BOS headers etc.), so the
        encode step must not prepend a second set."""
        tok = self.tokenizer
        if getattr(tok, "chat_template", None):
            try:
                text = tok.apply_chat_template(
                    list(messages), tokenize=False, add_generation_prompt=True
                )
                return text, False
            except Exception as exc:  # malformed/unrenderable template
                if not getattr(self, "_warned_template", False):
                    self._warned_template = True
                    logger.warning(
                        "chat template failed (%s); using generic framing", exc
                    )
        return render_chat(messages), True

    def _ids(self, text: str, add_special: bool = True) -> List[int]:
        tok = self.tokenizer
        if isinstance(tok, ByteTokenizer):
            return [tok.bos_token_id] + tok.encode(text)
        return tok(text, add_special_tokens=add_special)["input_ids"]

    def _special_ids(self):
        tok = self.tokenizer
        pad = getattr(tok, "pad_token_id", None)
        eos = getattr(tok, "eos_token_id", None)
        if pad is None:
            pad = eos
        return int(pad), int(eos)

    def _decode_ids(self, ids: Sequence[int]) -> str:
        tok = self.tokenizer
        if isinstance(tok, ByteTokenizer):
            return tok.decode(ids)
        return tok.decode(ids, skip_special_tokens=True)

    def _hf_token_bytes(self) -> List[Optional[bytes]]:
        """Byte expansion of an HF vocab, sized to the MODEL's logits width
        (tokenizer.vocab_size can be smaller — llama-3 has 256 reserved ids
        — and a mismatched table fails to broadcast against the logits).

        Two vocab families (ADVICE r2 #1):
          - byte-level BPE (GPT-2/llama-3 lineage): EVERY byte is encoded
            through the bytes<->unicode alphabet ('Ġ'=space, 'Ċ'=\\n,
            'ĉ'=\\t, all bytes >=0x80 remapped) — tokens invert through
            the full map, never a two-marker replace (which would corrupt
            newline/control/latin-1 tokens into off-grammar emissions);
          - sentencepiece: '▁' space marker + ``<0xNN>`` byte-fallback
            tokens.
        Detection: the tokenizer's own ``byte_decoder`` when present, else
        the presence of byte-level marker chars in the vocab. Unknown /
        special ids stay None (forbidden)."""
        import re

        tok = self.tokenizer
        out: List[Optional[bytes]] = [None] * self.arch.vocab_size
        special = set(getattr(tok, "all_special_ids", []) or [])
        n = min(len(tok), self.arch.vocab_size)
        toks = tok.convert_ids_to_tokens(list(range(n)))
        byte_re = re.compile(r"^<0x([0-9A-Fa-f]{2})>$")
        u2b: Dict[str, int] = getattr(tok, "byte_decoder", None) or {
            u: b for b, u in _gpt2_byte_unicode().items()
        }
        is_byte_level = getattr(tok, "byte_decoder", None) is not None or any(
            t is not None and ("Ġ" in t or "Ċ" in t) for t in toks
        )
        for i, t in enumerate(toks):
            if t is None or i in special:
                continue
            m = byte_re.match(t)
            if m:
                out[i] = bytes([int(m.group(1), 16)])
                continue
            if is_byte_level:
                try:
                    out[i] = bytes(u2b[ch] for ch in t)
                except KeyError:
                    out[i] = None  # outside the byte alphabet -> forbidden
            else:
                out[i] = t.replace("▁", " ").encode("utf-8")
        return out

    def _token_table(self, template: str) -> jnp.ndarray:
        if template not in JSON_TEMPLATES:
            raise KeyError(
                f"unknown json_template {template!r}; have {sorted(JSON_TEMPLATES)}"
            )
        with self._state_lock:
            if template not in self._token_tables:
                dfa = compile_json_schema(JSON_TEMPLATES[template])
                tok = self.tokenizer
                if isinstance(tok, ByteTokenizer):
                    token_bytes = tok.token_bytes()
                else:
                    token_bytes = self._hf_token_bytes()
                _, eos = self._special_ids()
                if eos >= len(token_bytes):
                    raise ValueError(
                        f"eos_token_id {eos} outside the model vocab "
                        f"{len(token_bytes)} — constrained decoding could never stop"
                    )
                table = make_token_table(dfa, token_bytes, eos_token_id=eos)
                self._token_tables[template] = jnp.asarray(table)
            return self._token_tables[template]

    # ------------------------------------------------------------ generate
    def _shared_prefix(self, id_rows: List[List[int]]):
        """Find a shared prompt header worth caching: the longest common
        token prefix across the batch, floored to a 64-token bucket (so
        the prefix-prefill jit cache stays small). Batch-of-one calls only
        reuse an already-cached header (building one-off entries would pay
        a compile per novel length); multi-row batches build and cache.
        Returns (prefix KVCache | None, prefix_len). Holds the state lock:
        the LRU is shared across the meta loop's question threads."""
        from comorag_tpu.models.decoder import prefill_prefix

        first = id_rows[0]
        common = _common_prefix_len(id_rows)
        # every row must KEEP at least one token after the strip: a row
        # fully consumed by the prefix would prefill from a pad-token
        # query and sample its first token from the wrong distribution
        # (identical prompts at a 64-multiple length hit this)
        common = max(0, min(common, min(len(r) for r in id_rows) - 1))
        p0 = (common // 64) * 64

        # cross-call reuse: longest cached header that prefixes every row
        best_key, best_len = None, 0
        for key in self._prefix_lru:
            k0 = len(key)
            if self.prefix_cache_min <= k0 <= common and k0 > best_len and key == tuple(first[:k0]):
                best_key, best_len = key, k0
        if best_key is not None and (len(id_rows) == 1 or best_len >= p0):
            self._prefix_lru.move_to_end(best_key)
            return self._prefix_lru[best_key], best_len

        if len(id_rows) == 1 or p0 < self.prefix_cache_min:
            return None, 0
        key = tuple(first[:p0])
        cache = prefill_prefix(
            self.params, jnp.asarray(list(key), jnp.int32), self.arch,
            self.compute_dtype, kv_dtype=self.kv_dtype,
        )
        self._prefix_lru[key] = cache
        if len(self._prefix_lru) > self._prefix_lru_max:
            self._prefix_lru.popitem(last=False)
        return cache, p0

    def _generate_batch(
        self,
        prompts: List[str],
        max_tokens: int,
        json_template: Optional[str],
        temperature: Optional[float],
        id_rows: Optional[List[List[int]]] = None,  # precomputed tokenization
    ) -> List[LLMResponse]:
        pad, eos = self._special_ids()
        temp = self.temperature if temperature is None else float(temperature)
        # new-token bucket must leave at least one prompt bucket of room in
        # the model window; requested is then capped by the bucket so
        # finish_reason='length' is reported whenever the cap truncates
        fit = [b for b in _NEW_TOKEN_BUCKETS if b <= self.max_model_len - _PROMPT_BUCKETS[0]]
        max_new = _bucket(min(max_tokens, self.max_new_tokens), fit or _NEW_TOKEN_BUCKETS[:1])
        requested = min(max_tokens, self.max_new_tokens, max_new)

        if id_rows is None:
            id_rows = [self._ids(p) for p in prompts]
        limit = max(self.max_model_len - max_new, _PROMPT_BUCKETS[0])
        id_rows = [r[-limit:] if len(r) > limit else r for r in id_rows]

        with self._state_lock:
            prefix_cache, p0 = self._shared_prefix(id_rows)
        if p0:
            id_rows = [r[p0:] for r in id_rows]
            limit -= p0
        p_len = _bucket(max(max(len(r) for r in id_rows), 1), _PROMPT_BUCKETS)
        p_len = min(p_len, limit)
        b = _bucket(len(id_rows), _BATCH_BUCKETS)

        ids = np.full((b, p_len), pad, np.int32)
        mask = np.zeros((b, p_len), np.int32)
        for i, row in enumerate(id_rows):
            row = row[-p_len:]
            ids[i, p_len - len(row):] = row  # LEFT padding (decoder.py contract)
            mask[i, p_len - len(row):] = 1
        mask[len(id_rows):, -1] = 1  # batch-pad rows: one valid slot
        row_valid = np.zeros((b,), bool)
        row_valid[: len(id_rows)] = True

        table = self._token_table(json_template) if json_template else None
        common = dict(
            row_valid=jnp.asarray(row_valid),
            arch=self.arch,
            max_new_tokens=max_new,
            eos_id=eos,
            pad_id=pad,
            token_table=table,
            limit=jnp.int32(requested),
            prefix=prefix_cache,
            compute_dtype=self.compute_dtype,
            kv_dtype=self.kv_dtype,
        )
        used_spec = self.speculative and self._spec_active
        if used_spec:
            # temp 0: exact greedy verification; temp > 0: rejection-
            # sampling verification (decoder.generate_speculative) — the
            # multi-token win survives sampling (VERDICT r2 #5)
            with self._state_lock:
                self._rng, sub = jax.random.split(self._rng)
            result = self._generate_spec(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                draft_len=self.draft_len, temperature=temp, rng=sub, **common,
            )
        else:
            with self._state_lock:
                self._rng, sub = jax.random.split(self._rng)
            result = self._generate(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                temperature=temp, rng=sub, **common,
            )
        tokens = np.asarray(result.tokens)
        lengths = np.asarray(result.lengths)
        steps = int(result.steps) if hasattr(result, "steps") else None

        # serving observability (VERDICT r4 #3): prefix-cache hit rate and
        # tokens/step across e.g. the 20k guided OpenIE calls of an index
        # build are computable from these monotonic counters
        from comorag_tpu.utils import trace

        trace.count("llm.calls")
        trace.count("llm.rows", len(id_rows))
        trace.count("llm.prompt_tokens", sum(p0 + len(r) for r in id_rows))
        trace.count("llm.cached_prefix_tokens", p0 * len(id_rows))
        trace.count("llm.completion_tokens", int(lengths[: len(id_rows)].sum()))
        if steps is not None:
            trace.count("llm.decode_steps", steps)
        if used_spec and steps is not None:
            # adaptive spec fallback: a plain loop would have needed
            # max(lengths) 1-token steps; spec took `steps` chunk steps at
            # ~spec_fallback_ratio x the cost. EMA the efficiency and drop
            # to the plain program once it provably loses.
            eff = max(int(lengths[: len(id_rows)].max()), 1) / max(steps, 1)
            with self._state_lock:
                self._spec_calls += 1
                ema = self._spec_eff_ema
                self._spec_eff_ema = eff if ema is None else 0.7 * ema + 0.3 * eff
                trace.gauge("llm.spec_tokens_per_step", self._spec_eff_ema)
                if self._spec_calls >= 3 and self._spec_eff_ema < self._spec_ratio:
                    self._spec_active = False
                    trace.count("llm.spec_fallback")
                    logger.info(
                        "speculative decode committing %.2f tok/step "
                        "(< %.1fx step-cost ratio) — falling back to the "
                        "plain decode program",
                        self._spec_eff_ema, self._spec_ratio,
                    )

        out = []
        for i, row in enumerate(id_rows):
            n = int(lengths[i])
            raw = tokens[i, :n].tolist()
            stopped = eos in raw or n < requested
            toks = [t for t in raw if t != eos]
            text = self._decode_ids(toks)
            out.append(
                LLMResponse(
                    text=text,
                    metadata={
                        "prompt_tokens": p0 + len(row),
                        "cached_prefix_tokens": p0,
                        "completion_tokens": n,
                        "finish_reason": "stop" if stopped else "length",
                        **({"decode_steps": steps} if steps is not None else {}),
                    },
                )
            )
        return out

    # ---------------------------------------------------------- interface
    def _max_tokens(self, gen_kwargs: Dict) -> int:
        """max_tokens, or its OpenAI-client spelling max_completion_tokens
        (rerank/summarize pass the latter; openai_client.py honors it —
        dropping it here silently decoded to the engine default)."""
        mt = gen_kwargs.get("max_tokens")
        if mt is None:
            mt = gen_kwargs.get("max_completion_tokens")
        return int(self.max_new_tokens if mt is None else mt)

    def infer(self, messages: Messages, **gen_kwargs) -> LLMResponse:
        text, sp = self._render(messages)
        return self._generate_batch(
            [text],
            max_tokens=self._max_tokens(gen_kwargs),
            json_template=gen_kwargs.get("json_template"),
            temperature=gen_kwargs.get("temperature"),
            id_rows=[self._ids(text, sp)],
        )[0]

    def batch_infer(self, batch: Sequence[Messages], **gen_kwargs) -> List[LLMResponse]:
        """REAL batched decoding (one device program per prompt-length
        bucket), not a thread fan-out: groups prompts by padded length so
        short and long prompts don't share one worst-case grid."""
        if not batch:
            return []
        # render/tokenize per item: ONE malformed message dict or
        # tokenizer-rejected string must error only its own row, not the
        # whole merged group (innocent concurrent requests share batches
        # through the window server)
        rendered: List[Optional[Tuple[str, object]]] = []
        render_errs: Dict[int, str] = {}
        for i, m in enumerate(batch):
            try:
                rendered.append(self._render(m))
            except Exception as e:  # noqa: BLE001 — per-item isolation
                rendered.append(None)
                render_errs[i] = str(e)
        prompts = [t for t, _ in (r or ("", None) for r in rendered)]
        max_tokens = self._max_tokens(gen_kwargs)
        template = gen_kwargs.get("json_template")
        temperature = gen_kwargs.get("temperature")

        # Length-grouping keeps short prompts out of long prompts' padding
        # buckets — but when the batch shares a cacheable header, splitting
        # by TOTAL length would scatter it into single-row groups and the
        # prefix machinery (and its batching win) never engages. Shared
        # header present -> one group; remainder padding spread is bounded.
        id_rows: List[Optional[List[int]]] = []
        for i, r in enumerate(rendered):
            if r is None:
                id_rows.append(None)
                continue
            try:
                id_rows.append(self._ids(r[0], r[1]))
            except Exception as e:  # noqa: BLE001 — per-item isolation
                id_rows.append(None)
                render_errs[i] = str(e)
        ok = [i for i in range(len(prompts)) if id_rows[i] is not None]
        common = _common_prefix_len([id_rows[i] for i in ok]) if ok else 0
        groups: Dict[int, List[int]] = {}
        if ok and (common // 64) * 64 >= self.prefix_cache_min:
            groups[0] = ok
        else:
            for i in ok:
                groups.setdefault(_bucket(len(id_rows[i]), _PROMPT_BUCKETS), []).append(i)

        results: List[Optional[LLMResponse]] = [None] * len(prompts)
        for i, msg in render_errs.items():
            logger.warning("offline render/tokenize failed for one row: %s", msg)
            results[i] = LLMResponse(
                text="", metadata={"error": msg, "finish_reason": "error"}
            )
        fit = [bk for bk in _NEW_TOKEN_BUCKETS if bk <= self.max_model_len - _PROMPT_BUCKETS[0]]
        max_new_est = _bucket(
            min(max_tokens, self.max_new_tokens), fit or _NEW_TOKEN_BUCKETS[:1]
        )
        limit_est = max(self.max_model_len - max_new_est, _PROMPT_BUCKETS[0])
        for _, idxs in sorted(groups.items()):
            # token-budget admission (see __init__): rows whose padded
            # slots (prompt bucket + new-token bucket) would exceed the
            # KV budget split into smaller device calls — long prompts
            # run at reduced batch, short ones keep full width
            longest = min(max(len(id_rows[i]) for i in idxs), limit_est)
            total_est = min(_bucket(longest, _PROMPT_BUCKETS), limit_est) + max_new_est
            rows_cap = max(1, self._slot_row_budget // total_est)
            max_b = 1
            for bb in _BATCH_BUCKETS:
                if bb <= rows_cap:
                    max_b = bb
            max_b = min(_BATCH_BUCKETS[-1], max_b)
            for j in range(0, len(idxs), max_b):
                chunk = idxs[j : j + max_b]
                try:
                    rs = self._generate_batch(
                        [prompts[i] for i in chunk], max_tokens, template, temperature,
                        id_rows=[id_rows[i] for i in chunk],
                    )
                except Exception as e:  # noqa: BLE001 — per-chunk isolation
                    logger.warning("offline generation chunk failed: %s", e)
                    rs = [
                        LLMResponse(text="", metadata={"error": str(e), "finish_reason": "error"})
                        for _ in chunk
                    ]
                for i, r in zip(chunk, rs):
                    results[i] = r
        return results  # type: ignore[return-value]
