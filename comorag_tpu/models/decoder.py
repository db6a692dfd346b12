"""Llama-class decoder-only LM, implemented natively in JAX.

TPU-native counterpart of the reference's offline generation engine
(llm/vllm_offline.py:26-97: vLLM LLM wrapper with tensor/pipeline
parallel ints and guided-JSON decoding). Instead of wrapping an external
CUDA engine, the model itself is JAX:

  - RMSNorm + RoPE + grouped-query attention + SwiGLU (the llama lineage
    vLLM defaults to, `meta-llama/Llama-3.3-70B-Instruct`);
  - ONE stacked parameter pytree ([L, ...] per weight) so the layer stack
    runs as ``lax.scan`` — single compile, MXU-friendly;
  - a static-shape KV cache carried through ``lax.while_loop`` decoding
    (no dynamic shapes anywhere, every step is one fused device program);
  - batched generation with LEFT-padded prompts so every row's last
    prompt token sits at the same slot (one gather, uniform cache writes);
  - optional per-step token masking hook — the guided-JSON decoder
    (llm/guided.py) feeds a DFA transition table and generation is
    constrained on device, the TPU equivalent of vLLM's
    ``guided_options_request`` (vllm_offline.py:77-86);
  - tensor-parallel parameter shardings over a mesh ``model`` axis
    (vLLM's ``tensor_parallel_size`` int, vllm_offline.py:37-45, becomes
    real ``NamedSharding``s — XLA inserts the collectives);
  - weight import from a local HuggingFace llama-, qwen2/3- or
    gemma-family checkpoint
    (``load_hf_decoder_checkpoint``), torch used only at load time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()


@dataclasses.dataclass(frozen=True)
class DecoderArch:
    vocab_size: int = 32000
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 16
    num_kv_heads: int = 16
    intermediate_size: int = 5632
    max_seq_len: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_embeddings: bool = False
    # Qwen2-class checkpoints (the other major open llama-lineage family
    # the reference's vLLM route accepts) add a bias to q/k/v only —
    # everything else (RMSNorm, SwiGLU, RoPE, GQA, tied-embed option)
    # already matches this decoder. Fused like qkv_w: one [q|k|v] vector.
    qkv_bias: bool = False
    # RoPE frequency rescaling, as a hashable tuple so the frozen arch
    # stays a valid static jit argument:
    #   ("llama3", factor, low_freq_factor, high_freq_factor, orig_max_pos)
    #   ("linear", factor)
    # Llama-3.1+ checkpoints — including the reference's default serving
    # model `meta-llama/Llama-3.3-70B-Instruct` (vllm_offline.py:37) —
    # ship the "llama3" variant; ignoring it would silently mis-rotate
    # every position past the pretraining window.
    rope_scaling: Optional[Tuple] = None
    # Family knobs beyond the llama skeleton (all static, all composing
    # with the same scan/KV-cache/TP machinery):
    #   qwen3-class: per-head RMSNorm on q and k before RoPE, and an
    #     explicit head_dim decoupled from hidden/heads;
    #   gemma-class: embeddings scaled by sqrt(hidden), RMSNorm applies
    #     (1 + w), and the MLP gate runs tanh-GeLU instead of SiLU.
    qk_norm: bool = False
    head_dim_override: Optional[int] = None
    embed_scale: bool = False
    rms_unit_offset: bool = False
    mlp_act: str = "silu"  # "silu" | "gelu_tanh" | "gelu"

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, vocab_size: int = 259) -> "DecoderArch":
        """Byte-vocab test/CI shape (259 = ByteTokenizer vocab)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            intermediate_size=128,
            max_seq_len=512,
        )


# ------------------------------------------------------------------- params
def init_params(key: jax.Array, arch: DecoderArch) -> Dict[str, Any]:
    h, i, l = arch.hidden_size, arch.intermediate_size, arch.num_layers
    q_dim = arch.num_heads * arch.head_dim
    kv_dim = arch.num_kv_heads * arch.head_dim
    keys = jax.random.split(key, 8)
    scale = 0.02

    def norm(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    # qkv and gate/up are FUSED single matmuls (column blocks [q|k|v] and
    # [gate|up]): decode steps are launch-latency-bound at small batch, so
    # fewer, larger kernels beat the HF per-projection layout.
    params = {
        "embed": norm(keys[0], (arch.vocab_size, h)),
        "layers": {
            "attn_norm": jnp.ones((l, h)),
            "qkv_w": norm(keys[1], (l, h, q_dim + 2 * kv_dim)),
            "o_w": norm(keys[4], (l, q_dim, h)),
            "ffn_norm": jnp.ones((l, h)),
            "gateup_w": norm(keys[5], (l, h, 2 * i)),
            "down_w": norm(keys[7], (l, i, h)),
        },
        "final_norm": jnp.ones((h,)),
    }
    if arch.qkv_bias:
        params["layers"]["qkv_b"] = norm(keys[2], (l, q_dim + 2 * kv_dim))
    if arch.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((l, arch.head_dim))
        params["layers"]["k_norm"] = jnp.ones((l, arch.head_dim))
    if not arch.tie_embeddings:
        params["lm_head"] = norm(jax.random.fold_in(keys[0], 1), (h, arch.vocab_size))
    return params


def param_shardings(
    mesh,
    tp_axis: str = "model",
    arch: Optional[DecoderArch] = None,
    quantized: bool = False,
):
    """Tensor-parallel NamedShardings (megatron split): q/k/v/gate/up on
    their head/intermediate output dim, o/down on their input dim; norms,
    embeddings and lm_head replicated. XLA inserts the all-reduces.
    Pass ``arch`` so the tree matches tied-embedding checkpoints (no
    ``lm_head`` leaf).

    ``quantized=True`` (int8) emits ``QuantWeight(spec_q, spec_scale)``
    entries for the matmul weights (VERDICT r2 task #3 — 1/4-HBM weights
    AND TP together): output-dim-sharded weights shard q and their
    per-output-channel scale along the SAME dim; input-dim-sharded
    weights (o/down) keep the scale replicated — the scale epilogue
    distributes over the partial-sum all-reduce
    (``(Σ partialₛ)·scale = Σ(partialₛ·scale)``), so per-shard
    application is exact.

    ``quantized="int4"`` emits ``Int4Weight(spec_packed, spec_scale)``:
    every matmul weight goes COLUMN-parallel (packed and grouped scales
    both sharded on the output dim) — at decode the activations whose
    resharding this costs are KB-scale while the weights are GB-scale,
    and a single sharding orientation keeps the nibble-packed layout
    shard-local (a row split would cut input groups across devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    int4 = quantized == "int4"
    tp_size = mesh.shape.get(tp_axis, 1)

    def ns(*spec):
        # replicate on meshes lacking the tp axis (pure-dp training) —
        # same guard as bge.param_shardings
        spec = tuple(s if s is None or s in mesh.shape else None for s in spec)
        return NamedSharding(mesh, P(*spec))

    def _int4_col(out_dim):
        # shard the output dim only when it divides the axis (the tiny
        # test arch's 259-token vocab doesn't); replicate otherwise
        return tp_axis if (out_dim is None or out_dim % max(tp_size, 1) == 0) else None

    def w3(in_spec, out_spec, out_dim=None):
        """A [L, in, out] matmul weight; scale is [L, 1, out]."""
        if int4:
            col = _int4_col(out_dim)
            return Int4Weight(packed=ns(None, None, col), scale=ns(None, None, col))
        full = ns(None, in_spec, out_spec)
        if not quantized:
            return full
        return QuantWeight(q=full, scale=ns(None, None, out_spec))

    def w2(in_spec, out_spec, out_dim=None):
        """A [in, out] matmul weight (lm_head); scale is [1, out]."""
        if int4:
            col = _int4_col(out_dim)
            return Int4Weight(packed=ns(None, col), scale=ns(None, col))
        full = ns(in_spec, out_spec)
        if not quantized:
            return full
        return QuantWeight(q=full, scale=ns(None, out_spec))

    a = arch
    tree = {
        "embed": ns(None, None),
        "layers": {
            "attn_norm": ns(None, None),
            "qkv_w": w3(
                None, tp_axis,
                out_dim=(a.num_heads + 2 * a.num_kv_heads) * a.head_dim if a else None,
            ),
            "o_w": w3(tp_axis, None, out_dim=a.hidden_size if a else None),
            "ffn_norm": ns(None, None),
            "gateup_w": w3(None, tp_axis, out_dim=2 * a.intermediate_size if a else None),
            "down_w": w3(tp_axis, None, out_dim=a.hidden_size if a else None),
        },
        "final_norm": ns(None),
        "lm_head": w2(None, None, out_dim=a.vocab_size if a else None),
    }
    if arch is not None and arch.tie_embeddings:
        tree.pop("lm_head")
    if arch is not None and arch.qkv_bias:
        # bias splits along the same fused output dim as qkv_w's columns;
        # never quantized (quantize_params leaves non-"_w" leaves float)
        tree["layers"]["qkv_b"] = ns(None, tp_axis)
    if arch is not None and arch.qk_norm:
        # per-head_dim vectors, identical for every (sharded) head
        tree["layers"]["q_norm"] = ns(None, None)
        tree["layers"]["k_norm"] = ns(None, None)
    return tree


# ------------------------------------------------------------------ forward
def _rms_norm(x, scale, eps, unit_offset: bool = False):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    if unit_offset:
        # gemma-class: weight is an offset from 1, applied in fp32 before
        # the downcast (matches HF GemmaRMSNorm's operation order)
        return (normed * (1.0 + scale.astype(jnp.float32))).astype(x.dtype)
    return normed.astype(x.dtype) * scale.astype(x.dtype)


def _rope_inv_freq(hd: int, theta: float, scaling: Optional[Tuple]) -> jnp.ndarray:
    """Per-channel inverse frequencies, with optional HF-style rescaling.

    Matches transformers' ``modeling_rope_utils`` "linear" and "llama3"
    init functions (the latter is what llama-3.1+ configs carry as
    ``rope_scaling={"rope_type": "llama3", ...}``). All inputs are static,
    so XLA constant-folds the whole computation.
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, hd // 2, dtype=jnp.float32) * 2.0 / hd))
    if scaling is None:
        return freqs
    kind = scaling[0]
    if kind == "linear":
        return freqs / float(scaling[1])
    if kind == "llama3":
        _, factor, low_ff, high_ff, orig_max = scaling
        low_wavelen = orig_max / low_ff
        high_wavelen = orig_max / high_ff
        wavelen = 2.0 * jnp.pi / freqs
        # long waves (beyond the pretraining window) slow by `factor`,
        # short waves stay, the band between interpolates smoothly
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        smoothed = (1.0 - smooth) * freqs / factor + smooth * freqs
        out = jnp.where(wavelen > low_wavelen, freqs / factor, freqs)
        mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        return jnp.where(mid, smoothed, out)
    raise ValueError(f"unsupported rope_scaling kind: {kind!r}")


def _rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    theta: float,
    scaling: Optional[Tuple] = None,
) -> jnp.ndarray:
    """HF-convention rotary embedding (half-split rotate, not interleaved).

    x: [B, S, heads, head_dim]; positions: [B, S] int32.
    """
    hd = x.shape[-1]
    freqs = _rope_inv_freq(hd, theta, scaling)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, S, hd/2]
    cos = jnp.cos(angles)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(angles)[:, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class QuantWeight(NamedTuple):
    """Symmetric int8 weight with per-output-channel fp32 scales.

    The matmul reads int8 rows and upcasts in the operand read (XLA fuses
    the convert into the dot) — 1/4 the HBM traffic of fp32 weights, the
    same trick the int8 retrieval index uses (retrieval/index.py). The
    scale multiply is a fused elementwise epilogue."""

    q: jnp.ndarray      # [..., out] int8
    scale: jnp.ndarray  # [out] (or [..., out] broadcastable) fp32


def _quantize(w: jnp.ndarray) -> QuantWeight:
    """Per-output-channel symmetric quantization, computed ON DEVICE
    (pulling 1B-scale weights to the host costs minutes through a remote
    tunnel; the jnp reduction is milliseconds)."""
    arr = jnp.asarray(w, jnp.float32)
    # [L, in, out] -> max over in (axis -2), keep [L, 1, out]; [in, out] -> [1, out]
    amax = jnp.max(jnp.abs(arr), axis=-2, keepdims=True)
    scale = (amax / 127.0 + 1e-12).astype(jnp.float32)
    q = jnp.clip(jnp.round(arr / scale), -127, 127).astype(jnp.int8)
    return QuantWeight(q, scale)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """int8-quantize every matmul weight (qkv/o/gateup/down, lm_head);
    embeddings and norms stay float (embeds are gathers, not matmuls, and
    norm vectors are tiny)."""
    out = {
        "embed": params["embed"],
        "layers": {
            name: (_quantize(w) if name.endswith("_w") else w)
            for name, w in params["layers"].items()
        },
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = _quantize(params["lm_head"])
    return out


class Int4Weight(NamedTuple):
    """Nibble-packed int4 weight with per-(input-group, out-channel) fp32
    scales (ops/pallas_int4.pack layout: packed [..., in/2, out] int8, the
    low nibble holding input row i and the high nibble row i + in/2).

    On TPU the matmul runs the fused Pallas kernel
    (ops/pallas_int4.int4_matmul) — 0.5 bytes/element of weight HBM
    traffic, the r3-profiled remaining decode lever past int8. Off-TPU
    (tests, CPU dryrun) it falls back to dequant + dot, which XLA's SPMD
    partitioner shards like any other matmul. vLLM counterpart: 4-bit
    quantized serving (the reference delegates to vLLM's quantization
    config)."""

    packed: jnp.ndarray  # [..., in/2, out] int8
    scale: jnp.ndarray   # [..., in/group_size, out] f32


def _quantize_int4(w: jnp.ndarray, group_size: int = 128) -> Int4Weight:
    """Group-quantize one [in, out] or [L, in, out] weight on device."""
    from comorag_tpu.ops.pallas_int4 import quantize_int4_grouped

    arr = jnp.asarray(w, jnp.float32)
    d_in = arr.shape[-2]
    gs = group_size
    while gs > 2 and d_in % gs:
        gs //= 2  # tiny test archs: shrink to an aligned (even) group
    if arr.ndim == 2:
        packed, scale = quantize_int4_grouped(arr, gs)
        return Int4Weight(packed, scale)
    packed, scale = jax.vmap(lambda m: quantize_int4_grouped(m, gs))(arr)
    return Int4Weight(packed, scale)


def quantize_params_int4(params: Dict[str, Any], group_size: int = 128) -> Dict[str, Any]:
    """int4-quantize every matmul weight — 1/8 the weight HBM traffic of
    fp32 and half of int8 (VERDICT r3 #7); embeddings and norms stay
    float, exactly like ``quantize_params``."""
    out = {
        "embed": params["embed"],
        "layers": {
            name: (_quantize_int4(w, group_size) if name.endswith("_w") else w)
            for name, w in params["layers"].items()
        },
        "final_norm": params["final_norm"],
    }
    if "lm_head" in params:
        out["lm_head"] = _quantize_int4(params["lm_head"], group_size)
    return out


def _int4_dot(inp: jnp.ndarray, w: Int4Weight, compute_dtype) -> jnp.ndarray:
    """[..., in] @ Int4Weight -> [..., out] in compute_dtype."""
    from comorag_tpu.ops.pallas_int4 import dequantize_int4, int4_matmul

    half, d_out = w.packed.shape[-2], w.packed.shape[-1]
    group_size = (half * 2) // w.scale.shape[-2]
    lead = inp.shape[:-1]
    x2d = inp.reshape(-1, inp.shape[-1])
    if jax.default_backend() in ("cpu", "gpu"):
        # portable fallback: dequant + dot (partitions under SPMD). On
        # TPU the Pallas kernel runs at EVERY M: routing prefill-sized M
        # through an XLA dequant+dot was measured SLOWER (2,900 vs 3,034
        # tok/s whole-call at B=8/P=512) — the unpack's interleave
        # stack+reshape materializes layout shuffles XLA can't fuse into
        # the dot, while the kernel's adaptive tile_m=128 already keeps
        # the MXU fed at prefill.
        wf = dequantize_int4(w.packed, w.scale, group_size).astype(compute_dtype)
        out = jnp.dot(x2d.astype(compute_dtype), wf, preferred_element_type=compute_dtype)
    else:
        out = int4_matmul(x2d, w.packed, w.scale, group_size=group_size)
    return out.reshape(*lead, d_out).astype(compute_dtype)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, T, kv_heads, head_dim]
    v: jnp.ndarray  # [L, B, T, kv_heads, head_dim]

    @classmethod
    def zeros(cls, arch: DecoderArch, batch: int, max_len: int, dtype=jnp.float32):
        shape = (arch.num_layers, batch, max_len, arch.num_kv_heads, arch.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class QuantKVCache(NamedTuple):
    """int8 KV cache with per-(token, head) symmetric scales — the vLLM
    ``kv_cache_dtype`` counterpart (opt-in, engine ``kv_dtype="int8"``).

    Decode is memory-bound and at long context the cache read dominates
    even the int8 weights (r3 decode profile: 336 MB KV vs 821 MB weights
    per step at T=640; past T~2.5k the cache is the larger stream). int8
    halves/quarters that traffic; the dequant (convert + broadcast scale
    multiply) fuses into the attention dot's operand read exactly like
    QuantWeight's does."""

    k: jnp.ndarray        # [L, B, T, kv_heads, head_dim] int8
    v: jnp.ndarray        # int8
    k_scale: jnp.ndarray  # [L, B, T, kv_heads] f32
    v_scale: jnp.ndarray  # f32

    @classmethod
    def zeros(cls, arch: DecoderArch, batch: int, max_len: int, dtype=None):
        shape = (arch.num_layers, batch, max_len, arch.num_kv_heads, arch.head_dim)
        sshape = shape[:-1]
        return cls(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
        )


def _quant_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) symmetric int8: x [B, S, kvh, hd] ->
    (q int8, scale [B, S, kvh] f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = amax / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def make_kv_cache(arch: DecoderArch, batch: int, max_len: int, compute_dtype,
                  kv_dtype: Optional[str] = None):
    if kv_dtype in ("int8", jnp.int8):
        return QuantKVCache.zeros(arch, batch, max_len)
    return KVCache.zeros(arch, batch, max_len, compute_dtype)


def decoder_forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,      # [B, S] int32
    positions: jnp.ndarray,      # [B, S] int32 (cache slot index per token)
    attn_mask: jnp.ndarray,      # [B, S, T] bool: query token -> cache slot visibility
    cache: KVCache,
    write_index: jnp.ndarray,    # scalar int32 slot OR [B] per-row slots
    arch: DecoderArch,
    compute_dtype=jnp.float32,
    last_only: bool = False,     # logits for the final position only ([B, 1, V])
    remat: bool = False,         # checkpoint each layer (training: the
                                 # backward otherwise stores every layer's
                                 # [B, H, S, S] attention intermediates)
) -> Tuple[jnp.ndarray, KVCache]:
    """One forward chunk (prefill S=P or decode S=1) against a static-shape
    KV cache of T slots. Returns logits [B, S, V] and the updated cache.

    ``last_only=True`` (prefill callers that only need the next-token
    logits) runs the lm_head on the final position alone — at 0.9B scale
    a full-bucket prefill otherwise materializes a [B, P, V] fp32 logits
    tensor (0.5 GB at B=8/P=512) and pays B*P*H*V head FLOPs for rows
    that are thrown away.

    The same program serves prefill and decode — only S differs, so the
    jit cache holds exactly two programs per (B, T) shape. All control
    flow is static; the chunk is written into the cache at ``write_index``
    via a dynamic_update_slice (contiguous because prompts are
    LEFT-padded: every row's chunk occupies the same slots). A per-row
    ``write_index`` vector switches the write to a scatter — the
    speculative decode path advances rows at different rates.
    """
    b, s = input_ids.shape
    heads, kv_heads, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    groups = heads // kv_heads
    quant_kv = isinstance(cache, QuantKVCache)

    x = params["embed"][input_ids].astype(compute_dtype)
    if arch.embed_scale:
        x = x * jnp.asarray(arch.hidden_size ** 0.5, compute_dtype)
    mask_bias = jnp.where(attn_mask, 0.0, -1e30).astype(jnp.float32)  # [B, S, T]
    # fp32 operands silently truncate to bf16 on the TPU MXU unless HIGHEST
    # (CLAUDE.md numerics trap); bf16 compute keeps the fast default.
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None

    def one_layer(carry, layer_in):
        # The FULL [L, ...] caches ride the scan CARRY (aliased in place by
        # XLA's loop buffer reuse) rather than streaming through xs/ys —
        # stacked ys re-materialize the whole cache every decode step,
        # which was measured as the dominant per-step cost at 1B scale.
        if quant_kv:
            x, k_all, v_all, ks_all, vs_all = carry
        else:
            x, k_all, v_all = carry
        layer, li = layer_in

        def dot(inp, w):
            if isinstance(w, Int4Weight):
                return _int4_dot(inp, w, compute_dtype)
            if isinstance(w, QuantWeight):
                # prec matters for the ACTIVATION operand under fp32
                # compute (int8 weights upcast to bf16 exactly, but fp32
                # inputs would silently truncate on the MXU — CLAUDE.md)
                out = jnp.dot(
                    inp, w.q.astype(compute_dtype),
                    preferred_element_type=compute_dtype, precision=prec,
                )
                return out * w.scale.astype(compute_dtype)
            return jnp.dot(
                inp, w.astype(compute_dtype),
                preferred_element_type=compute_dtype, precision=prec,
            )

        q_dim = heads * hd
        kv_dim = kv_heads * hd
        xn = _rms_norm(x, layer["attn_norm"], arch.rms_norm_eps, arch.rms_unit_offset)
        qkv = dot(xn, layer["qkv_w"])
        if arch.qkv_bias:
            qkv = qkv + layer["qkv_b"].astype(qkv.dtype)
        q = qkv[..., :q_dim].reshape(b, s, heads, hd)
        k = qkv[..., q_dim:q_dim + kv_dim].reshape(b, s, kv_heads, hd)
        v = qkv[..., q_dim + kv_dim:].reshape(b, s, kv_heads, hd)
        if arch.qk_norm:
            # qwen3-class: per-head RMSNorm over head_dim, pre-RoPE; the
            # [hd] weight broadcasts over heads, so it is TP-replicable
            q = _rms_norm(q, layer["q_norm"], arch.rms_norm_eps)
            k = _rms_norm(k, layer["k_norm"], arch.rms_norm_eps)
        q = _rope(q, positions, arch.rope_theta, arch.rope_scaling)
        k = _rope(k, positions, arch.rope_theta, arch.rope_scaling)

        if quant_kv:
            k_w, k_s = _quant_kv(k)
            v_w, v_s = _quant_kv(v)
        else:
            k_w, v_w = k, v
        if jnp.ndim(write_index) == 0:
            k_all = jax.lax.dynamic_update_slice(k_all, k_w[None], (li, 0, write_index, 0, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, v_w[None], (li, 0, write_index, 0, 0))
            if quant_kv:
                ks_all = jax.lax.dynamic_update_slice(ks_all, k_s[None], (li, 0, write_index, 0))
                vs_all = jax.lax.dynamic_update_slice(vs_all, v_s[None], (li, 0, write_index, 0))
        else:
            # per-row slot starts (speculative decode): a small scatter of
            # B*S rows; the carried cache is aliased so it updates in place
            rows = jnp.arange(b)[:, None]
            cols = write_index[:, None] + jnp.arange(s)[None, :]
            k_all = k_all.at[li, rows, cols].set(k_w)
            v_all = v_all.at[li, rows, cols].set(v_w)
            if quant_kv:
                ks_all = ks_all.at[li, rows, cols].set(k_s)
                vs_all = vs_all.at[li, rows, cols].set(v_s)
        k_cache = jax.lax.dynamic_index_in_dim(k_all, li, axis=0, keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_all, li, axis=0, keepdims=False)
        if quant_kv:
            # The bare int8->compute convert fuses into the dot's operand
            # read (the measured-at-floor QuantWeight pattern); the scales
            # apply as EPILOGUES on the score-shaped tensors ([.., T] per
            # head — 64x smaller than the caches), never on the operands:
            # an operand-side `cache * scale` materialized a full bf16
            # copy and measured SLOWER than the unquantized cache.
            #   scores = (q @ k_q^T) * k_scale_t   (exact: scale is per t)
            #   ctx    = (probs * v_scale_t) @ v_q (exact: fold into p_t)
            k_scale = jax.lax.dynamic_index_in_dim(ks_all, li, axis=0, keepdims=False)
            v_scale = jax.lax.dynamic_index_in_dim(vs_all, li, axis=0, keepdims=False)
            k_cache = k_cache.astype(compute_dtype)
            v_cache = v_cache.astype(compute_dtype)
            k_epi = k_scale.transpose(0, 2, 1)[:, None, :, None, :]  # [B,1,kvh,1,T]
            v_epi = v_scale.transpose(0, 2, 1)[:, None, :, None, :]

        # GQA: keep the cache in kv-head layout and fold the group axis
        # into the einsum — expanding kv->q heads with a repeat would
        # re-materialize the whole cache every decode step (3-8x the HBM
        # traffic of the decode itself on grouped models).
        qg = q.reshape(b, s, kv_heads, groups, hd)
        scores = jnp.einsum(
            "bskgd,btkd->bskgt", qg, k_cache,
            preferred_element_type=jnp.float32, precision=prec,
        )
        if quant_kv:
            scores = scores * k_epi
        scores = scores / jnp.sqrt(float(hd)) + mask_bias[:, :, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        if quant_kv:
            probs = probs * v_epi
        probs = probs.astype(compute_dtype)
        ctx = jnp.einsum(
            "bskgt,btkd->bskgd", probs, v_cache,
            preferred_element_type=compute_dtype, precision=prec,
        )
        i_dim = arch.intermediate_size
        # Fused int4 layer tail (VERDICT r4 #5): at decode-sized rows the
        # o/gateup/down dots + residuals + ffn_norm + activation run as ONE
        # Pallas invocation (pallas_int4.int4_fused_layer_tail) — 2L+1
        # kernel launches per step instead of 4L+1; the r4 profile charged
        # ~0.76 ms/step to launch overhead across 65 invocations.
        fused_ok = (
            isinstance(layer["o_w"], Int4Weight)
            and isinstance(layer["gateup_w"], Int4Weight)
            and isinstance(layer["down_w"], Int4Weight)
            and jax.default_backend() not in ("cpu", "gpu")
        )
        if fused_ok:
            from comorag_tpu.ops.pallas_int4 import (
                fused_tail_supported,
                int4_fused_layer_tail,
            )

            o_w: Int4Weight = layer["o_w"]
            gs4 = (o_w.packed.shape[-2] * 2) // o_w.scale.shape[-2]
            fused_ok = fused_tail_supported(arch.hidden_size, i_dim, gs4, b * s)
        if fused_ok:
            dw: Int4Weight = layer["down_w"]
            guw: Int4Weight = layer["gateup_w"]
            x = int4_fused_layer_tail(
                ctx.reshape(b * s, heads * hd),
                x.reshape(b * s, arch.hidden_size),
                layer["ffn_norm"],
                o_w.packed, o_w.scale,
                guw.packed, guw.scale,
                dw.packed, dw.scale,
                group_size=gs4,
                eps=float(arch.rms_norm_eps),
                unit_offset=bool(arch.rms_unit_offset),
                act=arch.mlp_act,
            ).reshape(b, s, arch.hidden_size).astype(compute_dtype)
        else:
            attn_out = dot(ctx.reshape(b, s, heads * hd), layer["o_w"])
            x = x + attn_out

            xn = _rms_norm(x, layer["ffn_norm"], arch.rms_norm_eps, arch.rms_unit_offset)
            gu = dot(xn, layer["gateup_w"])
            if arch.mlp_act == "silu":
                act = jax.nn.silu
            elif arch.mlp_act == "gelu_tanh":  # gemma's gelu_pytorch_tanh
                act = lambda g: jax.nn.gelu(g, approximate=True)  # noqa: E731
            elif arch.mlp_act == "gelu":
                act = lambda g: jax.nn.gelu(g, approximate=False)  # noqa: E731
            else:
                raise ValueError(f"unknown mlp_act {arch.mlp_act!r}")
            ffn = dot(act(gu[..., :i_dim]) * gu[..., i_dim:], layer["down_w"])
            x = x + ffn
        if quant_kv:
            return (x, k_all, v_all, ks_all, vs_all), None
        return (x, k_all, v_all), None

    carry0 = (x, *cache)
    body = one_layer
    if remat:
        # per-layer remat: the scan backward recomputes one layer's
        # internals at a time instead of storing L x [B, H, S, S] attention
        # slabs (a 16x2048 batch stored 22.6 GB un-rematted — OOM)
        body = jax.checkpoint(one_layer, prevent_cse=False)
    (x, *new_cache), _ = jax.lax.scan(
        body,
        carry0,
        (params["layers"], jnp.arange(arch.num_layers, dtype=jnp.int32)),
    )
    x = _rms_norm(x, params["final_norm"], arch.rms_norm_eps, arch.rms_unit_offset)
    if last_only:
        x = x[:, -1:, :]
    head = params["embed"].T if arch.tie_embeddings else params["lm_head"]
    # operands stay in compute dtype (casting the [H, V] head to fp32 every
    # decode step costs ~2x the head's HBM traffic; TPU fp32 matmuls
    # truncate operands to bf16 anyway unless HIGHEST) — fp32 accumulate.
    if isinstance(head, Int4Weight):
        logits = _int4_dot(x, head, jnp.float32)
    elif isinstance(head, QuantWeight):
        logits = jnp.dot(
            x.astype(compute_dtype), head.q.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * head.scale
    else:
        logits = jnp.dot(
            x.astype(compute_dtype), head.astype(compute_dtype),
            preferred_element_type=jnp.float32, precision=prec,
        )
    return logits, type(cache)(*new_cache)


# ----------------------------------------------------------------- generate
# Prefill query-chunk width: bounds the live [B, heads, C, total] score
# slab (one full-bucket pass at B=8/P=4032 on a 0.9B model allocates
# 17 GB and OOMs the chip — see _prefill_batch).
_PREFILL_CHUNK = 512


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray   # [B, max_new_tokens] int32, pad_id after EOS
    lengths: jnp.ndarray  # [B] int32: emitted tokens incl. EOS
    steps: jnp.ndarray    # scalar int32: device loop iterations taken


def prefill_prefix(
    params: Dict[str, Any],
    prefix_ids: jnp.ndarray,  # [P0] or [1, P0] int32, no padding
    arch: DecoderArch,
    compute_dtype=jnp.float32,
    kv_dtype: Optional[str] = None,
) -> KVCache:
    """Prefill a SHARED prompt prefix once at batch 1; the returned cache
    (T = P0 slots) broadcasts across any later batch via ``generate``'s
    ``prefix`` argument — the TPU counterpart of vLLM's prefix caching
    (vllm_offline.py:50 ``enable_prefix_caching=True``): batches whose
    prompts share an instruction header (OpenIE, probes) pay the header's
    prefill FLOPs once instead of once per row."""
    ids = jnp.atleast_2d(jnp.asarray(prefix_ids, jnp.int32))
    p0 = ids.shape[1]
    positions = jnp.arange(p0, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, p0, p0), bool))
    cache = make_kv_cache(arch, 1, p0, compute_dtype, kv_dtype)
    if p0 <= _PREFILL_CHUNK:
        _, cache = decoder_forward(
            params, ids, positions, attn, cache, jnp.int32(0), arch, compute_dtype,
            last_only=True,
        )
        return cache
    # bound the score slab (see _prefill_batch); prefixes are floored to
    # 64-token multiples, NOT chunk multiples — a trailing remainder chunk
    # keeps e.g. p0=3968 off the single-shot path (whose [1, S, ..., T]
    # fp32 score slab is ~1 GB at that width and grows quadratically)
    bounds = list(range(0, p0, _PREFILL_CHUNK)) + [p0]
    for ci in range(len(bounds) - 1):
        lo, hi = bounds[ci], bounds[ci + 1]
        _, cache = decoder_forward(
            params,
            ids[:, lo:hi],
            positions[:, lo:hi],
            attn[:, lo:hi, :],
            cache,
            jnp.int32(lo),
            arch,
            compute_dtype,
            last_only=True,
        )
    return cache


def _prefill_batch(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,   # [B, P] int32, LEFT-padded
    prompt_mask: jnp.ndarray, # [B, P] int32/bool
    arch: DecoderArch,
    total: int,               # static cache slots
    prefix: Optional[KVCache],
    compute_dtype,
    kv_dtype: Optional[str] = None,
) -> Tuple[jnp.ndarray, KVCache, jnp.ndarray, jnp.ndarray]:
    """Shared prompt prefill for the sequential and speculative decode
    loops: builds the static cache (broadcasting a shared-prefix cache into
    slots [0, p0)), prefills the batch prompts at slots [p0, p0+P), and
    returns (last_logits [B,V], cache, slot_valid [B,total], row_len [B])."""
    b, p = input_ids.shape
    p0 = 0 if prefix is None else prefix.k.shape[2]
    if prefix is not None:
        expected = QuantKVCache if kv_dtype in ("int8", jnp.int8) else KVCache
        assert type(prefix) is expected, (
            "prefix cache kind must match kv_dtype (rebuild the prefix "
            f"cache: got {type(prefix).__name__} for kv_dtype={kv_dtype!r})"
        )

        # Build each cache tensor as concat(broadcast prefix, zeros tail)
        # instead of dynamic_update_slice into a zeros cache: XLA lowers
        # the latter to pad(broadcast) — a FULL-cache-sized HLO temp PER
        # tensor on top of the real buffers (2 x 4.01 GB at B=32/T=4104 on
        # a 0.9B model — the realistic-stack summarization OOM).
        def _place(src):
            head = jnp.broadcast_to(src, (src.shape[0], b) + tuple(src.shape[2:]))
            tail = jnp.zeros(
                (src.shape[0], b, total - src.shape[2]) + tuple(src.shape[3:]),
                src.dtype,
            )
            return jnp.concatenate([head, tail], axis=2)

        cache = type(prefix)(*(_place(s) for s in prefix))
    else:
        cache = make_kv_cache(arch, b, total, compute_dtype, kv_dtype)
    valid = prompt_mask.astype(bool)  # [B, P]
    # Positions are PER-ROW token indices (cumsum over valid tokens), not
    # slot indices: left-padded rows must sit at positions p0, p0+1, ...
    # directly after the shared prefix — slot-based positions would
    # inflate a short row's RoPE distance to the prefix by its pad count.
    positions = p0 + jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1, 0)
    row_len = jnp.sum(valid.astype(jnp.int32), axis=1)  # [B]
    # prefill: prefix slots always visible, causal within the prompt, pads invisible
    causal = jnp.tril(jnp.ones((p, p), bool))
    attn = causal[None, :, :] & valid[:, None, :]
    attn = jnp.pad(attn, ((0, 0), (0, 0), (p0, total - p0 - p)), constant_values=False)
    if p0:
        attn = attn.at[:, :, :p0].set(True)
    # Query-chunked prefill (r3): one full-bucket call materializes
    # [B, heads, P, total] fp32 attention scores — 17 GB at B=8/P=4032 on
    # a 0.9B model, which OOMed 16 GB HBM (found by the realistic-stack
    # run's long summarization prompts). Chunking the QUERY rows bounds
    # the live score slab at [B, heads, C, total] while the KV cache
    # builds incrementally; lm_head runs on the last position only.
    chunk = _PREFILL_CHUNK
    if p <= chunk:
        logits, cache = decoder_forward(
            params, input_ids, positions, attn, cache, jnp.int32(p0), arch,
            compute_dtype, last_only=True,
        )
    else:
        # p is usually a power-of-two bucket, but window clamping and
        # prefix stripping produce non-multiples (e.g. limit = window -
        # new-token bucket - p0 -> 3840 or 3520) — a trailing remainder
        # chunk handles those instead of asserting
        bounds = list(range(0, p, chunk)) + [p]
        for ci in range(len(bounds) - 1):
            lo, hi = bounds[ci], bounds[ci + 1]
            last = ci == len(bounds) - 2
            logits, cache = decoder_forward(
                params,
                input_ids[:, lo:hi],
                positions[:, lo:hi],
                attn[:, lo:hi, :],
                cache,
                jnp.int32(p0 + lo),
                arch,
                compute_dtype,
                last_only=last,
            )
    last_logits = logits[:, -1, :]  # left-padded: slot base-1 is the last prompt token

    slot_valid = jnp.pad(
        valid, ((0, 0), (p0, total - p0 - p)), constant_values=False
    )  # [B, total]
    if p0:
        slot_valid = slot_valid.at[:, :p0].set(True)
    return last_logits, cache, slot_valid, row_len


def generate(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,   # [B, P] int32, LEFT-padded with pad_id
    prompt_mask: jnp.ndarray, # [B, P] int32/bool, 1 on real prompt tokens
    arch: DecoderArch,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    token_table: Optional[jnp.ndarray] = None,  # [S, V] int32 DFA, -1 = forbidden
    limit: Optional[jnp.ndarray] = None,  # dynamic step cap <= max_new_tokens
    prefix: Optional[KVCache] = None,  # shared-prefix cache from prefill_prefix
    row_valid: Optional[jnp.ndarray] = None,  # [B] bool: False = batch-pad row
    compute_dtype=jnp.float32,
    kv_dtype: Optional[str] = None,  # None (compute dtype) | "int8" (QuantKVCache)
) -> GenerateResult:
    """Batched constrained generation: prefill once, then a
    ``lax.while_loop`` of single-token steps against the static KV cache,
    exiting as soon as every row has emitted EOS.

    With ``token_table`` (llm/guided.py), each step masks the logits to
    the DFA's allowed transitions and advances the per-row automaton
    state — vLLM's guided-JSON capability (vllm_offline.py:77-86) run
    entirely on device.

    With ``prefix`` (a batch-1 cache from :func:`prefill_prefix`), the
    shared header occupies slots [0, P0) for every row and only the
    remainders are prefilled here — vLLM's prefix caching, batched.
    """
    b, p = input_ids.shape
    p0 = 0 if prefix is None else prefix.k.shape[2]
    base = p0 + p
    total = base + max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)
    last_logits, cache, slot_valid0, row_len = _prefill_batch(
        params, input_ids, prompt_mask, arch, total, prefix, compute_dtype, kv_dtype
    )

    def sample(logits, state, key):
        if token_table is not None:
            allowed = token_table[state] >= 0  # [B, V]
            logits = jnp.where(allowed, logits, -jnp.inf)
        if temperature > 0.0:
            tok = jax.random.categorical(key, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        return tok.astype(jnp.int32)

    # max_new_tokens is the STATIC buffer size (jit-cache key); ``limit``
    # dynamically caps steps so one compiled program serves every smaller
    # max_tokens request.
    step_cap = jnp.int32(max_new_tokens) if limit is None else jnp.minimum(
        jnp.asarray(limit, jnp.int32), max_new_tokens
    )

    def cond(state):
        i, _, _, done, _, _, _, _ = state
        return (i < step_cap) & ~jnp.all(done)

    def body(state):
        i, cache, logits, done, dfa, key, out, slot_valid = state
        key, sub = jax.random.split(key)
        tok = sample(logits, dfa, sub)
        tok = jnp.where(done, pad_id, tok)
        emitted = ~done
        done = done | (tok == eos_id)
        if token_table is not None:
            nxt = token_table[dfa, tok]
            dfa = jnp.where(emitted, jnp.maximum(nxt, 0), dfa)
        out = out.at[:, i].set(jnp.where(emitted, tok, pad_id))
        slot_valid = slot_valid.at[:, base + i].set(emitted)

        # per-row positions continue each row's own token count (row_len),
        # independent of its padding; the cache SLOT is shared (base + i)
        pos = (p0 + row_len + i)[:, None].astype(jnp.int32)
        attn = slot_valid[:, None, :]  # decode token sees all valid slots + itself
        logits, cache = decoder_forward(
            params, tok[:, None], pos, attn, cache, base + i, arch, compute_dtype
        )
        return (i + 1, cache, logits[:, 0, :], done, dfa, key, out, slot_valid)

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    # batch-pad rows start done: otherwise their garbage decode keeps
    # jnp.all(done) False and blocks early exit for the whole batch
    done0 = jnp.zeros((b,), bool) if row_valid is None else ~row_valid.astype(bool)
    dfa0 = jnp.zeros((b,), jnp.int32)
    init = (jnp.int32(0), cache, last_logits, done0, dfa0, rng, out0, slot_valid0)
    i, _, _, _, _, _, out, slot_valid = jax.lax.while_loop(cond, body, init)
    lengths = jnp.sum(slot_valid[:, base:].astype(jnp.int32), axis=1)
    return GenerateResult(out, lengths, i)


class SpecGenerateResult(NamedTuple):
    tokens: jnp.ndarray   # [B, max_new_tokens] int32, pad_id after EOS
    lengths: jnp.ndarray  # [B] int32: emitted tokens incl. EOS
    steps: jnp.ndarray    # scalar int32: device loop iterations taken


def generate_speculative(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,   # [B, P] int32, LEFT-padded with pad_id
    prompt_mask: jnp.ndarray, # [B, P] int32/bool, 1 on real prompt tokens
    arch: DecoderArch,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int,
    draft_len: int = 7,
    token_table: Optional[jnp.ndarray] = None,
    limit: Optional[jnp.ndarray] = None,
    prefix: Optional[KVCache] = None,
    row_valid: Optional[jnp.ndarray] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    kv_dtype: Optional[str] = None,
) -> SpecGenerateResult:
    """Greedy generation with self-speculative (prompt-lookup) decoding.

    The TPU-native form of speculative decoding without a draft model
    (vLLM's ``speculative_config={"method": "ngram"}``; Saxena 2023,
    "prompt lookup decoding"): RAG outputs quote retrieved text heavily,
    so each step drafts ``draft_len`` tokens by continuing the most recent
    2-gram match in the row's own token history (prompt + accepted output)
    and verifies all draft_len+1 positions in ONE forward chunk. Decode is
    weight-HBM-bound, so a K+1-token verify step costs nearly the same
    wall time as a 1-token step — every accepted draft token is close to
    free, and at least one token commits per step (never slower in tokens
    per step than sequential decode; the only overhead is the slightly
    wider step program).

    Everything stays a single device program: static chunk shape, the
    n-gram match as a vectorized compare over the history buffer, per-row
    cache writes as a scatter (rows advance at different rates), and the
    guided-JSON DFA advanced along the chunk during verification. Output
    is exact vs ``generate(temperature=0)`` — same tokens, same lengths
    (modulo float-associativity argmax ties between the [B,1] and [B,K+1]
    forward shapes).

    ``temperature > 0`` (VERDICT r2 #5) switches verification to
    rejection sampling (vLLM ngram-speculative semantics): the draft
    proposal is deterministic (q = δ_draft), so a draft token d is
    accepted with prob ``min(1, p(d)/q(d)) = p(d)`` under the
    temperature-scaled (and DFA-masked) target distribution, and on
    rejection the next chunk's entry token resamples from
    ``norm(max(p − δ_d, 0))`` — implemented exactly by carrying the
    rejected token's logit as −inf into the next step's categorical
    draw. The committed sequence is therefore distributed identically to
    sequential sampling, while accepted drafts still commit multiple
    tokens per device step.
    """
    b, p = input_ids.shape
    k_draft = int(draft_len)
    c = k_draft + 1  # chunk = bonus token + drafts
    p0 = 0 if prefix is None else prefix.k.shape[2]
    base = p0 + p
    # +c slack: the last live iteration may write a full chunk past the cap
    total = base + max_new_tokens + c
    last_logits0, cache0, slot_valid0, row_len = _prefill_batch(
        params, input_ids, prompt_mask, arch, total, prefix, compute_dtype, kv_dtype
    )

    # token history for the n-gram lookup: row prompt (left-padded, same
    # layout as input_ids) + accepted output, contiguous at slot p
    h = p + max_new_tokens
    hist0 = jnp.zeros((b, h), jnp.int32).at[:, :p].set(input_ids)

    step_cap = jnp.int32(max_new_tokens) if limit is None else jnp.minimum(
        jnp.asarray(limit, jnp.int32), max_new_tokens
    )

    def masked_logits(logits, state):
        if token_table is not None:
            allowed = token_table[state] >= 0  # [B, V]
            logits = jnp.where(allowed, logits, -jnp.inf)
        return logits

    def masked_argmax(logits, state):
        return jnp.argmax(masked_logits(logits, state), axis=-1).astype(jnp.int32)

    rows = jnp.arange(b)[:, None]
    sampling = temperature > 0.0
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def cond(state):
        i, _, _, done, _, _, _, _, _, _ = state
        return (i < step_cap) & ~jnp.all(done)

    def body(state):
        i, cache, last_logits, done, dfa, out, slot_valid, n_emit, hist, key = state
        live = ~done
        key, k0, kacc = jax.random.split(key, 3)
        if sampling:
            # entry token ~ target distribution; a rejection in the PREVIOUS
            # step left the rejected token's logit at -inf, so this draw is
            # exactly norm(max(p - δ_rejected, 0))
            tok0 = jax.random.categorical(
                k0, masked_logits(last_logits, dfa) / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            tok0 = masked_argmax(last_logits, dfa)  # == sequential greedy's next token

        # ---- draft: continue the most recent (prev, tok0) 2-gram in history
        hend = p + n_emit  # [B] index of the next history write
        prev = jnp.take_along_axis(hist, (hend - 1)[:, None], axis=1)[:, 0]
        pos_idx = jnp.arange(h - 1)
        in_range = (pos_idx[None, :] >= (p - row_len)[:, None]) & (
            pos_idx[None, :] + 1 < hend[:, None]
        )
        m = (hist[:, :-1] == prev[:, None]) & (hist[:, 1:] == tok0[:, None]) & in_range
        score = jnp.where(m, pos_idx[None, :] + 1, 0)
        jstar = jnp.argmax(score, axis=1)  # most recent match (0 if none: junk draft, rejected)
        didx = jnp.clip(jstar[:, None] + 2 + jnp.arange(k_draft)[None, :], 0, h - 1)
        draft = jnp.take_along_axis(hist, didx, axis=1)  # [B, K]
        chunk_full = jnp.concatenate([tok0[:, None], draft], axis=1)  # [B, C]
        chunk_full = jnp.where(live[:, None], chunk_full, pad_id)

        def commit_step(args, chunk):
            """Forward a [B, W]-token chunk at per-row slots, accept its
            longest greedy-matching prefix (W=1 degenerates to the plain
            sequential decode step), and commit the accepted tokens."""
            cache, last_logits, done, dfa, out, slot_valid, n_emit, hist = args
            live = ~done
            w = chunk.shape[1]
            uw = jnp.arange(w)[None, :]
            starts = base + n_emit  # [B]
            pos = (p0 + row_len + n_emit)[:, None] + uw
            rel = jnp.arange(total)[None, None, :] - starts[:, None, None]
            attn = slot_valid[:, None, :] | ((rel >= 0) & (rel <= uw[:, :, None]))
            logits, cache = decoder_forward(
                params, chunk, pos, attn, cache, starts, arch, compute_dtype
            )  # [B, W, V]

            # verify: DFA advanced along the chunk; accepted prefix by
            # greedy equality (temp 0) or rejection sampling (temp > 0)
            states_after, greedy, pd = [], [], []
            s = dfa
            for u in range(w):  # static unroll, W is small
                if token_table is not None:
                    s = jnp.maximum(token_table[s, chunk[:, u]], 0)
                states_after.append(s)
                if sampling:
                    if u < w - 1:
                        probs = jax.nn.softmax(
                            masked_logits(logits[:, u, :], s) / temperature, axis=-1
                        )
                        pd.append(
                            jnp.take_along_axis(
                                probs, chunk[:, u + 1][:, None], axis=1
                            )[:, 0]
                        )
                else:
                    greedy.append(masked_argmax(logits[:, u, :], s))
            states_after = jnp.stack(states_after, 1)   # [B, W]
            if sampling:
                # deterministic draft (q = δ_d) => accept with prob p(d)
                accept_p = jnp.stack(pd, axis=1)        # [B, W-1]
                match = (
                    jax.random.uniform(kacc, accept_p.shape) < accept_p
                ).astype(jnp.int32)
            else:
                greedy = jnp.stack(greedy, axis=1)      # [B, W]
                match = (chunk[:, 1:] == greedy[:, :-1]).astype(jnp.int32)
            n_acc = 1 + jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [B] in 1..W
            n_acc0 = n_acc  # pre-clip acceptance count (rejection detection)
            # stop the accepted prefix at the first EOS, then at the budget
            is_eos = chunk == eos_id
            first_eos = jnp.min(
                jnp.where(is_eos & (uw < n_acc[:, None]), uw, w), axis=1
            )
            n_acc = jnp.minimum(n_acc, first_eos + 1)
            n_acc = jnp.minimum(n_acc, step_cap - n_emit)
            n_acc = jnp.where(live, n_acc, 0)
            acc = uw < n_acc[:, None]  # [B, W]

            # commit (out-of-bounds scatter indices drop the write)
            oidx = jnp.where(acc, n_emit[:, None] + uw, max_new_tokens)
            out = out.at[rows, oidx].set(chunk, mode="drop")
            sidx = jnp.where(acc, starts[:, None] + uw, total)
            slot_valid = slot_valid.at[rows, sidx].set(True, mode="drop")
            hidx = jnp.where(acc, (p + n_emit)[:, None] + uw, h)
            hist = hist.at[rows, hidx].set(chunk, mode="drop")

            n_emit = n_emit + n_acc
            done = done | jnp.any(acc & is_eos, axis=1) | (n_emit >= step_cap)
            last_idx = jnp.clip(n_acc - 1, 0, w - 1)
            if token_table is not None:
                dfa = jnp.where(
                    live,
                    jnp.take_along_axis(states_after, last_idx[:, None], axis=1)[:, 0],
                    dfa,
                )
            nxt = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0, :]
            if sampling:
                # rejection handoff: when the prefix ended on a REJECTED
                # draft (not an EOS/budget clip), the next entry draw must
                # exclude that token — norm(max(p − δ_d, 0)) — which is a
                # -inf logit carried into the next step's categorical
                rejected = live & (n_acc0 < w) & (n_acc == n_acc0)
                rej_tok = jnp.take_along_axis(
                    chunk, jnp.clip(n_acc, 0, w - 1)[:, None], axis=1
                )[:, 0]
                excl = (
                    jnp.arange(nxt.shape[1])[None, :] == rej_tok[:, None]
                ) & rejected[:, None]
                nxt = jnp.where(excl, -jnp.inf, nxt)
            last_logits = jnp.where(live[:, None], nxt, last_logits)
            return (cache, last_logits, done, dfa, out, slot_valid, n_emit, hist)

        # NOTE: a lax.cond skipping the C-wide forward when no row has an
        # n-gram match was measured 11x SLOWER (35 ms/step): carried cache
        # buffers returned through cond branches lose XLA's in-place loop
        # aliasing, so every step re-materializes the whole KV cache. The
        # unconditional chunk step costs only ~1.3x a 1-token step.
        args = (cache, last_logits, done, dfa, out, slot_valid, n_emit, hist)
        new_args = commit_step(args, chunk_full)
        return (i + 1, *new_args, key)

    out0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    done0 = jnp.zeros((b,), bool) if row_valid is None else ~row_valid.astype(bool)
    dfa0 = jnp.zeros((b,), jnp.int32)
    n_emit0 = jnp.zeros((b,), jnp.int32)
    init = (jnp.int32(0), cache0, last_logits0, done0, dfa0, out0, slot_valid0,
            n_emit0, hist0, rng)
    steps, _, _, _, _, out, _, n_emit, _, _ = jax.lax.while_loop(cond, body, init)
    return SpecGenerateResult(out, n_emit, steps)


# ------------------------------------------------------- HF weight conversion
def load_hf_decoder_checkpoint(model_name_or_path: str) -> Tuple[Dict[str, Any], DecoderArch]:
    """Convert a local HuggingFace llama-, qwen2-, qwen3- or gemma-family causal-LM
    checkpoint into this module's parameter tree (the two open families
    the reference's vLLM route is actually pointed at — vllm_offline.py
    accepts any HF name; both share this decoder's RMSNorm/SwiGLU/RoPE/GQA
    skeleton, qwen2 adding only the qkv bias). Torch (CPU) is used only at
    load time — the reference's engine keeps torch in the serving path
    (vllm_offline.py:2), ours does not."""
    import numpy as np
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_config = AutoConfig.from_pretrained(model_name_or_path)
    model = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    # bias presence is read off the weights, not the config: llama-family
    # configs carry attention_bias (default False), qwen2 has bias always
    # and no such flag
    qkv_bias = "model.layers.0.self_attn.q_proj.bias" in state

    # Family detection. Everything here shares the llama weight naming;
    # the knobs differ. Unsupported families fail LOUDLY — gemma2/3 add
    # sandwich norms / softcapping / sliding windows this forward does
    # not compute, and loading them "mostly right" is worse than an error.
    model_type = getattr(hf_config, "model_type", "llama")
    supported = {"llama", "mistral", "qwen2", "qwen3", "gemma"}
    if model_type not in supported:
        raise ValueError(
            f"model_type {model_type!r} is not supported by the JAX decoder "
            f"(supported: {sorted(supported)})"
        )
    is_gemma = model_type == "gemma"
    qk_norm = "model.layers.0.self_attn.q_norm.weight" in state

    # An ACTIVE sliding window (mistral-v0.1-class: window < the position
    # range) would need windowed masks this forward does not compute —
    # full-context logits would silently diverge past the window. Configs
    # with sliding_window=None (mistral v0.3+, most llama/qwen) are fine.
    # qwen2-class configs carry a sliding_window value gated OFF by
    # use_sliding_window=False — only an ENGAGED window is a problem
    sw = getattr(hf_config, "sliding_window", None)
    if sw and getattr(hf_config, "use_sliding_window", True) and sw < hf_config.max_position_embeddings:
        raise ValueError(
            f"active sliding_window={sw} (< max_position_embeddings="
            f"{hf_config.max_position_embeddings}) is not supported by the "
            "JAX decoder's full-context attention"
        )

    act = (
        getattr(hf_config, "hidden_activation", None)
        or getattr(hf_config, "hidden_act", "silu")
    )
    act_map = {"silu": "silu", "gelu_pytorch_tanh": "gelu_tanh", "gelu": "gelu"}
    if act not in act_map:
        raise ValueError(f"unsupported hidden activation {act!r}")

    hd_cfg = getattr(hf_config, "head_dim", None)
    default_hd = hf_config.hidden_size // hf_config.num_attention_heads
    head_dim_override = hd_cfg if hd_cfg and hd_cfg != default_hd else None

    # rope_scaling: llama-3.1+ configs carry {"rope_type": "llama3", ...}
    # (older HF versions spelled the key "type"). Unsupported kinds fail
    # LOUDLY — silently dropping the rescale would load a checkpoint whose
    # logits drift with position, the worst kind of wrong.
    rs = getattr(hf_config, "rope_scaling", None)
    rope_scaling = None
    if rs:
        kind = rs.get("rope_type", rs.get("type", "default"))
        if kind in ("default", None):
            rope_scaling = None
        elif kind == "linear":
            rope_scaling = ("linear", float(rs["factor"]))
        elif kind == "llama3":
            rope_scaling = (
                "llama3",
                float(rs["factor"]),
                float(rs["low_freq_factor"]),
                float(rs["high_freq_factor"]),
                float(rs["original_max_position_embeddings"]),
            )
        else:
            raise ValueError(
                f"rope_scaling type {kind!r} is not supported by the JAX "
                "decoder (supported: default, linear, llama3)"
            )

    arch = DecoderArch(
        qkv_bias=qkv_bias,
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads", hf_config.num_attention_heads),
        intermediate_size=hf_config.intermediate_size,
        max_seq_len=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        qk_norm=qk_norm,
        head_dim_override=head_dim_override,
        embed_scale=is_gemma,
        rms_unit_offset=is_gemma,
        mlp_act=act_map[act],
        rms_norm_eps=hf_config.rms_norm_eps,
        tie_embeddings=bool(getattr(hf_config, "tie_word_embeddings", False)),
    )

    def stack(fmt, transpose=True):
        mats = [state[fmt.format(i)] for i in range(arch.num_layers)]
        return jnp.asarray(np.stack([m.T if transpose else m for m in mats]))

    def stack_fused(*fmts):
        """Column-concatenate several projections per layer (the fused
        [q|k|v] / [gate|up] layout init_params uses)."""
        mats = [
            np.concatenate([state[f.format(i)].T for f in fmts], axis=-1)
            for i in range(arch.num_layers)
        ]
        return jnp.asarray(np.stack(mats))

    prefix = "model.layers.{}."
    params = {
        "embed": jnp.asarray(state["model.embed_tokens.weight"]),
        "layers": {
            "attn_norm": stack(prefix + "input_layernorm.weight", transpose=False),
            "qkv_w": stack_fused(
                prefix + "self_attn.q_proj.weight",
                prefix + "self_attn.k_proj.weight",
                prefix + "self_attn.v_proj.weight",
            ),
            "o_w": stack(prefix + "self_attn.o_proj.weight"),
            "ffn_norm": stack(prefix + "post_attention_layernorm.weight", transpose=False),
            "gateup_w": stack_fused(
                prefix + "mlp.gate_proj.weight", prefix + "mlp.up_proj.weight"
            ),
            "down_w": stack(prefix + "mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(state["model.norm.weight"]),
    }
    if qkv_bias:
        params["layers"]["qkv_b"] = jnp.asarray(np.stack([
            np.concatenate([
                state[prefix.format(i) + f"self_attn.{p}_proj.bias"]
                for p in ("q", "k", "v")
            ])
            for i in range(arch.num_layers)
        ]))
    if qk_norm:
        params["layers"]["q_norm"] = stack(prefix + "self_attn.q_norm.weight", transpose=False)
        params["layers"]["k_norm"] = stack(prefix + "self_attn.k_norm.weight", transpose=False)
    if not arch.tie_embeddings:
        params["lm_head"] = jnp.asarray(state["lm_head.weight"].T)
    return params, arch
