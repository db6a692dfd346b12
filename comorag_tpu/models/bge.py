"""BGE-class text encoder, implemented natively in JAX.

Replaces the reference's torch/HF encoder path (embedding_model/
BGEEmbedding.py:30-213: AutoModel forward + mean pooling + L2 norm) with a
TPU-first design:

  - a BERT/XLM-RoBERTa-family transformer encoder written directly in JAX:
    parameters are ONE stacked pytree ([L, ...] per weight) so the layer
    stack runs as ``lax.scan`` — single compile, MXU-friendly;
  - masked mean pooling + L2 normalization fused into the jitted forward;
  - sequence/batch bucketing so the jit cache stays small;
  - optional bfloat16 activations (params stay f32 master copies);
  - data-parallel encoding over a mesh ``data`` axis and tensor-parallel
    parameter shardings for training (``param_shardings``);
  - weight import from a local HuggingFace torch checkpoint
    (``load_hf_checkpoint``) — same weights, same outputs, no torch in the
    serving path.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from comorag_tpu.models.base import BaseEncoder
from comorag_tpu.utils.logging import get_logger

from comorag_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class EncoderArch:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    position_offset: int = 0  # RoBERTa-family uses pad_token_id + 1

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "EncoderArch":
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_position=128,
        )


# ------------------------------------------------------------------- params
def init_params(key: jax.Array, arch: EncoderArch) -> Dict[str, Any]:
    h, i, l = arch.hidden_size, arch.intermediate_size, arch.num_layers
    keys = jax.random.split(key, 12)
    scale = 0.02

    def norm(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    return {
        "embed": {
            "word": norm(keys[0], (arch.vocab_size, h)),
            "position": norm(keys[1], (arch.max_position, h)),
            "token_type": norm(keys[2], (arch.type_vocab_size, h)),
            "ln_scale": jnp.ones((h,)),
            "ln_bias": jnp.zeros((h,)),
        },
        "layers": {
            "q_w": norm(keys[3], (l, h, h)),
            "q_b": jnp.zeros((l, h)),
            "k_w": norm(keys[4], (l, h, h)),
            "k_b": jnp.zeros((l, h)),
            "v_w": norm(keys[5], (l, h, h)),
            "v_b": jnp.zeros((l, h)),
            "o_w": norm(keys[6], (l, h, h)),
            "o_b": jnp.zeros((l, h)),
            "attn_ln_scale": jnp.ones((l, h)),
            "attn_ln_bias": jnp.zeros((l, h)),
            "ffn_in_w": norm(keys[7], (l, h, i)),
            "ffn_in_b": jnp.zeros((l, i)),
            "ffn_out_w": norm(keys[8], (l, i, h)),
            "ffn_out_b": jnp.zeros((l, h)),
            "ffn_ln_scale": jnp.ones((l, h)),
            "ffn_ln_bias": jnp.zeros((l, h)),
        },
    }


def param_shardings(mesh, dp_axis: str = "data", tp_axis: str = "model"):
    """Tensor-parallel NamedShardings: attention projections and the FFN
    split on their head/intermediate dimension over ``tp_axis``; everything
    else replicated. XLA inserts the (reduce-scatter/all-gather) collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def ns(*spec):
        # a mesh without the tp axis (pure data parallelism — the train
        # CLI's own `--mesh_shape data=8` example) replicates instead of
        # crashing on an unknown PartitionSpec axis
        spec = tuple(s if s is None or s in mesh.shape else None for s in spec)
        return NamedSharding(mesh, P(*spec))

    return {
        "embed": {
            "word": ns(None, None),
            "position": ns(None, None),
            "token_type": ns(None, None),
            "ln_scale": ns(None),
            "ln_bias": ns(None),
        },
        "layers": {
            "q_w": ns(None, None, tp_axis),
            "q_b": ns(None, tp_axis),
            "k_w": ns(None, None, tp_axis),
            "k_b": ns(None, tp_axis),
            "v_w": ns(None, None, tp_axis),
            "v_b": ns(None, tp_axis),
            "o_w": ns(None, tp_axis, None),
            "o_b": ns(None, None),
            "attn_ln_scale": ns(None, None),
            "attn_ln_bias": ns(None, None),
            "ffn_in_w": ns(None, None, tp_axis),
            "ffn_in_b": ns(None, tp_axis),
            "ffn_out_w": ns(None, tp_axis, None),
            "ffn_out_b": ns(None, None),
            "ffn_ln_scale": ns(None, None),
            "ffn_ln_bias": ns(None, None),
        },
    }


# ------------------------------------------------------------------ forward
def _layer_norm(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def encoder_forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,       # [B, S] int32
    attention_mask: jnp.ndarray,  # [B, S] int32/bool
    arch: EncoderArch,
    compute_dtype=jnp.float32,
    attention: str = "xla",       # "xla" | "pallas" | "pallas_interpret"
    ffn: str = "auto",            # "auto" (follow attention) | "xla" | "pallas"
) -> jnp.ndarray:
    """Token embeddings -> transformer stack (lax.scan) -> [B, S, H].

    ``attention="pallas"`` runs the fused VMEM-resident attention kernel
    (ops/pallas_attention.py) — the [B, H, S, S] score tensor never hits
    HBM — and (``ffn="auto"``) the fused FFN kernel (ops/pallas_ffn.py)
    alongside it. Inference-path only (the kernels have no VJP); training
    keeps the XLA graph."""
    from comorag_tpu.ops.pallas_ffn import fused_encoder_ffn, fused_ffn_supported
    b, s = input_ids.shape
    h = arch.hidden_size
    heads = arch.num_heads
    head_dim = h // heads
    eps = arch.layer_norm_eps

    emb = params["embed"]
    positions = jnp.arange(s, dtype=jnp.int32) + arch.position_offset
    x = (
        emb["word"][input_ids]
        + emb["position"][positions][None, :, :]
        + emb["token_type"][jnp.zeros((b, s), jnp.int32)]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], eps).astype(compute_dtype)

    mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30).astype(compute_dtype)

    # The fused FFN kernel rides the same flag as the fused attention
    # (both are the inference hot path; both fall back for Mosaic-illegal
    # tiny shapes). ffn="xla" opts out for A/B benching.
    if ffn == "auto":
        use_pallas_ffn = attention.startswith("pallas") and fused_ffn_supported(
            b * s, h, arch.intermediate_size
        )
    else:
        use_pallas_ffn = ffn.startswith("pallas")
    ffn_interpret = attention == "pallas_interpret" or ffn == "pallas_interpret"

    # fp32 operands silently truncate to bf16 on the TPU MXU unless
    # HIGHEST (CLAUDE.md numerics trap — same guard as models/decoder.py):
    # the fp32 path is the HF-parity contract, bf16 keeps the fast default.
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None

    def one_layer(x, layer):
        def proj(w, bias):
            return (jnp.dot(x, w.astype(compute_dtype), preferred_element_type=compute_dtype,
                            precision=prec)
                    + bias.astype(compute_dtype))

        if attention.startswith("pallas"):
            from comorag_tpu.ops.pallas_attention import flash_encoder_attention

            # projection-native [B, S, H] in and out: no transposes. The
            # r3 trace showed the [B,H,S,dh] relayouts fusing into the
            # following LayerNorm's reduce at ~13x its normal cost.
            ctx = flash_encoder_attention(
                proj(layer["q_w"], layer["q_b"]),
                proj(layer["k_w"], layer["k_b"]),
                proj(layer["v_w"], layer["v_b"]),
                attention_mask,
                num_heads=heads,
                interpret=attention == "pallas_interpret",
            )
        else:
            q = proj(layer["q_w"], layer["q_b"]).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
            k = proj(layer["k_w"], layer["k_b"]).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
            v = proj(layer["v_w"], layer["v_b"]).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                                precision=prec)
            scores = scores / jnp.sqrt(float(head_dim)) + mask_bias
            probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=compute_dtype,
                             precision=prec)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        attn_out = (jnp.dot(ctx, layer["o_w"].astype(compute_dtype), preferred_element_type=compute_dtype, precision=prec)
                    + layer["o_b"].astype(compute_dtype))

        if use_pallas_ffn:
            # Fused VMEM-resident half-layer (ops/pallas_ffn.py): LN ->
            # ffn_in -> gelu -> ffn_out -> residual -> LN in one row-tiled
            # program — the [B, S, 4H] gelu mid tensor never touches HBM
            # and both LNs stop paying their own [B, S, H] round-trips.
            # XLA's best achievable here was an EmitAllBatchInSublanes
            # windowed-conv fusion at ~1.8 ms/layer vs the ~0.7 ms matmul
            # entitlement (r3 trace).
            x2 = fused_encoder_ffn(
                x + attn_out,
                layer["attn_ln_scale"], layer["attn_ln_bias"],
                layer["ffn_in_w"].astype(compute_dtype), layer["ffn_in_b"],
                layer["ffn_out_w"].astype(compute_dtype), layer["ffn_out_b"],
                layer["ffn_ln_scale"], layer["ffn_ln_bias"],
                eps=eps,
                interpret=ffn_interpret,
            )
            return x2.astype(compute_dtype), None

        x1 = _layer_norm((x + attn_out).astype(jnp.float32), layer["attn_ln_scale"], layer["attn_ln_bias"], eps)
        x1 = x1.astype(compute_dtype)
        ffn = (jnp.dot(x1, layer["ffn_in_w"].astype(compute_dtype), preferred_element_type=compute_dtype, precision=prec)
               + layer["ffn_in_b"].astype(compute_dtype))
        ffn = jax.nn.gelu(ffn, approximate=False)
        if attention.startswith("pallas"):
            # ONE barrier after gelu: with the fused-attention graph shape
            # XLA swallowed LN + ffn_in + gelu + ffn_out + residual into a
            # single EmitAllBatchInSublanes windowed-conv kernel at
            # ~4.4 ms/layer (~35% MXU, r3 trace). This split emits ffn_out
            # as a clean MXU matmul (98.6 -> 29.8 ms over the trace).
            # Barriers around EVERY stage were measured WORSE (990 vs
            # 1096 texts/s): the materialized [B,S,4H] mid tensors cost
            # more than the extra fusion saved. Numerics-neutral.
            ffn = jax.lax.optimization_barrier(ffn)
        ffn = (jnp.dot(ffn, layer["ffn_out_w"].astype(compute_dtype), preferred_element_type=compute_dtype, precision=prec)
               + layer["ffn_out_b"].astype(compute_dtype))
        x2 = _layer_norm((x1 + ffn).astype(jnp.float32), layer["ffn_ln_scale"], layer["ffn_ln_bias"], eps)
        return x2.astype(compute_dtype), None

    x, _ = jax.lax.scan(one_layer, x, params["layers"])
    return x.astype(jnp.float32)


def encode_pooled(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    arch: EncoderArch,
    compute_dtype=jnp.float32,
    normalize: bool = True,
    attention: str = "xla",
    ffn: str = "auto",
) -> jnp.ndarray:
    """Forward -> masked mean pooling -> (optional) L2 normalization.
    Pooling semantics match BGEEmbedding.mean_pooling (:15-28)."""
    hidden = encoder_forward(
        params, input_ids, attention_mask, arch, compute_dtype,
        attention=attention, ffn=ffn,
    )
    mask = attention_mask[..., None].astype(jnp.float32)
    pooled = jnp.sum(hidden * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    if normalize:
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled


# ------------------------------------------------------- HF weight conversion
def load_hf_checkpoint(model_name_or_path: str) -> Tuple[Dict[str, Any], EncoderArch]:
    """Convert a local HuggingFace BERT/XLM-R-family checkpoint into this
    module's parameter tree. Torch (CPU) is used only at load time."""
    from transformers import AutoConfig, AutoModel

    hf_config = AutoConfig.from_pretrained(model_name_or_path)
    model = AutoModel.from_pretrained(model_name_or_path)
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    is_roberta = "roberta" in hf_config.model_type

    arch = EncoderArch(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position=hf_config.max_position_embeddings,
        type_vocab_size=getattr(hf_config, "type_vocab_size", 1),
        layer_norm_eps=hf_config.layer_norm_eps,
        pad_token_id=hf_config.pad_token_id or 0,
        position_offset=(hf_config.pad_token_id + 1) if is_roberta else 0,
    )

    def get(name):
        return jnp.asarray(state[name])

    def stack(fmt, transpose=False):
        mats = [state[fmt.format(i)] for i in range(arch.num_layers)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(arr)

    prefix = "encoder.layer.{}."
    params = {
        "embed": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        },
        "layers": {
            "q_w": stack(prefix + "attention.self.query.weight", transpose=True),
            "q_b": stack(prefix + "attention.self.query.bias"),
            "k_w": stack(prefix + "attention.self.key.weight", transpose=True),
            "k_b": stack(prefix + "attention.self.key.bias"),
            "v_w": stack(prefix + "attention.self.value.weight", transpose=True),
            "v_b": stack(prefix + "attention.self.value.bias"),
            "o_w": stack(prefix + "attention.output.dense.weight", transpose=True),
            "o_b": stack(prefix + "attention.output.dense.bias"),
            "attn_ln_scale": stack(prefix + "attention.output.LayerNorm.weight"),
            "attn_ln_bias": stack(prefix + "attention.output.LayerNorm.bias"),
            "ffn_in_w": stack(prefix + "intermediate.dense.weight", transpose=True),
            "ffn_in_b": stack(prefix + "intermediate.dense.bias"),
            "ffn_out_w": stack(prefix + "output.dense.weight", transpose=True),
            "ffn_out_b": stack(prefix + "output.dense.bias"),
            "ffn_ln_scale": stack(prefix + "output.LayerNorm.weight"),
            "ffn_ln_bias": stack(prefix + "output.LayerNorm.bias"),
        },
    }
    return params, arch


# -------------------------------------------------------------- host wrapper
_SEQ_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _seq_bucket(n: int, cap: int) -> int:
    for b in _SEQ_BUCKETS:
        if n <= b:
            return min(b, cap)
    return cap


class SimpleHashTokenizer:
    """Vocab-free tokenizer for hermetic tests: word -> stable hash bucket.
    Real deployments pass a HuggingFace tokenizer."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size
        self.pad_token_id = 0
        self.cls_token_id = 1

    def __call__(self, texts: List[str], max_length: int):
        ids, masks = [], []
        for text in texts:
            words = text.lower().split()[: max_length - 1]
            row = [self.cls_token_id] + [
                2 + int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little") % (self.vocab_size - 2)
                for w in words
            ]
            ids.append(row)
            masks.append([1] * len(row))
        return ids, masks


class BGEJaxEncoder(BaseEncoder):
    """Host-facing encoder with bucketing, batching, and mesh placement."""

    # BGE instruction prefix semantics (BGEEmbedding.py:82-83)
    default_instruction = ""

    def __init__(
        self,
        model_name_or_path: Optional[str] = None,
        params: Optional[Dict[str, Any]] = None,
        arch: Optional[EncoderArch] = None,
        tokenizer=None,
        max_seq_len: int = 512,
        batch_size: int = 32,
        mesh=None,
        compute_dtype=jnp.float32,
        attention: str = "auto",  # "auto" | "xla" | "pallas"
    ):
        if params is None or arch is None:
            if model_name_or_path is None:
                raise ValueError("need model_name_or_path or (params, arch)")
            params, arch = load_hf_checkpoint(model_name_or_path)
        self.params = params
        self.arch = arch
        # distinguishes checkpoints sharing an architecture in store validation
        self.fingerprint_extra = (
            os.path.basename(str(model_name_or_path).rstrip("/\\"))
            if model_name_or_path
            else f"L{arch.num_layers}h{arch.hidden_size}"
        )
        self.max_seq_len = min(max_seq_len, arch.max_position - arch.position_offset)
        self.batch_size = batch_size
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.dim = arch.hidden_size

        if tokenizer is None and model_name_or_path is not None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.tokenizer = tokenizer or SimpleHashTokenizer(arch.vocab_size)

        if mesh is not None and "data" in mesh.shape:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data", None))
        else:
            self._batch_sharding = None

        # "auto": the fused attention kernel on a real single-device TPU
        # backend, the XLA path elsewhere (CPU tests use
        # attention="pallas_interpret" explicitly). Meshes keep XLA
        # attention — GSPMD can't auto-partition a pallas_call; the
        # sharded encode path would need a shard_map wrapper.
        if attention == "auto":
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            # fp32 compute is the HF-parity contract; the Pallas kernels
            # feed bf16 to the MXU by design (throughput path), so auto
            # only picks them for bf16 compute. fp32 XLA matmuls carry
            # Precision.HIGHEST for true fp32 passes.
            fast = compute_dtype != jnp.float32
            attention = "pallas" if (on_tpu and mesh is None and fast) else "xla"
        self.attention = attention
        self._encode_fn = functools.partial(
            jax.jit(
                encode_pooled,
                static_argnames=("arch", "compute_dtype", "normalize", "attention", "ffn"),
            ),
            arch=self.arch,
            compute_dtype=self.compute_dtype,
            attention=self.attention,
        )

    # ------------------------------------------------------------- tokenize
    def _tokenize(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(self.tokenizer, SimpleHashTokenizer):
            ids, masks = self.tokenizer(texts, self.max_seq_len)
        else:
            out = self.tokenizer(
                texts, padding=False, truncation=True, max_length=self.max_seq_len
            )
            ids, masks = out["input_ids"], out["attention_mask"]
        max_len = max((len(r) for r in ids), default=1)
        s = _seq_bucket(max_len, self.max_seq_len)
        b = len(ids)
        dp = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        # the batch must divide by the data axis AND stay sublane-aligned
        pad_unit = math.lcm(8, dp)
        b_pad = ((b + pad_unit - 1) // pad_unit) * pad_unit
        id_arr = np.zeros((b_pad, s), np.int32)
        mask_arr = np.zeros((b_pad, s), np.int32)
        for i, (row, mask) in enumerate(zip(ids, masks)):
            row = row[:s]
            mask = mask[:s]
            id_arr[i, : len(row)] = row
            mask_arr[i, : len(mask)] = mask
        mask_arr[b:, 0] = 1  # padding rows: one valid token to avoid 0/0
        return id_arr, mask_arr

    # --------------------------------------------------------------- encode
    def encode(self, texts, instruction: str = "", norm=None) -> np.ndarray:
        norm = self.resolve_norm(norm)
        texts = self._as_list(texts)
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        if instruction:
            texts = [instruction + t for t in texts]
        # Pipelined with a bounded window: dispatch ahead so device
        # compute and host copies overlap (one blocking round-trip per
        # batch is the dominant cost on remote-attached chips), but drain
        # the oldest batch once `window` are in flight — an unbounded
        # pipeline holds every input and output buffer on device at once,
        # which exhausts HBM on 100k-chunk corpus encodes (same bound as
        # MipsIndex.topk_many).
        window = 64
        pending = []
        out = []

        def drain_one():
            pooled, valid = pending.pop(0)
            out.append(np.asarray(pooled)[:valid])

        for i in range(0, len(texts), self.batch_size):
            ids, mask = self._tokenize(texts[i : i + self.batch_size])
            ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
            if self._batch_sharding is not None:
                ids_j = jax.device_put(ids_j, self._batch_sharding)
                mask_j = jax.device_put(mask_j, self._batch_sharding)
            pooled = self._encode_fn(self.params, ids_j, mask_j, normalize=norm)
            try:
                pooled.copy_to_host_async()
            except Exception:  # pragma: no cover - platform without async copies
                pass
            pending.append((pooled, min(self.batch_size, len(texts) - i)))
            if len(pending) >= window:
                drain_one()
        while pending:
            drain_one()
        return np.concatenate(out, axis=0)

    def encode_device(self, texts, instruction: str = "", norm=None) -> jax.Array:
        """Like :meth:`encode` but the result STAYS on device ([n, dim]
        jax array): the retrieval indexes accept device queries directly
        (MipsIndex._prep_queries), so query embeddings handed off this way
        never pay the device->host->device round-trip through the tunnel.
        Intended for query batches (a probe fan-out), not corpus encodes —
        the concatenated output lives in HBM."""
        norm = self.resolve_norm(norm)
        texts = self._as_list(texts)
        if not texts:
            return jnp.zeros((0, self.dim), jnp.float32)
        if instruction:
            texts = [instruction + t for t in texts]
        pooled_parts = []
        for i in range(0, len(texts), self.batch_size):
            ids, mask = self._tokenize(texts[i : i + self.batch_size])
            ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
            if self._batch_sharding is not None:
                ids_j = jax.device_put(ids_j, self._batch_sharding)
                mask_j = jax.device_put(mask_j, self._batch_sharding)
            pooled = self._encode_fn(self.params, ids_j, mask_j, normalize=norm)
            valid = min(self.batch_size, len(texts) - i)
            pooled_parts.append(pooled[:valid])
        return pooled_parts[0] if len(pooled_parts) == 1 else jnp.concatenate(pooled_parts, axis=0)
