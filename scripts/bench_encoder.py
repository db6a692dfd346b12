"""Encoder throughput at real-checkpoint scale (VERDICT round-1 item 9).

Builds a bert-base-sized HF checkpoint on disk (random weights — throughput
is weight-value independent; zero-egress forbids downloading the real BGE),
converts it through the SAME ``load_hf_checkpoint`` path that
``test_hf_checkpoint_parity`` proves numerically equivalent to the torch
forward, and measures pooled-encode throughput on the real chip at
512-token sequences (the reference's deployment shape, BGEEmbedding.py:131-185).

Usage:  python scripts/bench_encoder.py [--texts 768] [--batch 32]
Prints one JSON line per (dtype, seq) config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--texts", type=int, default=768)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ckpt", default="/tmp/bert-base-random")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.ckpt, "config.json")):
        import torch  # noqa: F401  (transformers needs it for save)
        import transformers

        cfg = transformers.BertConfig()  # bert-base: 12L, 768h, 12 heads
        model = transformers.BertModel(cfg)
        model.eval()
        model.save_pretrained(args.ckpt)
        print(f"# saved random bert-base checkpoint to {args.ckpt}", flush=True)

    import jax.numpy as jnp

    from comorag_tpu.models.bge import BGEJaxEncoder, load_hf_checkpoint

    params, arch = load_hf_checkpoint(args.ckpt)
    rng = np.random.default_rng(0)
    # ~620 words -> every row fills the 512-token bucket via the hash tokenizer
    vocab = [f"w{i}" for i in range(4096)]
    texts = [
        " ".join(vocab[j] for j in rng.integers(0, len(vocab), 620))
        for _ in range(args.texts)
    ]

    # FLOPs per text at S=512: 12 layers x (4 QKVO + 2 FFN matmuls) +
    # 2 attention matmuls per layer — the MFU denominator for v5e bf16
    # peak (197 TFLOP/s)
    h, i_sz, L, S = arch.hidden_size, arch.intermediate_size, arch.num_layers, 512
    flops_text = 2 * S * L * (4 * h * h + 2 * h * i_sz) + 2 * L * (2 * S * S * h)
    peak = 197e12

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        for attn in ("pallas", "xla"):
            enc = BGEJaxEncoder(
                params=params,
                arch=arch,
                max_seq_len=512,
                batch_size=args.batch,
                compute_dtype=dtype,
                attention=attn,
            )
            enc.encode(texts[: args.batch])  # compile + warm
            t0 = time.perf_counter()
            out = enc.encode(texts)
            dt = time.perf_counter() - t0
            tps = len(texts) / dt
            print(json.dumps({
                "metric": "encoder_texts_per_s",
                "dtype": dtype_name,
                "attention": attn,
                "seq": 512,
                "batch": args.batch,
                "texts": len(texts),
                "value": round(tps, 1),
                "wall_s": round(dt, 2),
                "mfu_vs_bf16_peak": round(tps * flops_text / peak, 4),
                "dim": int(out.shape[1]),
            }), flush=True)


if __name__ == "__main__":
    main()
