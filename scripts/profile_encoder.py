"""Capture a jax.profiler trace of the fused-kernel encoder forward and
aggregate device-op self-times (same recipe as profile_decode.py — traces
work through the axon tunnel).

r3 context: with the fused attention + fused FFN kernels the bf16
B=64/S=512 bert-base forward runs at 1348 texts/s (0.59 of the measured
220 TF/s matmul ceiling). This script shows where the remaining slack
lives (expected: the dh=64 attention contractions at half MXU depth, the
QKV/O projections, embedding/pooling edges).

Usage: python scripts/profile_encoder.py [--batch 64] [--seq 512]
       [--attention pallas] [--ffn auto] [--out /tmp/jax_trace_enc]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--attention", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--ffn", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--out", default="/tmp/jax_trace_enc")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from comorag_tpu.models.bge import EncoderArch, encode_pooled, init_params

    arch = EncoderArch(
        vocab_size=30522, hidden_size=768, num_layers=12,
        num_heads=12, intermediate_size=3072, max_position=512,
    )
    params = init_params(jax.random.PRNGKey(0), arch)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    fwd = jax.jit(
        encode_pooled,
        static_argnames=("arch", "compute_dtype", "normalize", "attention", "ffn"),
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, arch.vocab_size, (args.batch, args.seq)), jnp.int32)
    mask = jnp.ones_like(ids)
    kw = dict(arch=arch, compute_dtype=dtype, attention=args.attention, ffn=args.ffn)
    np.asarray(fwd(params, ids, mask, **kw))  # warm/compile

    with jax.profiler.trace(args.out):
        for _ in range(3):
            np.asarray(fwd(params, ids, mask, **kw))

    paths = sorted(glob.glob(os.path.join(args.out, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace written under {args.out}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    by = defaultdict(float)
    n = defaultdict(int)
    for ev in d.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        by[name] += ev["dur"]
        n[name] += 1
    total = sum(by.values())
    print(f"# trace {paths[-1]}")
    print(f"# total accounted {total/1e3:.1f} ms over all rows (3 calls)")
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/1e3:9.2f} ms  x{n[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
