"""Capture a jax.profiler trace of the int8 decode step and aggregate
device-op self-times (the r3 encoder-profiling recipe — traces DO work
through the axon tunnel; parse vm.trace.json.gz, group dur by op name).

Usage: python scripts/profile_decode.py [--batch 8] [--prompt 512]
       [--new 64] [--kv int8] [--out /tmp/jax_trace_dec]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--kv", default=None, choices=[None, "int8"])
    ap.add_argument("--out", default="/tmp/jax_trace_dec")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from comorag_tpu.models.decoder import (
        DecoderArch, generate, init_params, quantize_params,
    )

    arch = DecoderArch(
        vocab_size=32000,
        hidden_size=args.hidden,
        num_layers=args.layers,
        num_heads=args.hidden // 128,
        num_kv_heads=max(1, args.hidden // 256),
        intermediate_size=int(args.hidden * 2.75),
        max_seq_len=4096,
    )
    gen = jax.jit(
        generate,
        static_argnames=("arch", "max_new_tokens", "eos_id", "pad_id",
                         "temperature", "compute_dtype", "kv_dtype"),
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30000, (args.batch, args.prompt)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = quantize_params(init_params(jax.random.PRNGKey(0), arch))
    params["embed"] = params["embed"].astype(jnp.bfloat16)
    kwargs = dict(
        arch=arch, max_new_tokens=args.new, eos_id=arch.vocab_size - 1,
        pad_id=0, temperature=0.7, rng=jax.random.PRNGKey(1),
        compute_dtype=jnp.bfloat16, kv_dtype=args.kv,
    )
    np.asarray(gen(params, ids, mask, **kwargs).tokens)  # warm/compile

    with jax.profiler.trace(args.out):
        for _ in range(2):
            np.asarray(gen(params, ids, mask, **kwargs).tokens)

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
        # device op rows carry XLA op names; skip host-side python rows
        if ev.get("pid") is None or "args" not in ev and "/" not in name:
            pass
        by[name] += ev["dur"]
        n[name] += 1
    total = sum(by.values())
    print(f"# trace {paths[-1]}")
    print(f"# total accounted {total/1e3:.1f} ms over all rows (2 calls)")
    for name, dur in sorted(by.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/1e3:9.2f} ms  x{n[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
