"""Contrastive encoder training throughput on the real chip.

The reference has NO training story at all; this measures ours: the
bert-base-class dual-encoder contrastive step (models/train.py) at
128-token query/passage pairs, bf16 and fp32 activations, one chip.
Multi-chip (dp x tp) correctness is covered by `dryrun_multichip` and
tests/test_encoder.py; throughput there needs real chips.

Usage: python scripts/bench_train.py [--batch 64] [--steps 20]
Prints one JSON line per dtype.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from comorag_tpu.models.bge import EncoderArch
    from comorag_tpu.models.train import create_train_state, make_train_step

    arch = EncoderArch()  # bert-base class
    rng = np.random.default_rng(0)
    batch = {
        "q_ids": jnp.asarray(rng.integers(3, arch.vocab_size, (args.batch, args.seq)), jnp.int32),
        "q_mask": jnp.ones((args.batch, args.seq), jnp.int32),
        "p_ids": jnp.asarray(rng.integers(3, arch.vocab_size, (args.batch, args.seq)), jnp.int32),
        "p_mask": jnp.ones((args.batch, args.seq), jnp.int32),
    }

    for name, dtype, bsz in (
        ("bf16", jnp.bfloat16, args.batch),
        # fp32 activations at batch 64 exceed one chip's HBM (measured:
        # 15.91G needed vs 15.75G) — bench the largest power of two that fits
        ("fp32", jnp.float32, args.batch // 2),
    ):
        b = {k: v[:bsz] for k, v in batch.items()}
        state = create_train_state(jax.random.PRNGKey(0), arch)
        step = make_train_step(arch, compute_dtype=dtype)
        def drain(st):
            # block_until_ready is NOT a reliable barrier through the
            # remote tunnel; an actual device->host fetch of a param leaf
            # is — it depends on the whole optimizer-update chain
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            np.asarray(leaf[:1, :1] if leaf.ndim >= 2 else leaf[:1])

        state, loss = step(state, b)  # compile + warm
        drain(state)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = step(state, b)
        drain(state)
        dt = time.perf_counter() - t0
        pairs_s = bsz * args.steps / dt
        print(json.dumps({
            "metric": "train_pairs_per_s",
            "dtype": name,
            "batch": bsz,
            "seq": args.seq,
            "value": round(pairs_s, 1),
            "step_ms": round(1000 * dt / args.steps, 1),
            "loss": float(loss),
        }), flush=True)


if __name__ == "__main__":
    main()
