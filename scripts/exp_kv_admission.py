"""Repro for the realistic-stack b64 OOM (r5): which (batch, prompt)
program blows HBM under int8-KV admission?

The token-budget admission (jax_offline.batch_infer) counts KV bytes
only; the chunked-prefill f32 score slab [B, heads, 512, slots] costs a
comparable ~32 KB/slot-row at the 0.76B arch and is unaccounted, so
halving KV bytes (kv_dtype=int8) doubles admitted rows and doubles the
slab. This drives the exact serving shapes the 10k realistic bench runs
(OpenIE ~760-token rows at b64; timeline/summarize ~3.5k-token rows)
and prints pass/OOM per shape.

Usage: python scripts/exp_kv_admission.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from comorag_tpu.llm.jax_offline import JaxOfflineLLM
    from comorag_tpu.models.decoder import DecoderArch, init_params

    arch = DecoderArch(
        vocab_size=259, hidden_size=2048, num_layers=16, num_heads=16,
        num_kv_heads=8, intermediate_size=5632, max_seq_len=4096,
    )
    raw = init_params(jax.random.PRNGKey(0), arch)
    eng = JaxOfflineLLM(
        params=raw, arch=arch, param_dtype="int8", compute_dtype=jnp.bfloat16,
        kv_dtype="int8", temperature=0.7, max_new_tokens=64,
    )
    rng = np.random.default_rng(0)

    def prompt(n_tok: int) -> list:
        body = " ".join(
            f"w{int(x)}" for x in rng.integers(0, 9999, max(4, n_tok // 6))
        )[: n_tok - 2]
        return [{"role": "user", "content": body}]

    for label, rows, ptok in (
        ("openie_b64_p760", 64, 760),
        ("summarize_b32_p3500", 32, 3500),
    ):
        batch = [prompt(ptok) for _ in range(rows)]
        t0 = time.perf_counter()
        out = eng.batch_infer(batch, max_tokens=64)
        wall = time.perf_counter() - t0
        errs = [r.metadata.get("error") for r in out if r.metadata.get("error")]
        print(
            f"{label}: wall={wall:.1f}s errors={len(errs)}"
            + (f" first_error={errs[0][:300]}" if errs else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
