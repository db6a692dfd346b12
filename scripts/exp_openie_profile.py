"""Profile the OpenIE serving call (VERDICT r4 #3: OpenIE wall 834 s at
10k chunks = 638 batch-32 guided calls at 1.31 s/call — where does the
time go?).

Decomposes one production-shaped call (batch 32, real `ner` template +
~230-token passages, guided JSON, 64-token budget) into prefill vs
decode and A/Bs the two serving levers that change the decode step's
HBM traffic:

  - speculative on/off: prompt-lookup drafts cost an 8-position forward
    per step; under random weights acceptance ~0 so every step commits
    ~1 token — spec should be pure overhead HERE (it pays off only when
    the model actually echoes, e.g. the trained tiny checkpoint);
  - kv_dtype int8: at batch 32 x ~1.2k slots the bf16 KV read is
    ~2.5 GB/step — the dominant decode traffic (weights are 0.76 GB).

Counterpart: the reference's vLLM engine args tuning
(/root/reference/src/comorag/llm/vllm_offline.py:26-97).

Usage: python scripts/exp_openie_profile.py [--rows 32] [--calls 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_e2e import make_corpus  # noqa: E402

from comorag_tpu.prompts.manager import PromptManager  # noqa: E402
from comorag_tpu.utils import trace  # noqa: E402


def build_engine(params, arch, *, speculative: bool, kv_dtype):
    import jax.numpy as jnp

    from comorag_tpu.llm.jax_offline import JaxOfflineLLM

    return JaxOfflineLLM(
        params=params, arch=arch, param_dtype="int8",
        compute_dtype=jnp.bfloat16, speculative=speculative,
        kv_dtype=kv_dtype, temperature=0.7, max_new_tokens=64,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--calls", type=int, default=3)
    args = ap.parse_args()

    import jax

    from comorag_tpu.models.decoder import DecoderArch, init_params

    arch = DecoderArch(
        vocab_size=259, hidden_size=2048, num_layers=16, num_heads=16,
        num_kv_heads=8, intermediate_size=5632, max_seq_len=4096,
    )
    raw = init_params(jax.random.PRNGKey(0), arch)

    max_rows = max(args.rows, 64)
    chunks, _ = make_corpus(max_rows * (args.calls + 1), 8)
    pm = PromptManager()
    texts = list(chunks.values()) if hasattr(chunks, "values") else list(chunks)

    def make_batches(rows: int):
        return [
            [pm.render("ner", passage=texts[i * rows + j]) for j in range(rows)]
            for i in range(args.calls + 1)
        ]

    results = {}
    for name, spec, kv, max_toks, rows in (
        ("prefill_probe", False, None, 1, args.rows),  # prefill + 1 step
        ("plain_bf16kv", False, None, 64, args.rows),
        ("spec_bf16kv", True, None, 64, args.rows),    # bench_realistic config
        ("plain_int8kv", False, "int8", 64, args.rows),
        ("spec_int8kv", True, "int8", 64, args.rows),
        ("plain_bf16kv_b64", False, None, 64, 64),     # weight reads amortize 2x
        ("adaptive_spec", True, None, 64, args.rows),  # spec engine w/ fallback
    ):
        eng = build_engine(raw, arch, speculative=spec, kv_dtype=kv)
        batches = make_batches(rows)
        kw = dict(max_tokens=max_toks, json_template="ner")
        eng.batch_infer(batches[0], **kw)  # compile + warm prefix cache
        if name == "adaptive_spec":
            # let the fallback trigger (>=3 spec calls) AND compile the
            # plain program before timing — steady-state cost is the claim
            for _ in range(3):
                eng.batch_infer(batches[0], **kw)
        trace.reset()
        t0 = time.perf_counter()
        for i in range(args.calls):
            out = eng.batch_infer(batches[1 + i], **kw)
        wall = time.perf_counter() - t0
        c = trace.summary()["counters"]
        steps = int(c.get("llm.decode_steps", 0))
        results[name] = {
            "s_per_call": round(wall / args.calls, 4),
            "ms_per_row": round(wall / (args.calls * rows) * 1e3, 2),
            "decode_steps_per_call": round(steps / args.calls, 1),
            "completion_tok_per_row": round(
                c.get("llm.completion_tokens", 0) / (args.calls * rows), 1),
            "cached_prefix_tok_per_row": round(
                c.get("llm.cached_prefix_tokens", 0) / (args.calls * rows), 1),
            "prompt_tok_per_row": round(
                c.get("llm.prompt_tokens", 0) / (args.calls * rows), 1),
            "parsed_nonempty": sum(
                1 for r in out if r.text and "named_entities" in r.text),
            "spec_active": bool(getattr(eng, "_spec_active", False)),
        }
        del eng

    base = results["prefill_probe"]["s_per_call"]
    for name, r in results.items():
        if name != "prefill_probe" and r["decode_steps_per_call"]:
            r["decode_ms_per_step"] = round(
                (r["s_per_call"] - base) / r["decode_steps_per_call"] * 1e3, 3)
    print(json.dumps({"rows": args.rows, "profile": results}, indent=2))


if __name__ == "__main__":
    main()
