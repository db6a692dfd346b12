"""Offline generation engine throughput on the real chip.

Measures the JAX decoder (models/decoder.py) at a ~1B-parameter llama-class
shape: prefill tokens/s and decode tokens/s, free-running and with the
guided-JSON DFA mask active (weights are random — throughput is
weight-value independent; correctness of the HF conversion and the cache
is covered by tests/test_offline_llm.py).

The whole generation — prefill + the full while_loop decode — is ONE
device program per call, so the ~30 ms tunnel round-trip is paid once per
batch, not once per token (the design reason for lax.while_loop decoding).

Usage:  python scripts/bench_decode.py [--batch 8] [--prompt 512] [--new 128]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--dtypes", default="int4,int8,bf16,fp32",
                    help="comma-separated subset for targeted reruns")
    ap.add_argument("--skip_spec", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from comorag_tpu.llm.guided import JSON_TEMPLATES, compile_json_schema, make_token_table
    from comorag_tpu.models.decoder import DecoderArch, generate, init_params

    arch = DecoderArch(
        vocab_size=32000,
        hidden_size=args.hidden,
        num_layers=args.layers,
        num_heads=args.hidden // 128,
        num_kv_heads=max(1, args.hidden // 256),
        intermediate_size=int(args.hidden * 2.75),
        max_seq_len=4096,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(init_params(jax.random.PRNGKey(0), arch))
    )
    print(f"# arch: {n_params/1e9:.2f}B params, {arch.num_layers}L x {arch.hidden_size}h "
          f"({arch.num_heads}q/{arch.num_kv_heads}kv heads)", flush=True)

    gen = jax.jit(
        generate,
        static_argnames=("arch", "max_new_tokens", "eos_id", "pad_id", "temperature",
                         "compute_dtype", "kv_dtype"),
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30000, (args.batch, args.prompt)), jnp.int32)
    mask = jnp.ones_like(ids)

    # byte-vocab guided table padded to the model vocab (extra ids forbidden)
    dfa = compile_json_schema(JSON_TEMPLATES["triples"])
    byte_vocab = [bytes([i]) for i in range(256)] + [None] * (arch.vocab_size - 256)
    table = make_token_table(dfa, byte_vocab, eos_token_id=arch.vocab_size - 1)
    table_j = jnp.asarray(table)

    from comorag_tpu.models.decoder import quantize_params, quantize_params_int4

    from comorag_tpu.models.decoder import generate_speculative

    spec_gen = jax.jit(
        generate_speculative,
        static_argnames=("arch", "max_new_tokens", "eos_id", "pad_id", "draft_len",
                         "temperature", "compute_dtype"),
    )
    # speculative upper bound: a linear DFA forcing one fixed byte string
    # that is also planted in the prompt -> drafts always come true
    # (acceptance 1.0); the free-run spec row is the acceptance~0 floor
    plant_at = min(100, max(0, args.prompt // 4))
    fixed = (b"The Harbor Light Museum opened in 1982 in Meridian Bay. " * 64)[
        : min(args.new - 1, args.prompt - plant_at - 1)
    ]
    lin = np.full((len(fixed) + 1, arch.vocab_size), -1, np.int32)
    for s, byte in enumerate(fixed):
        lin[s, byte] = s + 1
    lin[len(fixed), arch.vocab_size - 1] = len(fixed)  # EOS self-loop at accept
    lin_j = jnp.asarray(lin)
    echo_ids = np.asarray(ids).copy()
    planted = np.frombuffer(fixed, np.uint8).astype(np.int32)
    echo_ids[:, plant_at:plant_at + len(planted)] = planted  # plant the echo source mid-prompt
    echo_ids = jnp.asarray(echo_ids)

    wanted = set(args.dtypes.split(","))
    for dtype_name, dtype in (
        ("int4", jnp.bfloat16),
        ("int8", jnp.bfloat16),
        ("bf16", jnp.bfloat16),
        ("fp32", jnp.float32),
    ):
        if dtype_name not in wanted:
            continue
        params = init_params(jax.random.PRNGKey(0), arch)
        if dtype_name == "int4":
            # fused nibble-unpack Pallas matmul (VERDICT r3 #7): half the
            # weight HBM stream of int8
            params = quantize_params_int4(params)
            params["embed"] = params["embed"].astype(jnp.bfloat16)
        elif dtype_name == "int8":
            params = quantize_params(params)
            params["embed"] = params["embed"].astype(jnp.bfloat16)
        elif dtype == jnp.bfloat16:
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        modes = [("free", None, None), ("guided_json", table_j, None)]
        if dtype_name == "int8":
            # quantized KV cache (vLLM kv_cache_dtype counterpart): the
            # cache stream dominates past ~2.5k context (decode profile)
            modes.append(("free_kv_int8", None, "int8"))
        for guided, tab, kv in modes:
            kwargs = dict(
                arch=arch, max_new_tokens=args.new,
                eos_id=arch.vocab_size - 1, pad_id=0,
                temperature=0.7, rng=jax.random.PRNGKey(1),
                token_table=tab, compute_dtype=dtype, kv_dtype=kv,
            )
            r = gen(params, ids, mask, **kwargs)
            np.asarray(r.tokens)  # drain (block_until_ready is unreliable through the tunnel)
            t0 = time.perf_counter()
            iters = 3
            for i in range(iters):
                r = gen(params, ids, mask, **{**kwargs, "rng": jax.random.PRNGKey(2 + i)})
                np.asarray(r.tokens)
            dt = (time.perf_counter() - t0) / iters
            total_new = int(np.asarray(r.lengths).sum())
            decode_tps = total_new / dt  # guided rows may EOS early — count real tokens
            prefill_tps = args.batch * args.prompt / dt  # same wall contains prefill
            print(json.dumps({
                "metric": "decode_tokens_per_s",
                "dtype": dtype_name,
                "mode": guided,
                "batch": args.batch,
                "prompt": args.prompt,
                "new_tokens": args.new,
                "emitted": total_new,
                "value": round(decode_tps, 1),
                "wall_s_per_call": round(dt, 3),
                "prompt_tokens_per_s_same_wall": round(prefill_tps, 1),
            }), flush=True)

        if dtype_name == "fp32" or args.skip_spec:
            continue  # speculative rows: the two shipping dtypes only
        for spec_mode, spec_ids, spec_table, spec_temp in (
            ("spec_free", ids, None, 0.0),          # acceptance ~0: overhead floor
            ("spec_echo", echo_ids, lin_j, 0.0),    # acceptance 1.0: upper bound
            # rejection-sampling verification (VERDICT r2 #5): the echo
            # grammar leaves one legal token per state, so p(d)=1 and
            # drafts still accept — sampled decoding keeps multi-token steps
            ("spec_echo_t0.7", echo_ids, lin_j, 0.7),
        ):
            kwargs = dict(
                arch=arch, max_new_tokens=args.new,
                eos_id=arch.vocab_size - 1, pad_id=0, draft_len=7,
                token_table=spec_table, compute_dtype=dtype,
                temperature=spec_temp, rng=jax.random.PRNGKey(9),
            )
            r = spec_gen(params, spec_ids, mask, **kwargs)
            np.asarray(r.tokens)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                r = spec_gen(params, spec_ids, mask, **kwargs)
                np.asarray(r.tokens)
            dt = (time.perf_counter() - t0) / iters
            total_new = int(np.asarray(r.lengths).sum())
            steps = int(np.asarray(r.steps))
            print(json.dumps({
                "metric": "decode_tokens_per_s",
                "dtype": dtype_name,
                "mode": spec_mode,
                "temperature": spec_temp,
                "batch": args.batch,
                "prompt": args.prompt,
                "new_tokens": args.new,
                "emitted": total_new,
                "value": round(total_new / dt, 1),
                "wall_s_per_call": round(dt, 3),
                "device_steps": steps,
                "tokens_per_step": round(total_new / max(steps * args.batch, 1), 2),
            }), flush=True)


if __name__ == "__main__":
    main()
