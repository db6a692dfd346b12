"""Encoder finetuning CLI: (query, passage) pairs -> contrastive train ->
orbax checkpoint + serving-ready parameters.

The reference has no training entry point at all (its encoder is a frozen
HF checkpoint, BGEEmbedding.py:30-213); a production retrieval stack
adapts its encoder to the corpus, so the trainer (models/train.py) gets a
first-class CLI here. The resulting checkpoint loads straight into the
serving encoder (`BGEJaxEncoder(params=..., arch=...)`) and into
`--embedding_model_name` via a checkpoint directory.

Input: pairs.jsonl with {"query": ..., "passage": ...} per line.

Usage:
  python -m comorag_tpu.cli.train --pairs pairs.jsonl --output_dir ckpt \
      [--init hf:<local checkpoint> | random] [--steps 200] [--batch 32] \
      [--lr 2e-5] [--max_seq_len 128] [--mesh_shape data=8] \
      [--compute_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import numpy as np

from comorag_tpu.utils.jsonio import load_jsonl
from comorag_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def parse_mesh(spec: str) -> dict:
    out = {}
    for part in spec.split(","):
        if part:
            k, v = part.split("=")
            out[k.strip()] = int(v)
    return out


def main(argv: List[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", required=True, help="jsonl of {query, passage}")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--init", default="random",
                    help="'random', 'tiny', or 'hf:<local checkpoint path>'")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--max_seq_len", type=int, default=128)
    ap.add_argument("--mesh_shape", default="", help="e.g. data=8 or data=4,model=2")
    ap.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from comorag_tpu.models.bge import (
        EncoderArch,
        SimpleHashTokenizer,
        init_params,
        load_hf_checkpoint,
    )
    from comorag_tpu.models.train import (
        TrainState,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )

    if args.steps <= 0:
        raise SystemExit("--steps must be >= 1")
    pairs = load_jsonl(args.pairs)
    if not pairs:
        raise SystemExit(f"no pairs in {args.pairs}")
    queries = [p["query"] for p in pairs]
    passages = [p["passage"] for p in pairs]

    tokenizer = None
    if args.init.startswith("hf:"):
        params, arch = load_hf_checkpoint(args.init[3:])
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.init[3:])
    else:
        arch = EncoderArch.tiny() if args.init == "tiny" else EncoderArch()
        params = init_params(jax.random.PRNGKey(args.seed), arch)
    tokenizer = tokenizer or SimpleHashTokenizer(arch.vocab_size)

    mesh = None
    if args.mesh_shape:
        from comorag_tpu.parallel.mesh import build_mesh

        mesh = build_mesh(parse_mesh(args.mesh_shape))

    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    optimizer = make_optimizer(args.lr, args.weight_decay)
    step_fn = make_train_step(
        arch, optimizer=optimizer, temperature=args.temperature,
        compute_dtype=compute_dtype, mesh=mesh,
    )
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    def tokenize(texts: List[str]) -> tuple:
        if isinstance(tokenizer, SimpleHashTokenizer):
            rows, masks = tokenizer(texts, args.max_seq_len)
        else:
            out = tokenizer(texts, padding=False, truncation=True, max_length=args.max_seq_len)
            rows, masks = out["input_ids"], out["attention_mask"]
        ids = np.zeros((len(texts), args.max_seq_len), np.int32)
        mask = np.zeros((len(texts), args.max_seq_len), np.int32)
        for i, (r, m) in enumerate(zip(rows, masks)):
            r, m = r[: args.max_seq_len], m[: args.max_seq_len]
            ids[i, : len(r)] = r
            mask[i, : len(m)] = m
        mask[mask.sum(axis=1) == 0, 0] = 1  # avoid 0/0 pooling on empty rows
        return ids, mask

    rng = np.random.default_rng(args.seed)
    losses: List[float] = []
    # a contrastive batch must not repeat a passage TEXT (a duplicate
    # positive is an unwinnable in-batch negative) — sampling pair INDICES
    # without replacement is not enough when several queries share one
    # passage, so sample within passage-unique index groups
    unique_pair_idx: Dict[str, int] = {}
    for i, p_text in enumerate(passages):
        unique_pair_idx.setdefault(p_text, i)
    pool = np.asarray(sorted(unique_pair_idx.values()))
    batch_size = min(args.batch, len(pool))
    if batch_size < min(args.batch, len(pairs)):
        print(f"note: {len(pairs) - len(pool)} pairs share passages; "
              f"batches sample from {len(pool)} passage-unique pairs")
    t0 = time.perf_counter()
    for step in range(args.steps):
        take = rng.choice(pool, size=batch_size, replace=False)
        q_ids, q_mask = tokenize([queries[i] for i in take])
        p_ids, p_mask = tokenize([passages[i] for i in take])
        batch = {
            "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
            "p_ids": jnp.asarray(p_ids), "p_mask": jnp.asarray(p_mask),
        }
        state, loss = step_fn(state, batch)
        if step % args.log_every == 0 or step == args.steps - 1:
            loss_val = float(loss)  # sync point — only at log intervals
            losses.append(loss_val)
            logger.info("step %d/%d loss %.4f", step + 1, args.steps, loss_val)

    wall = time.perf_counter() - t0
    os.makedirs(args.output_dir, exist_ok=True)
    save_checkpoint(os.path.join(args.output_dir, "train_state"), state)
    summary = {
        "steps": args.steps,
        "pairs": len(pairs),
        "first_loss": losses[0],
        "final_loss": losses[-1],
        "pairs_per_s": round(args.steps * batch_size / wall, 1),
        "arch": {"hidden": arch.hidden_size, "layers": arch.num_layers},
        "checkpoint": os.path.join(args.output_dir, "train_state"),
    }
    with open(os.path.join(args.output_dir, "train_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
