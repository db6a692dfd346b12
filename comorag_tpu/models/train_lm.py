"""Causal-LM finetuning for the offline generation engine
(models/decoder.py) — next-token cross-entropy with dp x tp mesh
shardings, mirroring the encoder's contrastive step (models/train.py).

The reference has no training path (its offline engine wraps frozen vLLM
weights, llm/vllm_offline.py); a production stack that serves its own
decoder needs to adapt it (e.g. distill the probe/fusion formats), so the
LM step is first-class here: same TrainState/orbax checkpointing as the
encoder, parameters tensor-parallel over ``model``, batch data-parallel
over ``data``, XLA lowering the collectives onto ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from comorag_tpu.models.decoder import (
    DecoderArch,
    KVCache,
    decoder_forward,
    init_params,
    param_shardings,
)
from comorag_tpu.models.train import TrainState, _shard_opt_like, make_optimizer


def lm_loss(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],  # ids: [B, S] int32, mask: [B, S]
    arch: DecoderArch,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Mean next-token cross-entropy over valid (non-pad) target positions."""
    ids, mask = batch["ids"], batch["mask"]
    b, s = ids.shape
    valid = mask.astype(bool)
    positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None, :], (b, 1))
    attn = jnp.tril(jnp.ones((s, s), bool))[None, :, :] & valid[:, None, :]
    cache = KVCache.zeros(arch, b, s, compute_dtype)
    logits, _ = decoder_forward(
        params, ids, positions, attn, cache, jnp.int32(0), arch, compute_dtype,
        remat=True,
    )
    targets = ids[:, 1:]
    target_mask = (valid[:, :-1] & valid[:, 1:]).astype(jnp.float32)
    # optional completion-only loss (the curriculum trainer): loss_mask
    # marks TARGET tokens that count — prompt positions contribute nothing,
    # so capacity goes to the answer behaviors, not to modelling prompts
    if "loss_mask" in batch:
        target_mask = target_mask * batch["loss_mask"][:, 1:]
    ce = optax.softmax_cross_entropy_with_integer_labels(logits[:, :-1], targets)
    return jnp.sum(ce * target_mask) / jnp.maximum(jnp.sum(target_mask), 1.0)


def create_lm_train_state(key: jax.Array, arch: DecoderArch, optimizer=None) -> TrainState:
    params = init_params(key, arch)
    optimizer = optimizer or make_optimizer()
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_lm_train_step(
    arch: DecoderArch,
    optimizer=None,
    compute_dtype=jnp.float32,
    mesh=None,
    dp_axis: str = "data",
    tp_axis: str = "model",
    batch_keys: Tuple[str, ...] = ("ids", "mask"),
):
    """Jitted LM training step; with a mesh, parameters/opt-state shard
    tensor-parallel and the batch shards data-parallel (one global jit)."""
    optimizer = optimizer or make_optimizer()

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(lm_loss)(state.params, batch, arch, compute_dtype)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    p_shard = param_shardings(mesh, tp_axis, arch=arch)
    replicated = NamedSharding(mesh, P())
    dp = dp_axis if dp_axis in mesh.shape else None  # tp-only mesh: replicate the batch
    batch_sharding = {k: NamedSharding(mesh, P(dp, None)) for k in batch_keys}
    # eval_shape: only the optimizer-state TREE is needed — a concrete
    # init would allocate the full parameter set (+ RNG program compile)
    # on the remote device per make_lm_train_step call (see train.py)
    params_shape = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), arch))
    opt_shard = _shard_opt_like(optimizer, p_shard, replicated, params_shape)
    state_shardings = TrainState(p_shard, opt_shard, replicated)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, replicated),
    )
