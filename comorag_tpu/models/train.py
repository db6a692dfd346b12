"""Contrastive retrieval training for the encoder (InfoNCE, in-batch
negatives) — the framework's training story for adapting the embedding
model to a corpus. The reference has no training path at all; serving
parity only needs inference, but a production retrieval stack needs to
finetune its encoder, and this is also the multi-chip shardability
surface the driver dry-runs (dp x tp mesh; XLA inserts the collectives).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from comorag_tpu.models.bge import EncoderArch, encode_pooled, init_params, param_shardings


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def contrastive_loss(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    arch: EncoderArch,
    temperature: float = 0.05,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Symmetric InfoNCE over in-batch negatives. batch keys:
    q_ids/q_mask/p_ids/p_mask, each [B, S]."""
    q = encode_pooled(params, batch["q_ids"], batch["q_mask"], arch, compute_dtype)
    p = encode_pooled(params, batch["p_ids"], batch["p_mask"], arch, compute_dtype)
    logits = jnp.dot(q, p.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (loss_qp + loss_pq)


def make_optimizer(learning_rate: float = 2e-5, weight_decay: float = 0.01):
    # standard BERT-family decay mask: LayerNorm scales/biases and bias
    # vectors (ndim < 2) are excluded — decaying ln_scale toward zero
    # fights the loss gradient over long runs
    return optax.adamw(
        learning_rate,
        weight_decay=weight_decay,
        mask=lambda params: jax.tree.map(lambda p: jnp.ndim(p) >= 2, params),
    )


def create_train_state(key: jax.Array, arch: EncoderArch, optimizer=None) -> TrainState:
    params = init_params(key, arch)
    optimizer = optimizer or make_optimizer()
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(
    arch: EncoderArch,
    optimizer=None,
    temperature: float = 0.05,
    compute_dtype=jnp.float32,
    mesh=None,
    dp_axis: str = "data",
    tp_axis: str = "model",
):
    """Build the jitted training step. With a mesh: parameters get
    tensor-parallel shardings over ``tp_axis`` and the batch shards over
    ``dp_axis`` — one global jit, XLA lowers the collectives onto ICI."""
    optimizer = optimizer or make_optimizer()

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(contrastive_loss)(
            state.params, batch, arch, temperature, compute_dtype
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt_state, state.step + 1), loss

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    p_shard = param_shardings(mesh, dp_axis, tp_axis)
    replicated = NamedSharding(mesh, P())
    dp = dp_axis if dp_axis in mesh.shape else None  # tp-only mesh: replicate the batch
    batch_sharding = {
        k: NamedSharding(mesh, P(dp, None)) for k in ("q_ids", "q_mask", "p_ids", "p_mask")
    }
    # Adam moments follow the parameter shardings; scalars replicate.
    # eval_shape: only the TREE STRUCTURE is needed — concretely
    # initializing bert-base params (+ moments) allocated ~1.3 GB on the
    # remote device per make_train_step call just to read the treedef
    params_shape = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), arch))
    opt_shard = _shard_opt_like(optimizer, p_shard, replicated, params_shape)
    state_shardings = TrainState(p_shard, opt_shard, replicated)
    return jax.jit(step, in_shardings=(state_shardings, batch_sharding), out_shardings=(state_shardings, replicated))


def save_checkpoint(path: str, state: TrainState) -> None:
    """Persist a TrainState with orbax (async-safe, atomic directory swap)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abs(path), state, force=True)


def load_checkpoint(path: str, state_like: TrainState) -> TrainState:
    """Restore a TrainState saved by ``save_checkpoint``. ``state_like``
    supplies the tree structure/shapes (e.g. a fresh create_train_state)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), state_like)


def _abs(path: str) -> str:
    import os

    return os.path.abspath(path)


def _shard_opt_like(optimizer, p_shard, replicated, params_probe):
    """Optimizer-state shardings: any subtree with the parameters' treedef
    (adamw's mu/nu) takes the parameter shardings; scalars replicate.
    ``params_probe`` is a params tree (or ShapeDtypeStruct tree) with the
    target structure — only the optimizer-state LAYOUT is read, so the
    init is abstract: no moment buffers are ever allocated."""
    probe = jax.eval_shape(optimizer.init, params_probe)
    flat_params, treedef_params = jax.tree.flatten(p_shard)

    def recurse(state):
        _, treedef = jax.tree.flatten(state)
        if treedef == treedef_params:
            return jax.tree.unflatten(treedef, flat_params)
        if isinstance(state, tuple) and type(state) is not tuple:  # NamedTuple
            return type(state)(*(recurse(s) for s in state))
        if isinstance(state, tuple):
            return tuple(recurse(s) for s in state)
        return jax.tree.map(lambda _: replicated, state)

    return recurse(probe)
