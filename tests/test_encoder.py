import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comorag_tpu.models.bge import (
    BGEJaxEncoder,
    EncoderArch,
    SimpleHashTokenizer,
    encode_pooled,
    init_params,
)
from comorag_tpu.models.train import contrastive_loss, create_train_state, make_train_step
from comorag_tpu.parallel.mesh import build_mesh


@pytest.fixture(scope="module")
def tiny():
    arch = EncoderArch.tiny()
    params = init_params(jax.random.PRNGKey(0), arch)
    return arch, params


def test_forward_shapes_and_norm(tiny):
    arch, params = tiny
    ids = jnp.ones((4, 16), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    out = encode_pooled(params, ids, mask, arch)
    assert out.shape == (4, arch.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


def test_mask_excludes_padding(tiny):
    arch, params = tiny
    ids_short = jnp.asarray([[5, 7, 9, 0, 0, 0, 0, 0]], jnp.int32)
    mask_short = jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
    # same tokens but garbage in padded tail
    ids_garbage = ids_short.at[0, 3:].set(99)
    out1 = encode_pooled(params, ids_short, mask_short, arch)
    out2 = encode_pooled(params, ids_garbage, mask_short, arch)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_host_encoder_wrapper(tiny):
    arch, params = tiny
    enc = BGEJaxEncoder(params=params, arch=arch, max_seq_len=64, batch_size=4)
    vecs = enc.encode(["hello world", "the mainspring of the clock", "hello world"])
    assert vecs.shape == (3, arch.hidden_size)
    np.testing.assert_allclose(vecs[0], vecs[2], atol=1e-5)  # deterministic
    # instruction prefix changes the embedding
    vecs_inst = enc.encode(["hello world"], instruction="Given a question: ")
    assert not np.allclose(vecs[0], vecs_inst[0], atol=1e-4)


def test_contrastive_training_reduces_loss(tiny):
    arch, _ = tiny
    tok = SimpleHashTokenizer(arch.vocab_size)
    qs = ["the red fox", "a tall ship", "mountain snow", "river delta"]
    ps = ["fox red the", "ship tall a", "snow mountain", "delta river"]

    def toks(texts):
        ids, masks = tok(texts, 16)
        id_arr = np.zeros((4, 16), np.int32)
        m_arr = np.zeros((4, 16), np.int32)
        for i, (r, m) in enumerate(zip(ids, masks)):
            id_arr[i, : len(r)] = r
            m_arr[i, : len(m)] = m
        return id_arr, m_arr

    q_ids, q_mask = toks(qs)
    p_ids, p_mask = toks(ps)
    batch = {
        "q_ids": jnp.asarray(q_ids), "q_mask": jnp.asarray(q_mask),
        "p_ids": jnp.asarray(p_ids), "p_mask": jnp.asarray(p_mask),
    }
    state = create_train_state(jax.random.PRNGKey(1), arch)
    step = make_train_step(arch)
    loss0 = contrastive_loss(state.params, batch, arch)
    for _ in range(5):
        state, loss = step(state, batch)
    assert float(loss) < float(loss0)
    assert int(state.step) == 5


def test_multichip_train_step_runs():
    arch = EncoderArch.tiny()
    mesh = build_mesh({"data": 2, "model": 4})
    step = make_train_step(arch, mesh=mesh)
    state = create_train_state(jax.random.PRNGKey(0), arch)
    batch = {
        "q_ids": jnp.ones((8, 16), jnp.int32), "q_mask": jnp.ones((8, 16), jnp.int32),
        "p_ids": jnp.ones((8, 16), jnp.int32), "p_mask": jnp.ones((8, 16), jnp.int32),
    }
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))
    # params actually sharded over the model axis
    q_w = state.params["layers"]["q_w"]
    assert len(q_w.sharding.device_set) == 8 or q_w.sharding.is_fully_replicated is False


def test_data_parallel_only_mesh_train_step():
    """The train CLI's own documented example (`--mesh_shape data=8`) must
    run: parameter specs referencing an absent 'model' axis used to raise
    ValueError at make_train_step (reproduced) — they replicate instead."""
    arch = EncoderArch.tiny()
    mesh = build_mesh({"data": 8})
    step = make_train_step(arch, mesh=mesh)
    state = create_train_state(jax.random.PRNGKey(0), arch)
    batch = {
        "q_ids": jnp.ones((8, 16), jnp.int32), "q_mask": jnp.ones((8, 16), jnp.int32),
        "p_ids": jnp.ones((8, 16), jnp.int32), "p_mask": jnp.ones((8, 16), jnp.int32),
    }
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


def test_tp_only_mesh_lm_train_step():
    """Symmetric case for the causal-LM step: a model-only mesh replicates
    the batch instead of crashing on the absent 'data' axis."""
    from comorag_tpu.models.decoder import DecoderArch
    from comorag_tpu.models.train_lm import create_lm_train_state, make_lm_train_step

    arch = DecoderArch.tiny()
    mesh = build_mesh({"model": 8})
    step = make_lm_train_step(arch, mesh=mesh)
    state = create_lm_train_state(jax.random.PRNGKey(0), arch)
    batch = {"ids": jnp.ones((4, 16), jnp.int32), "mask": jnp.ones((4, 16), jnp.int32)}
    state, loss = step(state, batch)
    assert np.isfinite(float(loss))


def test_hf_checkpoint_parity(tmp_path):
    """Weight-conversion oracle: a randomly-initialized HF BERT saved to
    disk must produce the same pooled embeddings through the JAX encoder
    as through the torch forward (mean-pool + L2, BGEEmbedding.py:15-28)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import numpy as np
    import jax.numpy as jnp

    from comorag_tpu.models.bge import encode_pooled, load_hf_checkpoint

    cfg = transformers.BertConfig(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(tmp_path / "tiny-bert")

    params, arch = load_hf_checkpoint(str(tmp_path / "tiny-bert"))

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 97, (3, 16)).astype(np.int64)
    mask = np.ones((3, 16), np.int64)
    mask[1, 10:] = 0
    ids[1, 10:] = 0

    with torch.no_grad():
        hidden = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (hidden * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)

    got = np.asarray(
        encode_pooled(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), arch)
    )
    assert np.abs(got - ref).max() < 2e-4, np.abs(got - ref).max()


def test_checkpoint_roundtrip(tmp_path):
    """orbax save -> restore reproduces params, optimizer state, and step;
    training resumes from the restored state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from comorag_tpu.models.bge import EncoderArch
    from comorag_tpu.models.train import (
        create_train_state,
        load_checkpoint,
        make_train_step,
        save_checkpoint,
    )

    arch = EncoderArch.tiny()
    step = make_train_step(arch)
    state = create_train_state(jax.random.PRNGKey(0), arch)
    batch = {
        "q_ids": jnp.ones((8, 16), jnp.int32),
        "q_mask": jnp.ones((8, 16), jnp.int32),
        "p_ids": jnp.ones((8, 16), jnp.int32),
        "p_mask": jnp.ones((8, 16), jnp.int32),
    }
    state, _ = step(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state)

    fresh = create_train_state(jax.random.PRNGKey(1), arch)
    restored = load_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumes: one more step runs and advances
    resumed, loss = step(restored, batch)
    assert int(resumed.step) == 2 and np.isfinite(float(loss))


def test_encode_device_matches_encode():
    """The device-resident handoff must produce the same embeddings as the
    host-facing encode (it is the same jitted forward, minus the drain)."""
    import numpy as np

    import jax

    from comorag_tpu.models.bge import BGEJaxEncoder, EncoderArch, init_params

    arch = EncoderArch(vocab_size=64, hidden_size=16, num_layers=1,
                       num_heads=2, intermediate_size=32, max_position=32)
    params = init_params(jax.random.PRNGKey(0), arch)
    enc = BGEJaxEncoder(params=params, arch=arch, max_seq_len=16, batch_size=3)
    texts = [f"text number {i} with some words" for i in range(7)]  # 3 batches
    host = enc.encode(texts)
    dev = np.asarray(enc.encode_device(texts))
    assert dev.shape == host.shape
    np.testing.assert_allclose(host, dev, atol=1e-6)


def test_pallas_attention_matches_xla(tiny):
    """The fused VMEM-resident attention (ops/pallas_attention.py,
    interpret mode on CPU) must match the XLA attention path, including
    padded-key masking and bf16 compute."""
    arch, params = tiny
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, arch.vocab_size, (8, 32)), jnp.int32)
    mask = np.ones((8, 32), np.int32)
    mask[3, 20:] = 0  # padded keys must be invisible
    mask[7, 5:] = 0
    mask = jnp.asarray(mask)

    ref = encode_pooled(params, ids, mask, arch, attention="xla")
    got = encode_pooled(params, ids, mask, arch, attention="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    ref16 = encode_pooled(params, ids, mask, arch, compute_dtype=jnp.bfloat16,
                          attention="xla")
    got16 = encode_pooled(params, ids, mask, arch, compute_dtype=jnp.bfloat16,
                          attention="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref16), rtol=2e-2, atol=2e-2)


def test_pallas_ffn_matches_xla_reference():
    """The fused FFN half-layer (ops/pallas_ffn.py, interpret mode on
    CPU) must match the unfused LN->matmul->gelu->matmul->residual->LN
    composition in fp32 and bf16."""
    from comorag_tpu.ops.pallas_ffn import fused_encoder_ffn, fused_ffn_supported

    h, inter = 128, 256
    rng = np.random.default_rng(1)
    xres = rng.normal(size=(8, 32, h)).astype(np.float32)
    w1 = rng.normal(scale=0.05, size=(h, inter)).astype(np.float32)
    b1 = rng.normal(scale=0.05, size=(inter,)).astype(np.float32)
    w2 = rng.normal(scale=0.05, size=(inter, h)).astype(np.float32)
    b2 = rng.normal(scale=0.05, size=(h,)).astype(np.float32)
    s1, n1 = rng.normal(1, 0.1, (h,)).astype(np.float32), rng.normal(0, 0.1, (h,)).astype(np.float32)
    s2, n2 = rng.normal(1, 0.1, (h,)).astype(np.float32), rng.normal(0, 0.1, (h,)).astype(np.float32)
    assert fused_ffn_supported(8 * 32, h, inter)

    def ln(x, s, b, eps=1e-12):
        m = x.mean(-1, keepdims=True)
        c = x - m
        return c / np.sqrt((c * c).mean(-1, keepdims=True) + eps) * s + b

    for dt, rtol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        xr = jnp.asarray(xres, dt)
        x1 = ln(np.asarray(xr, np.float32), s1, n1).astype(
            np.float32 if dt == jnp.float32 else np.float32
        )
        # match the kernel's post-LN1 cast to compute dtype
        x1 = np.asarray(jnp.asarray(x1, dt), np.float32)
        mid = x1 @ np.asarray(jnp.asarray(w1, dt), np.float32) + b1
        from scipy.special import erf as _scipy_erf

        mid = 0.5 * mid * (1.0 + _scipy_erf(mid / np.sqrt(2.0)))
        mid = np.asarray(jnp.asarray(mid, dt), np.float32)
        f = mid @ np.asarray(jnp.asarray(w2, dt), np.float32) + b2
        ref = ln(x1 + f, s2, n2)

        got = fused_encoder_ffn(
            xr, s1, n1, jnp.asarray(w1, dt), b1, jnp.asarray(w2, dt), b2,
            s2, n2, interpret=True,
        )
        assert got.shape == xr.shape and got.dtype == xr.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), ref, rtol=rtol, atol=rtol * 4
        )

    # minimum-tile path: 24 rows -> tn=8 (the smallest Mosaic-legal tile)
    from comorag_tpu.ops.pallas_ffn import ffn_block_rows

    assert ffn_block_rows(24) == 8 and ffn_block_rows(12) == 4
    assert not fused_ffn_supported(12, h, inter)  # tn<8 falls back to XLA
    small = jnp.asarray(xres[:1, :24, :])  # [1, 24, 128]
    got_small = fused_encoder_ffn(
        small, s1, n1, w1, b1, w2, b2, s2, n2, interpret=True
    )
    big = fused_encoder_ffn(
        jnp.asarray(xres), s1, n1, w1, b1, w2, b2, s2, n2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_small), np.asarray(big[:1, :24, :]), rtol=2e-5, atol=1e-4
    )


def test_pallas_ffn_in_encoder_matches_xla():
    """encoder_forward with attention=pallas_interpret + ffn=auto runs
    BOTH fused kernels (arch is 128-divisible) and must match the pure
    XLA path end to end."""
    from comorag_tpu.ops.pallas_ffn import fused_ffn_supported

    arch = EncoderArch(vocab_size=64, hidden_size=128, num_layers=2,
                       num_heads=2, intermediate_size=256, max_position=64)
    params = init_params(jax.random.PRNGKey(3), arch)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(2, arch.vocab_size, (8, 32)), jnp.int32)
    mask = np.ones((8, 32), np.int32)
    mask[2, 17:] = 0
    mask = jnp.asarray(mask)
    assert fused_ffn_supported(8 * 32, arch.hidden_size, arch.intermediate_size)

    ref = encode_pooled(params, ids, mask, arch, attention="xla", ffn="xla")
    got = encode_pooled(params, ids, mask, arch, attention="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)

    # FFN kernel forced alongside XLA attention isolates the FFN kernel
    got_ffn_only = encode_pooled(params, ids, mask, arch, attention="xla",
                                 ffn="pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(got_ffn_only), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def test_encoder_auto_attention_resolves_xla_on_cpu(tiny):
    arch, params = tiny
    enc = BGEJaxEncoder(params=params, arch=arch, tokenizer=SimpleHashTokenizer())
    assert enc.attention == "xla"  # CPU backend: kernel needs a real TPU
    out = enc.encode(["hello world", "harbor lights"])
    assert out.shape == (2, arch.hidden_size)
