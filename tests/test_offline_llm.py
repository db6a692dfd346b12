"""Offline TPU generation engine tests (reference capability:
llm/vllm_offline.py — vLLM wrapper with guided-JSON decoding).

Covers the JAX decoder (KV-cache correctness, EOS stop, TP sharding),
the JSON-schema -> byte-DFA compiler, and the JaxOfflineLLM interface
(batched guided generation, per-row independence)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comorag_tpu.llm.guided import (
    JSON_TEMPLATES,
    compile_json_schema,
    make_token_table,
)
from comorag_tpu.llm.jax_offline import ByteTokenizer, JaxOfflineLLM, render_chat
from comorag_tpu.models.decoder import (
    DecoderArch,
    KVCache,
    decoder_forward,
    generate,
    init_params,
)

ARCH = DecoderArch.tiny()
PARAMS = init_params(jax.random.PRNGKey(0), ARCH)
PAD, EOS = 256, 258


# --------------------------------------------------------------- DFA compiler
CANONICAL_ACCEPT = {
    "ner": ['{"named_entities":[]}', '{"named_entities":["a","b c"]}',
            '{"named_entities":["x\\"y"]}'],
    "triples": ['{"triples":[]}', '{"triples":[["a","b","c"]]}',
                '{"triples":[["a","b","c"],["d","e","f"]]}'],
    "fact": ['{"fact":[["s","p","o"]]}'],
    "json": ['{}', '{"k":"v"}', '{"k":{"n":["x",true,null]},"m":false}'],
    "qa_cot": ['{"Thought":"t","Answer":"a"}'],
}
REJECT = {
    "ner": ['{"named_entities":"x"}', '{"wrong":[]}', '{"named_entities":[]} x'],
    "triples": ['{"triples":[["a","b"]]}', '{"triples":[["a","b","c","d"]]}'],
    "qa_cot": ['{"Thought":"","Answer":"a"}', '{"Answer":"a","Thought":"t"}'],
    "json": ['{"k":}', '[1]'],
}


def test_dfa_accepts_canonical_instances():
    for name, texts in CANONICAL_ACCEPT.items():
        dfa = compile_json_schema(JSON_TEMPLATES[name])
        for t in texts:
            assert dfa.accepts(t.encode()), (name, t)
            assert json.loads(t) is not None  # the cases themselves are valid JSON


def test_dfa_rejects_schema_violations():
    for name, texts in REJECT.items():
        dfa = compile_json_schema(JSON_TEMPLATES[name])
        for t in texts:
            assert not dfa.accepts(t.encode()), (name, t)


def test_dfa_whitespace_mode_validates_pretty_json():
    dfa = compile_json_schema(JSON_TEMPLATES["ner"], whitespace=True)
    assert dfa.accepts(b'{ "named_entities" : [ "x" , "y" ] }')
    strict = compile_json_schema(JSON_TEMPLATES["ner"])
    assert not strict.accepts(b'{ "named_entities": [] }')


def test_token_table_multibyte_tokens():
    """Sub-word product: a token is allowed iff its WHOLE byte expansion is."""
    dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    vocab = [b'{"named_entities":[', b'"ab"', b']}', b'"', b'x', b'{', None]
    # deliberately partial vocab: skip the liveness audit (which would —
    # correctly — reject it: 'x' opens string states this vocab can't close)
    table = make_token_table(dfa, vocab, eos_token_id=6, check_liveness=False)
    s = 0
    assert table[s, 0] >= 0          # the fused prefix token is legal at start
    assert table[s, 4] == -1         # bare 'x' is not
    s = table[s, 0]
    s_after = table[s, 1]            # complete string item
    assert s_after >= 0
    end = table[s_after, 2]          # ']}' closes array + object
    assert end == dfa.accept_state
    assert table[end, 6] == end      # EOS self-loop at accept only
    assert table[0, 6] == -1


# ------------------------------------------------------------------- decoder
def _naive_greedy(params, prompt, steps):
    """Oracle: argmax-decode by re-running the FULL sequence each step
    (fresh cache, causal mask) — no cache reuse to get wrong."""
    toks = list(prompt)
    for _ in range(steps):
        n = len(toks)
        ids = jnp.asarray([toks], jnp.int32)
        positions = jnp.arange(n, dtype=jnp.int32)[None, :]
        attn = jnp.tril(jnp.ones((1, n, n), bool))
        cache = KVCache.zeros(ARCH, 1, n)
        logits, _ = decoder_forward(
            params, ids, positions, attn, cache, jnp.int32(0), ARCH
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_kv_cache_generation_matches_full_forward():
    prompt = [257, 72, 101, 108, 108, 111]
    steps = 8
    oracle = _naive_greedy(PARAMS, prompt, steps)

    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    result = generate(
        PARAMS, ids, mask, ARCH, max_new_tokens=steps,
        eos_id=EOS, pad_id=PAD, temperature=0.0,
    )
    got = np.asarray(result.tokens)[0].tolist()
    assert got == oracle


def test_left_padding_row_independence():
    """A short prompt batched with a long one (left-padded) must decode the
    same tokens as alone: pads are invisible to attention."""
    short = [257, 72, 105]
    long_ = [257] + list(range(65, 85))
    steps = 6
    alone = generate(
        PARAMS, jnp.asarray([short], jnp.int32), jnp.ones((1, len(short)), jnp.int32),
        ARCH, max_new_tokens=steps, eos_id=EOS, pad_id=PAD,
    )
    p = len(long_)
    ids = np.full((2, p), PAD, np.int32)
    mask = np.zeros((2, p), np.int32)
    ids[0, p - len(short):] = short
    mask[0, p - len(short):] = 1
    ids[1] = long_
    mask[1] = 1
    batched = generate(
        PARAMS, jnp.asarray(ids), jnp.asarray(mask),
        ARCH, max_new_tokens=steps, eos_id=EOS, pad_id=PAD,
    )
    assert np.asarray(batched.tokens)[0].tolist() == np.asarray(alone.tokens)[0].tolist()


def test_generate_eos_stop_and_masking():
    """A token table whose start state only allows EOS must stop every row
    after one token — exercises both the mask and the done plumbing."""
    table = np.full((1, ARCH.vocab_size), -1, np.int32)
    table[0, EOS] = 0
    ids = jnp.asarray([[257, 65], [257, 66]], jnp.int32)
    result = generate(
        PARAMS, ids, jnp.ones_like(ids), ARCH, max_new_tokens=8,
        eos_id=EOS, pad_id=PAD, token_table=jnp.asarray(table),
    )
    tokens = np.asarray(result.tokens)
    assert np.asarray(result.lengths).tolist() == [1, 1]
    assert tokens[:, 0].tolist() == [EOS, EOS]
    assert (tokens[:, 1:] == PAD).all()


def test_hf_llama_checkpoint_parity(tmp_path):
    """Convert a random tiny HF llama (GQA) checkpoint and compare logits."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_llama")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_llama"))
    assert arch.num_kv_heads == 2

    prompt = [3, 17, 92, 5, 44, 101, 7]
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()

    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    cache = KVCache.zeros(arch, 1, n)
    logits, _ = decoder_forward(params, ids, positions, attn, cache, jnp.int32(0), arch)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_hf_llama3_rope_scaling_parity(tmp_path):
    """llama-3.1+ checkpoints rescale RoPE frequencies
    (rope_scaling={"rope_type": "llama3", ...}) — the reference's default
    serving model Llama-3.3-70B ships exactly this. Logits must match HF
    at positions past the smoothing band, where the rescale actually
    bites (original_max_position_embeddings=32 here, prompt length 48)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 32,
        },
    )
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_llama3")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_llama3"))
    assert arch.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 32.0)

    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 128, size=48).tolist()
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()

    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    cache = KVCache.zeros(arch, 1, n)
    logits, _ = decoder_forward(params, ids, positions, attn, cache, jnp.int32(0), arch)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=2e-3)

    # the rescale is NOT a no-op: unscaled arch must disagree out here
    plain = dataclasses.replace(arch, rope_scaling=None)
    logits_plain, _ = decoder_forward(
        params, ids, positions, attn, KVCache.zeros(plain, 1, n), jnp.int32(0), plain
    )
    # small because the model is tiny+random, but well above the 2e-4/2e-3
    # parity band the scaled run just met
    assert np.abs(np.asarray(logits_plain[0]) - ref).max() > 1.5e-3


def test_hf_rope_scaling_linear_and_unsupported(tmp_path):
    """'linear' rescaling divides every frequency by `factor`; unsupported
    kinds (yarn/longrope/dynamic) must fail loudly, never load wrong."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from comorag_tpu.models.decoder import (
        _rope_inv_freq,
        load_hf_decoder_checkpoint,
    )

    f0 = np.asarray(_rope_inv_freq(16, 10000.0, None))
    f2 = np.asarray(_rope_inv_freq(16, 10000.0, ("linear", 2.0)))
    np.testing.assert_allclose(f2, f0 / 2.0, rtol=1e-6)

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64,
        rope_scaling={"rope_type": "yarn", "factor": 2.0},
    )
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_yarn")
    with pytest.raises(ValueError, match="yarn"):
        load_hf_decoder_checkpoint(str(tmp_path / "tiny_yarn"))


def test_active_sliding_window_refuses_to_load(tmp_path):
    """mistral-v0.1-class configs engage a sliding window smaller than the
    position range; this decoder attends full context, so loading one
    would silently diverge past the window — it must refuse. An inactive
    window (qwen2's use_sliding_window=False) loads fine (covered by
    test_hf_qwen2_checkpoint_parity)."""
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=64,
    )
    MistralForCausalLM(cfg).eval().save_pretrained(tmp_path / "tiny_mistral_sw")
    with pytest.raises(ValueError, match="sliding_window"):
        load_hf_decoder_checkpoint(str(tmp_path / "tiny_mistral_sw"))

    # window disabled -> mistral (llama-skeleton) loads and matches HF
    cfg2 = MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=None,
    )
    torch.manual_seed(6)
    model = MistralForCausalLM(cfg2).eval()
    model.save_pretrained(tmp_path / "tiny_mistral")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_mistral"))
    prompt = [5, 9, 33, 2]
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()
    n = len(prompt)
    logits, _ = decoder_forward(
        params, jnp.asarray([prompt], jnp.int32),
        jnp.arange(n, dtype=jnp.int32)[None, :],
        jnp.tril(jnp.ones((1, n, n), bool)),
        KVCache.zeros(arch, 1, n), jnp.int32(0), arch,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=2e-3)


def test_hf_qwen2_checkpoint_parity(tmp_path):
    """Convert a random tiny HF qwen2 (GQA + qkv bias) checkpoint and
    compare logits — the second open model family the jax:<ckpt> route
    accepts (the reference's vLLM path takes any HF name)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_qwen2")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_qwen2"))
    assert arch.qkv_bias and arch.tie_embeddings
    assert params["layers"]["qkv_b"].shape == (2, 4 * 16 + 2 * 2 * 16)

    prompt = [9, 2, 77, 31, 5, 120, 64, 8]
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()

    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    cache = KVCache.zeros(arch, 1, n)
    logits, _ = decoder_forward(params, ids, positions, attn, cache, jnp.int32(0), arch)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=2e-3)


def test_hf_qwen3_checkpoint_parity(tmp_path):
    """qwen3-class: per-head q/k RMSNorm before RoPE and an explicit
    head_dim decoupled from hidden/heads (here 32 vs hidden/heads=16).
    Third open family the jax:<ckpt> route accepts."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=True,
    )
    torch.manual_seed(4)
    model = Qwen3ForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_qwen3")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_qwen3"))
    assert arch.qk_norm and arch.head_dim == 32 and not arch.qkv_bias
    assert params["layers"]["q_norm"].shape == (2, 32)

    prompt = [11, 4, 99, 23, 7, 115, 60, 2, 88]
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()

    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    cache = KVCache.zeros(arch, 1, n)
    logits, _ = decoder_forward(params, ids, positions, attn, cache, jnp.int32(0), arch)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=2e-3)


def test_hf_gemma_checkpoint_parity(tmp_path):
    """gemma-class: sqrt(hidden)-scaled embeddings, (1+w) RMSNorm,
    tanh-GeLU MLP, tied embeddings. Fourth open family for jax:<ckpt>.
    gemma2/gemma3 (sandwich norms, softcapping) must refuse to load."""
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    from comorag_tpu.models.decoder import load_hf_decoder_checkpoint

    cfg = GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
    )
    torch.manual_seed(5)
    model = GemmaForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path / "tiny_gemma")
    params, arch = load_hf_decoder_checkpoint(str(tmp_path / "tiny_gemma"))
    assert arch.embed_scale and arch.rms_unit_offset
    assert arch.mlp_act == "gelu_tanh" and arch.tie_embeddings
    assert arch.num_kv_heads == 1  # gemma-2b-style MQA

    prompt = [3, 44, 9, 127, 16, 2, 71]
    with torch.no_grad():
        ref = model(torch.tensor([prompt])).logits[0].numpy()

    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    cache = KVCache.zeros(arch, 1, n)
    logits, _ = decoder_forward(params, ids, positions, attn, cache, jnp.int32(0), arch)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-4, rtol=2e-3)

    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg2 = Gemma2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64,
    )
    Gemma2ForCausalLM(cfg2).eval().save_pretrained(tmp_path / "tiny_gemma2")
    with pytest.raises(ValueError, match="gemma2"):
        load_hf_decoder_checkpoint(str(tmp_path / "tiny_gemma2"))


def test_qkv_bias_tp_generation_matches_unsharded():
    """TP sharding of the fused qkv bias (same column split as qkv_w)
    must keep generation exact."""
    from comorag_tpu.models.decoder import DecoderArch, init_params
    from comorag_tpu.parallel.mesh import build_mesh

    arch = dataclasses.replace(ARCH, qkv_bias=True)
    params = init_params(jax.random.PRNGKey(11), arch)
    mesh = build_mesh({"model": 2}, devices=jax.devices()[:2])
    plain = JaxOfflineLLM(params=params, arch=arch, seed=0)
    sharded = JaxOfflineLLM(params=params, arch=arch, seed=0, mesh=mesh)
    msgs = [{"role": "user", "content": "tell me about the lantern"}]
    a = plain.infer(msgs, max_tokens=16)
    b = sharded.infer(msgs, max_tokens=16)
    assert a.text == b.text


def test_tp_sharded_generation_matches_unsharded():
    from comorag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh({"model": 2}, devices=jax.devices()[:2])
    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    sharded = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0, mesh=mesh)
    msgs = [{"role": "user", "content": "tell me about the harbor"}]
    a = plain.infer(msgs, max_tokens=16)
    b = sharded.infer(msgs, max_tokens=16)
    assert a.text == b.text


def test_qwen3_class_tp_generation_matches_unsharded():
    """qk-norm + decoupled head_dim (the qwen3-class knobs) compose with
    TP sharding: the per-head_dim norm weights replicate, the fused qkv
    columns shard, generation stays exact."""
    from comorag_tpu.models.decoder import DecoderArch, init_params
    from comorag_tpu.parallel.mesh import build_mesh

    arch = dataclasses.replace(
        DecoderArch.tiny(), qk_norm=True, head_dim_override=32
    )
    params = init_params(jax.random.PRNGKey(2), arch)
    mesh = build_mesh({"model": 2}, devices=jax.devices()[:2])
    plain = JaxOfflineLLM(params=params, arch=arch, seed=0)
    sharded = JaxOfflineLLM(params=params, arch=arch, seed=0, mesh=mesh)
    msgs = [{"role": "user", "content": "tell me about the harbor"}]
    a = plain.infer(msgs, max_tokens=16)
    b = sharded.infer(msgs, max_tokens=16)
    assert a.text == b.text


def test_int8_tp_matches_single_device_int8():
    """VERDICT r2 #3: QuantWeight leaves shard over the model axis (q and
    per-output-channel scale together) instead of replicating — int8-TP
    generation must match single-device int8 exactly (greedy)."""
    from jax.sharding import NamedSharding

    from comorag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh({"model": 2}, devices=jax.devices()[:2])
    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0, param_dtype="int8")
    sharded = JaxOfflineLLM(
        params=PARAMS, arch=ARCH, seed=0, param_dtype="int8", mesh=mesh
    )
    # the quantized matmul weights really live sharded on the TP axis
    qkv = sharded.params["layers"]["qkv_w"]
    assert qkv.q.dtype == jnp.int8
    assert isinstance(qkv.q.sharding, NamedSharding)
    assert "model" in (qkv.q.sharding.spec[-1] or ())
    assert "model" in (qkv.scale.sharding.spec[-1] or ())
    down = sharded.params["layers"]["down_w"]
    assert "model" in (down.q.sharding.spec[1] or ())

    msgs = [{"role": "user", "content": "tell me about the harbor"}]
    a = plain.infer(msgs, max_tokens=16)
    b = sharded.infer(msgs, max_tokens=16)
    assert a.text == b.text
    # guided decoding composes with int8-TP too
    g1 = plain.infer(msgs, max_tokens=24, json_template="ner")
    g2 = sharded.infer(msgs, max_tokens=24, json_template="ner")
    assert g1.text == g2.text


# ----------------------------------------------------------------- interface
def test_render_chat_frames_roles():
    text = render_chat([
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ])
    assert "### System:\nbe brief" in text
    assert text.endswith("### Assistant:\n")


def test_infer_metadata_and_determinism():
    llm = JaxOfflineLLM(seed=1)
    msgs = [{"role": "user", "content": "alpha beta"}]
    r1 = llm.infer(msgs, max_tokens=16)
    r2 = llm.infer(msgs, max_tokens=16)
    assert r1.text == r2.text  # greedy: fully deterministic
    assert r1.metadata["prompt_tokens"] > 0
    assert r1.metadata["completion_tokens"] <= 16


def test_guided_prefixes_always_legal_and_stops_parse():
    """Every guided generation emits a DFA-legal prefix; rows that finish
    before the budget are complete, schema-valid JSON."""
    llm = JaxOfflineLLM(seed=7, temperature=0.8)
    msgs = [{"role": "user", "content": "extract"}]
    for name in ("ner", "triples", "qa_cot"):
        dfa = compile_json_schema(JSON_TEMPLATES[name])
        r = llm.infer(msgs, max_tokens=128, json_template=name)
        assert dfa.walk(r.text.encode()) >= 0, (name, r.text[:80])
        if r.metadata["finish_reason"] == "stop":
            obj = json.loads(r.text)
            key = next(iter(JSON_TEMPLATES[name]["properties"]))
            assert key in obj


def test_max_completion_tokens_is_honored():
    """The OpenAI-client spelling (rerank/summarize pass it) must cap the
    decode like max_tokens does — dropping it silently decoded to the
    engine default (2048-token while_loops per rerank call)."""
    llm = JaxOfflineLLM(seed=3)
    msgs = [{"role": "user", "content": "alpha beta gamma"}]
    r = llm.infer(msgs, max_completion_tokens=8)
    assert r.metadata["completion_tokens"] <= 8
    rb = llm.batch_infer([msgs], max_completion_tokens=8)[0]
    assert rb.metadata["completion_tokens"] <= 8
    # through the window server too (group key + engine call)
    from comorag_tpu.llm.serving import GenerationServer

    with GenerationServer(llm, window_ms=1.0) as srv:
        rs = srv.infer(msgs, max_completion_tokens=8)
    assert rs.metadata["completion_tokens"] <= 8


def test_batch_infer_isolates_malformed_rows():
    """One malformed message dict in a merged batch must error only its
    own row — innocent concurrent requests share batches through the
    window server."""
    llm = JaxOfflineLLM(seed=4)
    good = [{"role": "user", "content": "fine prompt"}]
    bad = [{"bogus": "no role or content"}]
    out = llm.batch_infer([good, bad, good], max_tokens=8)
    assert out[0].text == out[2].text
    assert out[0].metadata.get("finish_reason") != "error"
    assert out[1].metadata.get("finish_reason") == "error"
    assert out[1].text == ""


def test_batch_infer_matches_single_greedy():
    llm = JaxOfflineLLM(seed=2)
    msgs_a = [{"role": "user", "content": "one two three"}]
    msgs_b = [{"role": "user", "content": "a much longer prompt " * 20}]
    singles = [llm.infer(m, max_tokens=12).text for m in (msgs_a, msgs_b)]
    batched = [r.text for r in llm.batch_infer([msgs_a, msgs_b], max_tokens=12)]
    assert batched == singles


def test_batch_infer_token_budget_splits_long_prompt_batches():
    """KV token-budget admission (the vLLM max_num_batched_tokens
    counterpart): long-prompt groups split into smaller device calls so
    the per-call KV cache stays under kv_budget_bytes (32 x 4096-token
    summarization rows OOMed the real chip at request-count batching),
    while short-prompt groups keep full batch width."""
    llm = JaxOfflineLLM(seed=3)
    hd = llm.arch.head_dim
    slot_bytes = (
        llm.arch.num_layers * 2 * llm.arch.num_kv_heads * hd
        * jnp.dtype(llm.compute_dtype).itemsize
    )
    # budget: 4 rows of the engine's full window, so an 8-row long-prompt
    # batch must split into >= 2 calls
    llm._slot_row_budget = 4 * llm.max_model_len
    assert slot_bytes > 0  # construction sanity

    calls = []
    orig = llm._generate_batch

    def spy(prompts, *a, **k):
        calls.append(len(prompts))
        return orig(prompts, *a, **k)

    llm.__dict__["_generate_batch"] = spy
    long = "x " * (llm.max_model_len)  # tokenizes past the window -> clamped
    out = llm.batch_infer(
        [[{"role": "user", "content": long}] for _ in range(8)], max_tokens=8
    )
    assert len(out) == 8 and all(r.metadata.get("finish_reason") != "error" for r in out)
    assert len(calls) >= 2 and max(calls) <= 4, calls

    calls.clear()
    short = [[{"role": "user", "content": f"tiny prompt {i}"}] for i in range(8)]
    out = llm.batch_infer(short, max_tokens=8)
    assert len(out) == 8
    assert len(calls) == 1, calls  # short rows still batch at full width


def test_token_budget_charges_prefill_slab():
    """The admission cost per slot-row must include the chunked-prefill
    f32 score+probs slabs, not KV bytes alone: charging KV only let the
    int8-KV halving double admitted rows and OOM a 32 x 3.5k-token batch
    on the real chip (scripts/exp_kv_admission.py repro). Pins the
    formula so a refactor can't silently regress to KV-only."""
    from comorag_tpu.models.decoder import _PREFILL_CHUNK

    budget = 64 << 20
    llm = JaxOfflineLLM(seed=0, kv_budget_bytes=budget)
    a = llm.arch
    kv_slot = a.num_layers * 2 * a.num_kv_heads * a.head_dim * jnp.dtype(
        llm.compute_dtype
    ).itemsize
    slab = a.num_heads * _PREFILL_CHUNK * 4 * 2  # f32 scores + probs per slot-row
    assert llm._slot_row_budget == budget // (kv_slot + slab)

    # int8 KV shrinks ONLY the kv term; the slab term caps the row gain
    llm8 = JaxOfflineLLM(seed=0, kv_budget_bytes=budget, kv_dtype="int8")
    kv_slot8 = a.num_layers * 2 * a.num_kv_heads * (a.head_dim + 4)
    assert llm8._slot_row_budget == budget // (kv_slot8 + slab)
    assert llm8._slot_row_budget < 2 * llm._slot_row_budget


def test_batch_infer_unknown_template_isolated():
    llm = JaxOfflineLLM(seed=0)
    out = llm.batch_infer([[{"role": "user", "content": "x"}]], json_template="nope")
    assert out[0].metadata.get("finish_reason") == "error"


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "héllo — ∀x"
    assert tok.decode(tok.encode(s)) == s
    assert len(tok.token_bytes()) == tok.vocab_size


def test_factory_routes_jax_offline(tmp_config):
    from comorag_tpu.llm import get_llm
    from comorag_tpu.llm.serving import GenerationServer

    tmp_config.llm_name = "jax-offline"
    llm = get_llm(tmp_config)
    # the factory wraps the engine in the window-batching server so the
    # meta loop's 16 threads share device programs
    assert isinstance(llm, GenerationServer)
    assert isinstance(llm.engine, JaxOfflineLLM)
    # OpenIE checks the WRAPPER for guided support (ie/openie.py)
    assert llm.supports_guided_json
    llm.close()


def test_openie_with_guided_offline_engine():
    """The offline-OpenIE capability (reference: openie_vllm_offline.py)
    runs hermetically end-to-end: both stages constrained, every response
    either parses or is a repairable truncation — never free-form junk."""
    from comorag_tpu.ie.openie import OpenIE

    llm = JaxOfflineLLM(seed=5, temperature=0.9, max_new_tokens=96)
    ie = OpenIE(llm)
    ner, triples = ie.batch_openie({"c1": "Mira sailed to Harbor Light.", "c2": "The museum opened."})
    assert set(ner) == {"c1", "c2"} and set(triples) == {"c1", "c2"}
    ner_dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    tri_dfa = compile_json_schema(JSON_TEMPLATES["triples"])
    for r in ner.values():
        assert ner_dfa.walk(r.response.encode()) >= 0
        assert isinstance(r.unique_entities, list)
    for r in triples.values():
        assert tri_dfa.walk(r.response.encode()) >= 0
        for t in r.triples:
            assert len(t) == 3


# ---------------------------------------------------------------- LM training
def test_lm_train_loss_decreases():
    from comorag_tpu.models.train_lm import create_lm_train_state, lm_loss, make_lm_train_step

    arch = DecoderArch.tiny(vocab_size=64)
    state = create_lm_train_state(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (8, 32)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[:, 28:] = 0  # some pad tail
    batch = {"ids": jnp.asarray(ids), "mask": jnp.asarray(mask)}
    import optax

    step = make_lm_train_step(arch, optimizer=optax.adam(1e-2))
    state = create_lm_train_state(jax.random.PRNGKey(0), arch, optimizer=optax.adam(1e-2))
    first = float(lm_loss(state.params, batch, arch))
    for _ in range(30):
        state, loss = step(state, batch)
    assert float(loss) < first * 0.5, (first, float(loss))
    assert int(state.step) == 30


def test_lm_train_step_sharded_matches_unsharded_first_step():
    from comorag_tpu.models.train_lm import create_lm_train_state, make_lm_train_step
    from comorag_tpu.parallel.mesh import build_mesh

    arch = DecoderArch.tiny(vocab_size=64)
    mesh = build_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 64, (8, 16)), jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}

    s0 = create_lm_train_state(jax.random.PRNGKey(0), arch)
    _, loss_plain = make_lm_train_step(arch)(s0, batch)
    s1 = create_lm_train_state(jax.random.PRNGKey(0), arch)
    _, loss_sharded = make_lm_train_step(arch, mesh=mesh)(s1, batch)
    np.testing.assert_allclose(float(loss_sharded), float(loss_plain), rtol=1e-5)


def test_int8_quantized_params_generate():
    """int8 weight storage: quantization error bounded per channel and
    greedy generation still runs end-to-end (QuantWeight matmul path)."""
    from comorag_tpu.models.decoder import quantize_params

    qp = quantize_params(PARAMS)
    w = np.asarray(PARAMS["layers"]["qkv_w"])
    deq = np.asarray(qp["layers"]["qkv_w"].q, np.float32) * np.asarray(qp["layers"]["qkv_w"].scale)
    err = np.abs(w - deq)
    assert err.max() <= np.asarray(qp["layers"]["qkv_w"].scale).max() * 0.51

    llm = JaxOfflineLLM(params=PARAMS, arch=ARCH, param_dtype="int8")
    r = llm.infer([{"role": "user", "content": "hello"}], max_tokens=12)
    assert isinstance(r.text, str)
    assert r.metadata["completion_tokens"] <= 12
    # guided decoding composes with quantized weights
    g = llm.infer([{"role": "user", "content": "x"}], max_tokens=64, json_template="ner")
    from comorag_tpu.llm.guided import compile_json_schema

    assert compile_json_schema(JSON_TEMPLATES["ner"]).walk(g.text.encode()) >= 0


def test_int4_quantized_params_generate_and_logit_drift():
    """VERDICT r3 #7: 4-bit weight storage (Int4Weight, grouped scales).
    Dequant error bounded by half the group step, logits track the fp32
    model (top-1 agreement on a forward pass), greedy generation and
    guided decoding run end-to-end."""
    from comorag_tpu.models.decoder import (
        KVCache,
        decoder_forward,
        quantize_params_int4,
    )
    from comorag_tpu.ops.pallas_int4 import dequantize_int4

    qp = quantize_params_int4(PARAMS)
    w = np.asarray(PARAMS["layers"]["qkv_w"])[0]
    i4 = qp["layers"]["qkv_w"]
    gs = (i4.packed.shape[-2] * 2) // i4.scale.shape[-2]
    deq = np.asarray(dequantize_int4(i4.packed[0], i4.scale[0], gs))
    # |w - deq| <= scale/2 per (group, channel)
    step = np.repeat(np.asarray(i4.scale[0]), gs, axis=0)
    assert (np.abs(w - deq) <= step * 0.51).all()

    # logit drift: int4 forward tracks fp32 top-1 on a short prompt
    ids = jnp.asarray([[5, 9, 2, 7, 1, 3, 8, 4]], jnp.int32)
    b, s = ids.shape
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    mask = jnp.tril(jnp.ones((s, s), bool))[None]
    def logits_of(params):
        cache = KVCache.zeros(ARCH, b, s)
        out, _ = decoder_forward(
            params, ids, pos,
            jnp.pad(mask, ((0, 0), (0, 0), (0, 0))), cache,
            jnp.int32(0), ARCH,
        )
        return np.asarray(out[0])
    lf = logits_of(PARAMS)
    lq = logits_of(qp)
    # relative L2 drift is the robust metric on a tiny RANDOM model whose
    # logits are near-tied (top-1 agreement is a coin flip there; real
    # checkpoints track far closer at 4 bits)
    rel = np.linalg.norm(lq - lf) / (np.linalg.norm(lf) + 1e-9)
    assert rel < 0.25, rel
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 3 / 259, agree  # far better than chance over the vocab

    llm = JaxOfflineLLM(params=PARAMS, arch=ARCH, param_dtype="int4")
    r = llm.infer([{"role": "user", "content": "hello"}], max_tokens=12)
    assert isinstance(r.text, str)
    assert r.metadata["completion_tokens"] <= 12
    g = llm.infer([{"role": "user", "content": "x"}], max_tokens=64, json_template="ner")
    from comorag_tpu.llm.guided import compile_json_schema

    assert compile_json_schema(JSON_TEMPLATES["ner"]).walk(g.text.encode()) >= 0


def test_int4_tp_matches_single_device_int4():
    """Int4Weight leaves shard column-parallel over the model axis
    (packed and grouped scales together); int4-TP generation must match
    single-device int4 exactly (greedy)."""
    from jax.sharding import NamedSharding

    from comorag_tpu.parallel.mesh import build_mesh

    mesh = build_mesh({"model": 2}, devices=jax.devices()[:2])
    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0, param_dtype="int4")
    sharded = JaxOfflineLLM(
        params=PARAMS, arch=ARCH, seed=0, param_dtype="int4", mesh=mesh
    )
    qkv = sharded.params["layers"]["qkv_w"]
    assert qkv.packed.dtype == jnp.int8  # nibble-packed storage
    assert isinstance(qkv.packed.sharding, NamedSharding)
    assert "model" in (qkv.packed.sharding.spec[-1] or ())
    assert "model" in (qkv.scale.sharding.spec[-1] or ())

    msgs = [{"role": "user", "content": "tell me about the harbor"}]
    a = plain.infer(msgs, max_tokens=16)
    b = sharded.infer(msgs, max_tokens=16)
    assert a.text == b.text


# --------------------------------------------------------------- prefix cache
def test_prefix_cached_generation_matches_unsplit():
    """prefill_prefix(header) + generate(remainder, prefix=...) must decode
    exactly what generate(header+remainder) does (same slots, same RoPE
    positions when rows are unpadded)."""
    from comorag_tpu.models.decoder import prefill_prefix

    header = [257] + list(range(40, 104))  # 65 tokens
    rest = [72, 101, 108, 112, 33]
    steps = 6
    full = header + rest
    a = generate(
        PARAMS, jnp.asarray([full], jnp.int32), jnp.ones((1, len(full)), jnp.int32),
        ARCH, max_new_tokens=steps, eos_id=EOS, pad_id=PAD,
    )
    pc = prefill_prefix(PARAMS, jnp.asarray(header, jnp.int32), ARCH)
    b = generate(
        PARAMS, jnp.asarray([rest], jnp.int32), jnp.ones((1, len(rest)), jnp.int32),
        ARCH, max_new_tokens=steps, eos_id=EOS, pad_id=PAD, prefix=pc,
    )
    assert np.asarray(a.tokens)[0].tolist() == np.asarray(b.tokens)[0].tolist()


def test_engine_prefix_lru_shared_batches():
    """Two batch_infer calls sharing a long system header: the second call
    reuses the cached header (LRU hit) and outputs stay identical to a
    fresh engine without caching."""
    # fits tiny-arch max_seq_len 512 with headroom: front truncation would
    # shift the header and (correctly) defeat prefix matching
    sys_msg = {"role": "system", "content": "instructions " * 20}
    batches = [
        [[sys_msg, {"role": "user", "content": f"q{i} alpha"}] for i in range(3)],
        [[sys_msg, {"role": "user", "content": f"q{i} beta"}] for i in range(3)],
    ]
    cached = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    plain.prefix_cache_min = 10 ** 9  # disable prefix caching

    out_c = [r.text for b in batches for r in cached.batch_infer(b, max_tokens=10)]
    out_p = [r.text for b in batches for r in plain.batch_infer(b, max_tokens=10)]
    assert out_c == out_p
    assert len(cached._prefix_lru) == 1  # same header -> one entry, reused
    assert not plain._prefix_lru
    r = cached.batch_infer(batches[0], max_tokens=10)[0]
    assert r.metadata["cached_prefix_tokens"] >= 64


# ------------------------------------------------------------ request window
def test_generation_server_batches_concurrent_callers():
    """16 threads submitting concurrently (the meta loop's envelope) get
    correct, per-caller answers, and overlapping requests actually share
    device programs (batched_with > 0 for some)."""
    from concurrent.futures import ThreadPoolExecutor

    from comorag_tpu.llm.serving import GenerationServer

    engine = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    with GenerationServer(engine, window_ms=25.0, max_batch=16) as server:
        def ask(i):
            return server.infer(
                [{"role": "user", "content": f"question {i}"}], max_tokens=8
            )

        with ThreadPoolExecutor(max_workers=16) as pool:
            results = list(pool.map(ask, range(16)))

        # answers must equal direct engine output for the same prompt
        direct = engine.infer([{"role": "user", "content": "question 3"}], max_tokens=8)
        assert results[3].text == direct.text
        assert all(r.metadata.get("finish_reason") in ("stop", "length") for r in results)
        assert any(r.metadata["batched_with"] > 0 for r in results)

    # closed server refuses new work
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        server.submit([{"role": "user", "content": "late"}])


def test_generation_server_groups_by_options():
    """Mixed guided/free requests in one window resolve independently."""
    from comorag_tpu.llm.serving import GenerationServer

    engine = JaxOfflineLLM(params=PARAMS, seed=1, temperature=0.8)
    with GenerationServer(engine, window_ms=25.0) as server:
        f1 = server.submit([{"role": "user", "content": "a"}], max_tokens=32, json_template="ner")
        f2 = server.submit([{"role": "user", "content": "b"}], max_tokens=8)
        r1, r2 = f1.result(), f2.result()
    dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    assert dfa.walk(r1.text.encode()) >= 0
    assert r2.metadata["completion_tokens"] <= 8


def test_prefix_batch_with_padded_rows_matches_singles():
    """Heterogeneous-length prompts sharing a 64+-token header: the
    prefix-cached, left-padded batch must decode exactly what each prompt
    decodes alone (regression: per-row positions, not slot positions —
    slot-based RoPE inflated short rows' distance to the prefix)."""
    header = {"role": "system", "content": "rules " * 30}
    prompts = [
        [header, {"role": "user", "content": "x"}],
        [header, {"role": "user", "content": "a much longer question about the harbor light museum"}],
    ]
    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    plain.prefix_cache_min = 10 ** 9  # singles, no prefix machinery
    singles = [plain.infer(m, max_tokens=8).text for m in prompts]

    cached = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    batched = [r.text for r in cached.batch_infer(prompts, max_tokens=8)]
    assert cached._prefix_lru, "prefix cache should have engaged"
    assert batched == singles


def test_lm_memorizes_and_generates_sequence(tmp_path):
    """End-to-end training proof: finetune the tiny LM on one sequence
    until it memorizes it, checkpoint-roundtrip the state, then greedy
    generation from the sequence head reproduces the tail."""
    import optax

    from comorag_tpu.models.train import load_checkpoint, save_checkpoint
    from comorag_tpu.models.train_lm import create_lm_train_state, make_lm_train_step

    arch = DecoderArch.tiny(vocab_size=64)
    opt = optax.adam(5e-3)
    state = create_lm_train_state(jax.random.PRNGKey(0), arch, optimizer=opt)
    seq = [2, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61]
    ids = jnp.asarray([seq] * 4, jnp.int32)
    batch = {"ids": ids, "mask": jnp.ones_like(ids)}
    step = make_lm_train_step(arch, optimizer=opt)
    loss = None
    for _ in range(300):
        state, loss = step(state, batch)
        if float(loss) < 0.02:
            break
    assert float(loss) < 0.1, f"did not memorize, loss={float(loss)}"

    save_checkpoint(str(tmp_path / "lm_ckpt"), state)
    fresh = create_lm_train_state(jax.random.PRNGKey(1), arch, optimizer=opt)
    restored = load_checkpoint(str(tmp_path / "lm_ckpt"), fresh)

    head, tail = seq[:8], seq[8:]
    out = generate(
        restored.params, jnp.asarray([head], jnp.int32), jnp.ones((1, 8), jnp.int32),
        arch, max_new_tokens=len(tail), eos_id=63, pad_id=0,
    )
    assert np.asarray(out.tokens)[0].tolist() == tail


def test_train_cli_end_to_end(tmp_path):
    """The training CLI drives tokenize -> contrastive steps -> orbax
    checkpoint; loss decreases on a learnable toy task and the checkpoint
    reloads into a serving encoder."""
    import json as _json

    from comorag_tpu.cli.train import main as train_main

    pairs = [{"query": f"topic {i} question", "passage": f"topic {i} passage text"} for i in range(32)]
    ppath = tmp_path / "pairs.jsonl"
    with open(ppath, "w") as f:
        for p in pairs:
            f.write(_json.dumps(p) + "\n")

    out = tmp_path / "ckpt"
    summary = train_main([
        "--pairs", str(ppath), "--output_dir", str(out),
        "--init", "tiny", "--steps", "60", "--batch", "16",
        "--lr", "3e-3", "--max_seq_len", "16", "--log_every", "10",
    ])
    assert summary["final_loss"] < summary["first_loss"]
    assert (out / "train_summary.json").exists()

    # checkpoint loads back into a TrainState and the params serve
    import jax
    import optax

    from comorag_tpu.models.bge import BGEJaxEncoder, EncoderArch, init_params
    from comorag_tpu.models.train import TrainState, load_checkpoint, make_optimizer

    arch = EncoderArch.tiny()
    opt = make_optimizer(3e-3)
    params0 = init_params(jax.random.PRNGKey(0), arch)
    fresh = TrainState(params0, opt.init(params0), jnp.zeros((), jnp.int32))
    restored = load_checkpoint(str(out / "train_state"), fresh)
    assert int(restored.step) == 60
    enc = BGEJaxEncoder(params=restored.params, arch=arch, max_seq_len=16)
    vecs = enc.encode(["topic 3 question"])
    assert vecs.shape == (1, arch.hidden_size)


# ------------------------------------------------------- speculative decoding
def _spec_vs_sequential(params, arch, ids, mask, *, max_new=24, table=None,
                        prefix=None, draft_len=5, eos=EOS, pad=PAD, limit=None):
    from comorag_tpu.models.decoder import generate_speculative

    ref = generate(
        params, ids, mask, arch, max_new_tokens=max_new, eos_id=eos, pad_id=pad,
        token_table=table, prefix=prefix, limit=limit,
    )
    spec = generate_speculative(
        params, ids, mask, arch, max_new_tokens=max_new, eos_id=eos, pad_id=pad,
        draft_len=draft_len, token_table=table, prefix=prefix, limit=limit,
    )
    assert np.asarray(spec.lengths).tolist() == np.asarray(ref.lengths).tolist()
    assert np.asarray(spec.tokens).tolist() == np.asarray(ref.tokens).tolist()
    return spec


def test_speculative_matches_sequential_greedy():
    """Random weights (near-zero acceptance): the rejection path emits
    exactly the sequential greedy stream, ragged left-padded batch."""
    rng = np.random.default_rng(3)
    ids = np.full((3, 12), PAD, np.int32)
    mask = np.zeros((3, 12), np.int32)
    for i, n in enumerate((12, 7, 3)):
        ids[i, 12 - n:] = rng.integers(0, 255, n)
        mask[i, 12 - n:] = 1
    _spec_vs_sequential(PARAMS, ARCH, jnp.asarray(ids), jnp.asarray(mask))


def test_speculative_matches_sequential_guided():
    """Guided-JSON DFA advanced along the verified chunk: constrained
    speculative decode equals constrained sequential decode."""
    dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    tok = ByteTokenizer()
    table = jnp.asarray(make_token_table(dfa, tok.token_bytes(), eos_token_id=EOS))
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    mask = jnp.ones_like(ids)
    _spec_vs_sequential(PARAMS, ARCH, ids, mask, table=table, max_new=40)


def test_speculative_matches_sequential_with_prefix():
    from comorag_tpu.models.decoder import prefill_prefix

    prefix_ids = jnp.arange(1, 17, dtype=jnp.int32)
    prefix = prefill_prefix(PARAMS, prefix_ids, ARCH)
    ids = jnp.asarray([[9, 8, 7, 6], [PAD, PAD, 5, 4]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1], [0, 0, 1, 1]], jnp.int32)
    _spec_vs_sequential(PARAMS, ARCH, ids, mask, prefix=prefix, max_new=16, limit=jnp.int32(10))


def test_speculative_accepts_on_repetitive_continuation():
    """A model trained on a cyclic sequence continues the cycle; prompt-
    lookup drafts then come true and the loop commits multiple tokens per
    device step (fewer iterations than emitted tokens)."""
    import optax

    from comorag_tpu.models.decoder import generate_speculative
    from comorag_tpu.models.train_lm import create_lm_train_state, make_lm_train_step

    arch = DecoderArch.tiny(vocab_size=64)
    opt = optax.adam(5e-3)
    state = create_lm_train_state(jax.random.PRNGKey(0), arch, optimizer=opt)
    cycle = [5, 9, 14, 23, 31, 42]
    seq = (cycle * 6)[:32]
    ids = jnp.asarray([seq] * 4, jnp.int32)
    step = make_lm_train_step(arch, optimizer=opt)
    loss = None
    for _ in range(300):
        state, loss = step(state, {"ids": ids, "mask": jnp.ones_like(ids)})
        if float(loss) < 0.02:
            break
    assert float(loss) < 0.1, f"did not learn the cycle, loss={float(loss)}"

    head = seq[:12]
    want = (cycle * 12)[12:12 + 24]
    spec = generate_speculative(
        state.params, jnp.asarray([head], jnp.int32), jnp.ones((1, 12), jnp.int32),
        arch, max_new_tokens=24, eos_id=63, pad_id=0, draft_len=5,
    )
    assert np.asarray(spec.tokens)[0].tolist() == want
    # 24 tokens in far fewer steps than sequential's 24
    assert int(spec.steps) <= 8, f"no speculation win: {int(spec.steps)} steps"


def test_engine_speculative_matches_plain():
    """JaxOfflineLLM(speculative=True) emits byte-identical text to the
    plain engine at greedy temperature, free and guided."""
    plain = JaxOfflineLLM(seed=7)
    spec = JaxOfflineLLM(seed=7, speculative=True, draft_len=5)
    msgs = [[{"role": "user", "content": f"Summarize item {i}: the fox runs."}]
            for i in range(3)]
    for kwargs in ({"max_tokens": 48}, {"max_tokens": 48, "json_template": "ner"}):
        a = plain.batch_infer(msgs, **kwargs)
        b = spec.batch_infer(msgs, **kwargs)
        assert [r.text for r in a] == [r.text for r in b]
        assert all("decode_steps" in r.metadata for r in b)


def test_adaptive_spec_fallback_is_output_transparent():
    """When speculative decode commits fewer tokens/step than its step-cost
    ratio (chip-measured 2.2x, scripts/exp_openie_profile.py), the engine
    permanently falls back to the plain program — and the switch changes
    NOTHING about the emitted text (greedy exactness holds across it)."""
    plain = JaxOfflineLLM(seed=7)
    # ratio=1e9 makes ANY efficiency insufficient: fallback must fire on
    # the 3rd spec call regardless of how well the draft echoes
    spec = JaxOfflineLLM(seed=7, speculative=True, draft_len=5,
                         spec_fallback_ratio=1e9)
    msgs = [[{"role": "user", "content": f"note {i}: the owl waits."}]
            for i in range(2)]
    texts = []
    for _ in range(5):
        texts.append([r.text for r in spec.batch_infer(msgs, max_tokens=16)])
    assert not spec._spec_active, "fallback never fired"
    ref = [r.text for r in plain.batch_infer(msgs, max_tokens=16)]
    assert all(t == ref for t in texts), "fallback changed outputs"
    # plain engines never enter the fallback stats path
    assert plain._spec_eff_ema is None


def test_generation_server_speculative_engine_concurrent():
    """The window server over a speculative engine: 12 concurrent callers
    batch into shared speculative decode programs and get the same text a
    plain engine produces (greedy exactness holds through the server)."""
    from concurrent.futures import ThreadPoolExecutor

    from comorag_tpu.llm.serving import GenerationServer

    plain = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0)
    spec = JaxOfflineLLM(params=PARAMS, arch=ARCH, seed=0, speculative=True, draft_len=5)
    with GenerationServer(spec, window_ms=25.0, max_batch=16) as server:
        def ask(i):
            return server.infer(
                [{"role": "user", "content": f"question {i % 4}"}], max_tokens=8
            )

        with ThreadPoolExecutor(max_workers=12) as pool:
            results = list(pool.map(ask, range(12)))

    for i, r in enumerate(results):
        direct = plain.infer([{"role": "user", "content": f"question {i % 4}"}], max_tokens=8)
        assert r.text == direct.text
        assert "decode_steps" in r.metadata


def test_speculative_matches_sequential_int8():
    """Speculative decode over int8-quantized weights (the shipped serving
    dtype) emits exactly the sequential greedy stream."""
    from comorag_tpu.models.decoder import quantize_params

    qparams = quantize_params(PARAMS)
    ids = jnp.asarray([[257, 10, 20, 30, 40, 50]], jnp.int32)
    _spec_vs_sequential(qparams, ARCH, ids, jnp.ones_like(ids), max_new=16)


# ------------------------------------------------- real subword vocab (r2 #4)
def _tiny_bpe_tokenizer(tmp_path, drop_chars=""):
    """A REAL HF byte-level-BPE tokenizer (GPT-2 class) built offline:
    all 256 single-byte tokens through the bytes<->unicode alphabet,
    plus multi-byte merged tokens that cross JSON structural boundaries
    ('{"', '":[', '"],' ...). ``drop_chars`` removes every token touching
    those bytes — for testing the over-constrained failure mode."""
    import json as _json

    from transformers import GPT2Tokenizer

    from comorag_tpu.llm.jax_offline import _gpt2_byte_unicode

    b2u = _gpt2_byte_unicode()

    def enc(raw: bytes) -> str:
        return "".join(b2u[b] for b in raw)

    singles = [enc(bytes([b])) for b in range(256)]
    merged_raw = [
        b'{"', b'":[', b'"],', b'"]}', b'"},', b'named', b'_entities',
        b'triples', b'Thought', b'Answer', b' the', b'\n\n', b'ab',
        b'\xc3\xa9',  # e-acute: a multi-byte utf-8 token
        b'":"', b'","',
    ]
    merged = [enc(m) for m in merged_raw]
    vocab_toks = [t for t in singles + merged
                  if not any(enc(c.encode()) in t for c in drop_chars)]
    vocab = {t: i for i, t in enumerate(vocab_toks)}
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    merges = ["#version: 0.2"]
    for t in merged:
        if t in vocab and len(t) >= 2:
            merges.append(f"{t[:1]} {t[1:]}")
    (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
    return GPT2Tokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        unk_token="<|endoftext|>", bos_token="<|endoftext|>", eos_token="<|endoftext|>",
    )


def test_qwen2_checkpoint_route_end_to_end(tmp_path):
    """The jax:<ckpt> route on a qwen2-family checkpoint WITH a real
    byte-level-BPE tokenizer saved beside it: load, guided-JSON infer,
    schema-valid output. This is the full path `get_llm("jax:<dir>")`
    exercises minus the factory string parsing."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    tok = _tiny_bpe_tokenizer(tmp_path)
    cfg = Qwen2Config(
        vocab_size=len(tok), hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=True,
        bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
    )
    torch.manual_seed(2)
    ckpt = tmp_path / "tiny_qwen2_full"
    Qwen2ForCausalLM(cfg).eval().save_pretrained(ckpt)
    tok.save_pretrained(ckpt)

    llm = JaxOfflineLLM(model_name_or_path=str(ckpt))
    assert llm.arch.qkv_bias
    out = llm.infer(
        [{"role": "user", "content": "extract entities"}],
        max_tokens=48, json_template="ner",
    )
    # the constrained decode may exhaust the budget mid-string (random
    # weights), but every emitted byte must stay ON the schema DFA — the
    # point is that a REAL byte-level-BPE vocab steers correctly
    dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    state = dfa.walk(out.text.encode())
    assert state >= 0, f"off-grammar output: {out.text!r}"
    if state == dfa.accept_state:
        assert isinstance(json.loads(out.text).get("named_entities"), list)


def test_chat_template_used_when_tokenizer_has_one(tmp_path):
    """A checkpoint tokenizer's own chat_template drives prompt rendering
    (the reference delegates to tokenizer.apply_chat_template,
    vllm_offline.py:14-25); its output embeds special tokens, so the
    encode step must not prepend a second BOS. Tokenizers without a
    template keep the explicit generic framing."""
    tok = _tiny_bpe_tokenizer(tmp_path)
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(0), arch), arch=arch, tokenizer=tok
    )
    msgs = [{"role": "user", "content": "ab"}]

    # no template -> generic framing, specials added on encode
    from comorag_tpu.llm.jax_offline import render_chat

    text, sp = llm._render(msgs)
    assert text == render_chat(msgs) and sp is True

    # a llama-3-flavored template: BOS + role headers in the STRING
    tok.chat_template = (
        "{{ bos_token }}{% for m in messages %}"
        "[{{ m['role'] }}]{{ m['content'] }}{% endfor %}"
        "{% if add_generation_prompt %}[assistant]{% endif %}"
    )
    text, sp = llm._render(msgs)
    assert text.startswith(tok.bos_token) and "[assistant]" in text
    assert sp is False
    ids = llm._ids(text, sp)
    # exactly one BOS: the template's own, none prepended by encode
    assert ids.count(tok.bos_token_id) == 1 and ids[0] == tok.bos_token_id

    # a broken template falls back to the generic framing, not an error
    tok.chat_template = "{{ undefined_fn(messages) }}"
    text, sp = llm._render(msgs)
    assert text == render_chat(msgs) and sp is True


def test_hf_byte_level_bpe_token_bytes(tmp_path):
    """ADVICE r2 #1: byte-level-BPE tokens invert through the full GPT-2
    byte<->unicode map — newline/tab/high-byte tokens expand to their REAL
    bytes, not corrupted two-marker replacements."""
    tok = _tiny_bpe_tokenizer(tmp_path)
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(0), arch), arch=arch, tokenizer=tok
    )
    tb = llm._hf_token_bytes()
    inv = {v: k for k, v in tok.get_vocab().items()}

    def tid(raw: bytes) -> int:
        from comorag_tpu.llm.jax_offline import _gpt2_byte_unicode

        b2u = _gpt2_byte_unicode()
        return tok.get_vocab()["".join(b2u[b] for b in raw)]

    assert tb[tid(b"\n\n")] == b"\n\n"          # 'ĊĊ', not spaces
    assert tb[tid(b"\t")] == b"\t"              # 'ĉ'
    assert tb[tid(b" the")] == b" the"          # 'Ġthe'
    assert tb[tid(b"\xc3\xa9")] == b"\xc3\xa9"  # multi-byte utf-8 survives
    assert tb[tok.eos_token_id] is None         # specials forbidden


def test_token_table_full_vocab_all_templates(tmp_path):
    """Every template's token table over the FULL real-BPE vocab passes
    the liveness + EOS-reachability audit (ADVICE r2 #2 wired in)."""
    tok = _tiny_bpe_tokenizer(tmp_path)
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(0), arch), arch=arch, tokenizer=tok
    )
    token_bytes = llm._hf_token_bytes()
    for name in JSON_TEMPLATES:
        dfa = compile_json_schema(JSON_TEMPLATES[name])
        table = make_token_table(dfa, token_bytes, eos_token_id=tok.eos_token_id)
        assert table.shape == (dfa.n_states, len(tok))


def test_token_table_overconstrained_vocab_fails_loudly(tmp_path):
    """A vocab that cannot close an array (']' removed) must fail at BUILD
    time, not silently emit off-grammar tokens at decode time."""
    tok = _tiny_bpe_tokenizer(tmp_path, drop_chars="]")
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(0), arch), arch=arch, tokenizer=tok
    )
    token_bytes = llm._hf_token_bytes()
    dfa = compile_json_schema(JSON_TEMPLATES["ner"])
    with pytest.raises(ValueError, match="dead state|EOS unreachable"):
        make_token_table(dfa, token_bytes, eos_token_id=tok.eos_token_id)


def test_guided_fuzz_walks_emit_valid_json(tmp_path):
    """Property fuzz (r2 #4): random token walks through the product table
    — including boundary-crossing merged tokens — always decode to
    schema-valid JSON once EOS is reached."""
    rng = np.random.default_rng(0)
    tok = _tiny_bpe_tokenizer(tmp_path)
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(0), arch), arch=arch, tokenizer=tok
    )
    token_bytes = llm._hf_token_bytes()
    for name in ("ner", "triples", "qa_cot"):
        dfa = compile_json_schema(JSON_TEMPLATES[name])
        table = make_token_table(dfa, token_bytes, eos_token_id=tok.eos_token_id)
        # distance-to-accept (in tokens) for biased, terminating walks
        succ = {}
        for s in range(dfa.n_states):
            row = table[s]
            succ[s] = np.unique(row[row >= 0])
        dist = {dfa.accept_state: 0}
        frontier = [dfa.accept_state]
        while frontier:
            t = frontier.pop(0)
            for s in range(dfa.n_states):
                if s not in dist and t in succ[s]:
                    dist[s] = dist[t] + 1
                    frontier.append(s)
        used_multibyte = False
        for _ in range(20):
            state, emitted = 0, []
            for _step in range(200):
                if state == dfa.accept_state:
                    break
                row = table[state]
                allowed = np.flatnonzero(row >= 0)
                assert allowed.size > 0
                if rng.random() < 0.5:  # bias toward closing the grammar
                    d = np.asarray([dist.get(int(row[a]), 1 << 30) for a in allowed])
                    choice = allowed[int(np.argmin(d))]
                else:
                    choice = int(rng.choice(allowed))
                if token_bytes[choice] and len(token_bytes[choice]) > 1:
                    used_multibyte = True
                emitted.append(int(choice))
                state = int(row[choice])
            assert state == dfa.accept_state, (name, state)
            text = b"".join(token_bytes[t] for t in emitted).decode("utf-8")
            obj = json.loads(text)  # valid JSON, always
            assert dfa.accepts(text.encode())
            if name == "ner":
                assert set(obj) == {"named_entities"}
        assert used_multibyte, "fuzz never exercised a multi-byte token"


def test_guided_generation_with_real_bpe_tokenizer(tmp_path):
    """End-to-end: random weights + the real BPE tokenizer + guided NER
    template -> the generated text IS schema-valid JSON."""
    tok = _tiny_bpe_tokenizer(tmp_path)
    arch = DecoderArch.tiny(vocab_size=len(tok))
    llm = JaxOfflineLLM(
        params=init_params(jax.random.PRNGKey(3), arch), arch=arch, tokenizer=tok
    )
    out = llm.infer(
        [{"role": "user", "content": "extract entities"}],
        max_tokens=48, json_template="ner",
    )
    obj = json.loads(out.text)
    assert set(obj) == {"named_entities"}


# ------------------------------------------- speculative sampling (r2 #5)
def test_speculative_sampling_matches_sequential_distribution():
    """Rejection-sampling speculative decode must leave the OUTPUT
    DISTRIBUTION identical to sequential sampling: compare both empirical
    joints of the first two emitted tokens against the exact model joint
    on a small-vocab arch (TV distance), and require that draft tokens
    actually get accepted (multi-token steps happened)."""
    from comorag_tpu.models.decoder import generate_speculative

    arch = DecoderArch(
        vocab_size=6, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_seq_len=64,
    )
    params = init_params(jax.random.PRNGKey(7), arch)
    temp, eos, pad = 0.7, 5, 0
    # repetitive prompt -> the 2-gram lookup finds real draft matches
    prompt = [1, 2, 3, 1, 2, 3, 1, 2]
    B, P = 256, len(prompt)
    ids = jnp.broadcast_to(jnp.asarray(prompt, jnp.int32), (B, P))
    mask = jnp.ones((B, P), jnp.int32)

    # exact joint over (t1, t2) / (eos, END) from the model itself
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, P, P), bool))
    logits, _ = decoder_forward(
        params, ids[:1], pos, attn, KVCache.zeros(arch, 1, P), jnp.int32(0), arch
    )
    p1 = np.asarray(jax.nn.softmax(logits[0, -1] / temp))
    exact = {}
    for t1 in range(arch.vocab_size):
        if t1 == eos:
            exact[(t1, -1)] = float(p1[t1])
            continue
        seq = prompt + [t1]
        n = len(seq)
        lg, _ = decoder_forward(
            params, jnp.asarray([seq], jnp.int32),
            jnp.arange(n, dtype=jnp.int32)[None, :],
            jnp.tril(jnp.ones((1, n, n), bool)),
            KVCache.zeros(arch, 1, n), jnp.int32(0), arch,
        )
        p2 = np.asarray(jax.nn.softmax(lg[0, -1] / temp))
        for t2 in range(arch.vocab_size):
            exact[(t1, t2)] = float(p1[t1] * p2[t2])

    def empirical(speculative, n_rounds=16):
        counts = {}
        total_steps = total_toks = 0
        for r in range(n_rounds):
            key = jax.random.PRNGKey(100 + r + (1000 if speculative else 0))
            if speculative:
                res = generate_speculative(
                    params, ids, mask, arch, max_new_tokens=4, eos_id=eos,
                    pad_id=pad, draft_len=3, temperature=temp, rng=key,
                )
                total_steps += int(res.steps) * B
                total_toks += int(np.sum(np.asarray(res.lengths)))
            else:
                res = generate(
                    params, ids, mask, arch, max_new_tokens=4, eos_id=eos,
                    pad_id=pad, temperature=temp, rng=key,
                )
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            for i in range(B):
                t1 = int(toks[i, 0])
                t2 = int(toks[i, 1]) if lens[i] >= 2 and t1 != eos else -1
                counts[(t1, t2)] = counts.get((t1, t2), 0) + 1
        n = n_rounds * B
        return {k: v / n for k, v in counts.items()}, total_steps, total_toks

    emp_seq, _, _ = empirical(False)
    emp_spec, _, _ = empirical(True)
    keys = set(exact) | set(emp_seq) | set(emp_spec)
    tv_seq = 0.5 * sum(abs(emp_seq.get(k, 0.0) - exact.get(k, 0.0)) for k in keys)
    tv_spec = 0.5 * sum(abs(emp_spec.get(k, 0.0) - exact.get(k, 0.0)) for k in keys)
    # sequential sampling ~ the sampling-noise floor; speculative must sit
    # in the same band, not drift (a broken accept rule shows up as 2-3x)
    assert tv_seq < 0.08, tv_seq
    assert tv_spec < 0.08, tv_spec
    # and drafts really do get accepted under sampling: single-row runs
    # where emitted tokens exceed loop iterations (multi-token commits)
    multi = 0
    for r in range(32):
        res = generate_speculative(
            params, ids[:1], mask[:1], arch, max_new_tokens=4, eos_id=eos,
            pad_id=pad, draft_len=3, temperature=temp,
            rng=jax.random.PRNGKey(5000 + r),
        )
        if int(np.asarray(res.lengths)[0]) > int(res.steps):
            multi += 1
    assert multi > 0, "no sampled draft was ever accepted in 32 runs"


def test_engine_speculative_sampling_route():
    """speculative engines keep multi-token steps at temperature>0 and
    still produce parseable guided JSON."""
    llm = JaxOfflineLLM(seed=2, speculative=True, temperature=0.7)
    out = llm.infer(
        [{"role": "user", "content": "harbor lights"}],
        max_tokens=24, json_template="ner",
    )
    assert out.metadata.get("decode_steps", 0) >= 1
    json.loads(out.text)


# ---------------------------------------------------- chunked prefill (r3)
def test_chunked_prefill_matches_naive_long_prompt():
    """Prompts past _PREFILL_CHUNK prefill in query chunks (bounded score
    slab; the full-bucket pass OOMed 16 GB HBM at 0.9B/B=8/P=4032) — the
    decode must still match the no-cache oracle token for token, and the
    speculative loop must match sequential greedy."""
    from comorag_tpu.models.decoder import _PREFILL_CHUNK, generate_speculative

    assert _PREFILL_CHUNK == 512
    rng = np.random.default_rng(4)
    prompt = [257] + rng.integers(0, 200, 700).astype(int).tolist()
    steps = 6
    oracle = _naive_greedy(PARAMS, prompt, steps)

    P = 1024  # > _PREFILL_CHUNK -> two chunks, with left padding
    ids = np.full((1, P), PAD, np.int32)
    mask = np.zeros((1, P), np.int32)
    ids[0, P - len(prompt):] = prompt
    mask[0, P - len(prompt):] = 1
    result = generate(
        PARAMS, jnp.asarray(ids), jnp.asarray(mask), ARCH,
        max_new_tokens=steps, eos_id=EOS, pad_id=PAD,
    )
    assert np.asarray(result.tokens)[0].tolist() == oracle

    spec = generate_speculative(
        PARAMS, jnp.asarray(ids), jnp.asarray(mask), ARCH,
        max_new_tokens=steps, eos_id=EOS, pad_id=PAD, draft_len=3,
    )
    assert np.asarray(spec.tokens)[0].tolist() == oracle


# -------------------------------------------------- int8 KV cache (r3)
def test_quant_kv_cache_roundtrip_and_forward_close():
    """QuantKVCache (vLLM kv_cache_dtype counterpart): per-(token, head)
    int8 KV quantization round-trips within 1/127 relative, and a full
    forward against the quant cache stays close to the exact cache."""
    from comorag_tpu.models.decoder import QuantKVCache, _quant_kv, make_kv_cache

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 2, 16)).astype(np.float32))
    q, s = _quant_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 2)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    # error bound of symmetric int8: half a quantization step of the
    # row's amax (near-zero elements have large RELATIVE error by design)
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(deq - np.asarray(x)) / amax).max() <= 0.5 / 127 + 1e-6

    prompt = [257, 72, 101, 108, 108, 111, 44, 99]
    n = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    attn = jnp.tril(jnp.ones((1, n, n), bool))
    exact_logits, _ = decoder_forward(
        PARAMS, ids, positions, attn, KVCache.zeros(ARCH, 1, n), jnp.int32(0), ARCH
    )
    qcache = make_kv_cache(ARCH, 1, n, jnp.float32, "int8")
    assert isinstance(qcache, QuantKVCache)
    q_logits, q_after = decoder_forward(
        PARAMS, ids, positions, attn, qcache, jnp.int32(0), ARCH
    )
    assert isinstance(q_after, QuantKVCache)
    np.testing.assert_allclose(
        np.asarray(q_logits), np.asarray(exact_logits), rtol=0.05, atol=0.05
    )


def test_quant_kv_generation_tracks_exact():
    """Greedy decode with the int8 KV cache follows the exact-cache decode
    closely on the tiny arch (sequential AND speculative paths, plus the
    prefix cache and the chunked long-prompt prefill)."""
    from comorag_tpu.models.decoder import generate_speculative

    prompt = [257] + list(range(65, 85))
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids)
    kw = dict(arch=ARCH, max_new_tokens=12, eos_id=EOS, pad_id=PAD)
    exact = generate(PARAMS, ids, mask, **kw)
    quant = generate(PARAMS, ids, mask, kv_dtype="int8", **kw)
    e, q = np.asarray(exact.tokens)[0], np.asarray(quant.tokens)[0]
    match = np.mean(e[:8] == q[:8])  # small logit gaps may flip late tokens
    assert match >= 0.75, (e.tolist(), q.tolist())

    spec = generate_speculative(PARAMS, ids, mask, draft_len=3, kv_dtype="int8", **kw)
    s = np.asarray(spec.tokens)[0]
    assert np.mean(q[:8] == s[:8]) >= 0.75, (q.tolist(), s.tolist())


def test_engine_int8_kv_generates():
    """Engine-level kv_dtype="int8": generation + guided JSON + prefix
    caching all run; guided output is schema-valid regardless of KV error."""
    llm = JaxOfflineLLM(seed=0, kv_dtype="int8", speculative=True)
    out = llm.infer(
        [{"role": "user", "content": "extract the entities now"}],
        max_tokens=24, json_template="ner",
    )
    json.loads(out.text)
    # batched prompts share a header -> prefix cache built with quant KV
    msgs = [
        [{"role": "system", "content": "x" * 200},
         {"role": "user", "content": f"item {i}"}]
        for i in range(3)
    ]
    outs = llm.batch_infer(msgs, max_tokens=8)
    assert len(outs) == 3 and all(isinstance(o.text, str) for o in outs)


def test_chunked_prefill_handles_non_multiple_widths(monkeypatch):
    """Window clamping / prefix stripping hand _prefill_batch prompt
    widths that are NOT chunk multiples (e.g. 3840 = window - bucket);
    the remainder chunk must produce the same result as unchunked, not
    assert (reproduced crash: 'AssertionError: (3840, 512)')."""
    from comorag_tpu.models import decoder as dec

    rng = np.random.default_rng(0)
    p = 96  # > chunk and NOT a multiple of it once patched to 64
    ids = jnp.asarray(rng.integers(3, 250, (2, p)), jnp.int32)
    mask = jnp.ones((2, p), jnp.int32)

    full_tokens, _, _ = generate(PARAMS, ids, mask, ARCH, max_new_tokens=8, eos_id=1, pad_id=0)

    monkeypatch.setattr(dec, "_PREFILL_CHUNK", 64)
    chunked_tokens, _, _ = generate(PARAMS, ids, mask, ARCH, max_new_tokens=8, eos_id=1, pad_id=0)
    np.testing.assert_array_equal(np.asarray(full_tokens), np.asarray(chunked_tokens))


def test_prefill_prefix_handles_non_multiple_widths(monkeypatch):
    """Shared prefixes are floored to 64-token multiples, not chunk
    multiples — the remainder chunk must keep results identical to the
    single-shot path instead of rebuilding the full-width score slab."""
    from comorag_tpu.models import decoder as dec
    from comorag_tpu.models.decoder import prefill_prefix

    rng = np.random.default_rng(1)
    prefix_ids = jnp.asarray(rng.integers(3, 250, (96,)), jnp.int32)
    row = jnp.asarray(rng.integers(3, 250, (1, 16)), jnp.int32)
    mask = jnp.ones((1, 16), jnp.int32)

    cache_full = prefill_prefix(PARAMS, prefix_ids, ARCH)
    toks_full, _, _ = generate(
        PARAMS, row, mask, ARCH, max_new_tokens=8, eos_id=1, pad_id=0, prefix=cache_full
    )
    monkeypatch.setattr(dec, "_PREFILL_CHUNK", 64)
    cache_chunked = prefill_prefix(PARAMS, prefix_ids, ARCH)
    toks_chunked, _, _ = generate(
        PARAMS, row, mask, ARCH, max_new_tokens=8, eos_id=1, pad_id=0, prefix=cache_chunked
    )
    np.testing.assert_array_equal(np.asarray(toks_full), np.asarray(toks_chunked))


def test_shared_prefix_never_consumes_whole_rows():
    """Identical prompts at a 64-multiple token length: the prefix strip
    must leave every row >= 1 real token — a fully-consumed row prefills
    from a pad-token query and samples the wrong first token."""
    llm = JaxOfflineLLM(seed=6)
    rows = [list(range(3, 3 + 128))] * 3  # identical, len 128 (64-multiple)
    cache, p0 = llm._shared_prefix(rows)
    assert p0 < 128  # at least one token left per row
    if p0:
        assert all(len(r[p0:]) >= 1 for r in rows)

    # end-to-end: identical batched prompts == the single-prompt result
    msgs = [{"role": "user", "content": "alpha beta gamma delta " * 16}]
    single = llm.infer(msgs, max_tokens=8).text
    batched = [r.text for r in llm.batch_infer([msgs, msgs, msgs], max_tokens=8)]
    assert batched == [single] * 3
