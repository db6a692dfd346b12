"""Golden tests for the TRAINED tiny checkpoint (assets/tiny_lm.npz).

The fake-LLM golden run (test_golden_200k) pins answer quality to
extractive chunk echoes; these tests hold the trained hermetic model
(recipe: scripts/train_tiny_lm.py, VERDICT r4 #2) to floors random
weights can never reach: guided JSON that parses AND carries
passage-copied entities, triple yield, the '### Final Answer' protocol
with the correct span, and an end-to-end pipeline run whose EM/F1
beat the fake-LLM plateau on the same corpus shape.

Reference counterpart: the pretrained-vLLM quality loop
(main_vllm.py:10-95, script/eval_qa.py:239-312).
"""

import json
import os

import numpy as np
import pytest

from comorag_tpu.models.curriculum import default_checkpoint_path

CKPT = default_checkpoint_path()

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="trained tiny checkpoint not built"
)


@pytest.fixture(scope="module")
def engine():
    from comorag_tpu.llm.jax_offline import JaxOfflineLLM
    from comorag_tpu.models.curriculum import load_tiny_checkpoint

    params, arch = load_tiny_checkpoint(CKPT)
    return JaxOfflineLLM(params=params, arch=arch, temperature=0.0, max_new_tokens=384)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260819)


@pytest.mark.slow
def test_guided_ner_parses_and_copies_entities(engine, rng):
    from comorag_tpu.models import curriculum as cur

    n = 8
    samples = [cur.make_sample(rng, "ner") for _ in range(n)]
    outs = engine._generate_batch([s["prompt"] for s in samples], 256, "ner", 0.0)
    parsed, recalls = 0, []
    for s, r in zip(samples, outs):
        try:
            got = json.loads(r.text)["named_entities"]
        except (json.JSONDecodeError, KeyError):
            continue
        parsed += 1
        gold = json.loads(s["completion"])["named_entities"]
        recalls.append(len(set(got) & set(gold)) / max(1, len(gold)))
    assert parsed >= n - 1, f"only {parsed}/{n} guided NER outputs parsed"
    assert np.mean(recalls) >= 0.6, f"entity recall {np.mean(recalls):.2f}"


@pytest.mark.slow
def test_guided_triples_yield(engine, rng):
    from comorag_tpu.models import curriculum as cur

    n = 8
    samples = [cur.make_sample(rng, "triples") for _ in range(n)]
    outs = engine._generate_batch([s["prompt"] for s in samples], 256, "triples", 0.0)
    parsed, nonempty = 0, 0
    for r in outs:
        try:
            got = json.loads(r.text)["triples"]
        except (json.JSONDecodeError, KeyError):
            continue
        parsed += 1
        nonempty += bool([t for t in got if len(t) == 3 and all(t)])
    assert parsed >= n - 1
    assert nonempty >= n * 0.6, f"triple yield {nonempty}/{n}"


@pytest.mark.slow
def test_qa_final_answer_protocol(engine, rng):
    from comorag_tpu.models import curriculum as cur

    n = 8
    samples = [cur.make_sample(rng, "qa") for _ in range(n)]
    outs = engine._generate_batch([s["prompt"] for s in samples], 384, None, 0.0)
    marker, correct = 0, 0
    for s, r in zip(samples, outs):
        gold = str(s["completion"]).rsplit("### Final Answer", 1)[1].strip()
        if "### Final Answer" not in r.text:
            continue
        marker += 1
        pred = r.text.rsplit("### Final Answer", 1)[1].strip()
        if gold == "*":
            correct += int(pred.startswith("*"))
        elif gold.lower() in pred.lower():
            correct += 1
    assert marker >= n - 1, f"marker rate {marker}/{n}"
    assert correct >= n * 0.5, f"answer rate {correct}/{n}"


@pytest.mark.slow
def test_end_to_end_beats_fake_llm_floor(tmp_path, rng):
    """Full pipeline (index + QA) on a small curriculum-world corpus with
    the TRAINED model via the `jax-tiny` factory route: extraction yield
    must be real (entities/facts stores populated from passages) and
    EM/F1 must beat what the fake LLM's full-chunk echo scores on the
    same corpus — the short-span Final Answer is the trained behavior."""
    from comorag_tpu.comorag import ComoRAG
    from comorag_tpu.config import ComoConfig
    from comorag_tpu.eval.qa_eval import evaluate_directory
    from comorag_tpu.models import curriculum as cur

    chunks, qas = [], []
    for g in range(4):
        place = cur.PLACES[g]
        name = cur._name(rng)
        tok = f"relic{g:03d}"
        chunks.append(
            f"Record {g}: the hidden {tok} was sealed inside the {place} vault "
            f"by the wandering cartographer {name}."
        )
        qas.append({
            "question": f"Where was the hidden {tok} sealed by {name.split()[0]}?",
            "answer": [f"inside the {place} vault", f"the {place} vault"],
        })
    for i in range(20):
        chunks.append(cur.make_passage(rng)[0])

    def run(llm_name: str, sub: str) -> float:
        config = ComoConfig(
            llm_name=llm_name,
            embedding_model_name="hash",
            embedding_dim=1024,
            need_cluster=True,
            save_dir=str(tmp_path / sub / "outputs"),
            output_dir=str(tmp_path / sub / "results"),
            gmm_max_clusters=4,
            gmm_em_iterations=10,
            max_meta_loop_iterations=1,
        )
        rag = ComoRAG(config)
        rag.index(chunks)
        solutions = rag.try_answer([q["question"] for q in qas])
        results = [
            {"idx": i, "question": q["question"], "golden_answers": q["answer"],
             "output": sol.answer}
            for i, (q, sol) in enumerate(zip(qas, solutions))
        ]
        out_dir = tmp_path / sub / "results"
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / "results.json").write_text(json.dumps(results))
        summary = evaluate_directory(str(out_dir))
        if llm_name == "jax-tiny":
            # extraction yield: real entities and facts in the stores
            assert len(rag.entity_store) > 0, "no entities extracted"
            assert len(rag.fact_store) > 0, "no triples extracted"
        return summary["F1"]

    f1_tiny = run("jax-tiny", "tiny")
    f1_fake = run("fake", "fake")
    assert f1_tiny > f1_fake + 0.05, (f1_tiny, f1_fake)
    assert f1_tiny >= 0.5, f1_tiny
