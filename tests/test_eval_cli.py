import json
import os

from comorag_tpu.cli.chunk import chunk_by_sentences, chunk_by_words
from comorag_tpu.cli.run import gold_answers_of, process_dataset
from comorag_tpu.config import ComoConfig
from comorag_tpu.eval.qa_eval import (
    evaluate_directory,
    exact_match_scores,
    extract_final_answer,
    f1_scores,
)
from comorag_tpu.utils.jsonio import save_jsonl


def test_extract_final_answer():
    text = "### Key Facts\n- x\n\n### Final Answer\nThe Slipper."
    assert extract_final_answer(text) == "The Slipper."
    assert extract_final_answer("no marker here") == "no marker here"
    assert extract_final_answer("") == ""


def test_em_f1():
    golds = [["the slipper", "golden slipper"], ["nobody"]]
    preds = ["The Slipper!", "someone else entirely"]
    em, em_ex = exact_match_scores(golds, preds)
    assert em["ExactMatch"] == 0.5
    f1, f1_ex = f1_scores(golds, preds)
    assert f1_ex[0]["F1"] == 1.0
    assert f1_ex[1]["F1"] == 0.0


def test_chunkers():
    text = "one two three four five six seven eight nine ten"
    chunks = chunk_by_words(text, 4)
    assert chunks[0] == "one two three four"
    assert sum(len(c.split()) for c in chunks) == 10
    overlapped = chunk_by_words(text, 4, overlap=2)
    assert len(overlapped) > len(chunks)
    sent_text = "First sentence here. Second one follows! Third ends it?"
    sents = chunk_by_sentences(sent_text, 6)
    assert len(sents) >= 2


def test_gold_answers_of():
    assert set(gold_answers_of({"answer": "x", "answer_aliases": ["y"]})) == {"x", "y"}
    assert gold_answers_of({"golden_answers": ["a", "b"]}) is not None


def test_dataset_run_and_eval(tmp_path):
    # build a mini dataset on disk
    ds = tmp_path / "ds1"
    ds.mkdir()
    corpus = [
        {"id": i, "contents": text}
        for i, text in enumerate(
            [
                "Captain Elara sailed the Windrose to the island of Karst in search of pearls.",
                "On Karst, Elara traded her compass for a map drawn by the hermit Dovan.",
                "Dovan's map led Elara to a cave where the black pearls grew on stone vines.",
                "Elara returned home and gave the largest pearl to her sister Wren.",
            ]
        )
    ]
    qas = [
        {"id": "1", "question": "What did Elara trade for the map?", "golden_answers": ["her compass", "compass"]},
        {"id": "2", "question": "Who received the largest pearl?", "golden_answers": ["Wren", "her sister"]},
    ]
    save_jsonl(corpus, str(ds / "corpus.jsonl"))
    save_jsonl(qas, str(ds / "qas.jsonl"))

    config = ComoConfig(
        llm_name="fake",
        embedding_model_name="hash",
        embedding_dim=64,
        need_cluster=True,
        save_dir=str(tmp_path / "outputs"),
        output_dir=str(tmp_path / "results"),
        max_meta_loop_iterations=1,
        gmm_max_clusters=3,
        gmm_em_iterations=15,
    )
    results = process_dataset(str(ds), config)
    assert len(results) == 2
    assert os.path.exists(os.path.join(config.output_dir, "results.json"))

    pooled = evaluate_directory(config.output_dir)
    assert "ExactMatch" in pooled and "F1" in pooled
    assert pooled["F1"] > 0  # the overlap FakeLLM should get compass/Wren
    assert os.path.exists(os.path.join(config.output_dir, "evaluation_results", "evaluation_summary.json"))
