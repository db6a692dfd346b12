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
from comorag_tpu.utils.jsonio import load_jsonl, save_jsonl


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

    # rerunning the eval over the same tree must be IDEMPOTENT: the merge
    # glob used to sweep the eval's own artifacts back in, duplicating
    # every example and dragging EM/F1 down run after run (reproduced:
    # 0.5 -> 0.375 -> 0.269 over three identical runs)
    again = evaluate_directory(config.output_dir)
    assert again == pooled
    third = evaluate_directory(config.output_dir)
    assert third == pooled


def test_chunker_no_trailing_subset_windows():
    """Overlapped sliding windows must stop at the end — a final window
    fully contained in the previous one inflates the corpus with
    redundant near-duplicate rows."""
    text = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    chunks = chunk_by_words(text, 8, overlap=4)
    assert chunks == ["w0 w1 w2 w3 w4 w5 w6 w7", "w4 w5 w6 w7 w8 w9"]
    # exact multiple: no empty or duplicate tail either
    assert chunk_by_words("a b c d", 2, overlap=1) == ["a b", "b c", "c d"]


def test_chunk_cli_strips_title_prefix(tmp_path):
    """The reference chunks only the text AFTER the 'Title,' prefix
    (chunk_doc_corpus.py:62) — chunking it in shifts every boundary."""
    from comorag_tpu.cli.chunk import main as chunk_main
    import sys

    docs = [
        {"id": 0, "contents": "Moon Lantern,once upon a time the lantern rose over the bay"},
        {"id": 1, "contents": "no comma at all just words"},
    ]
    save_jsonl(docs, str(tmp_path / "corpus.jsonl"))
    argv = sys.argv
    sys.argv = [
        "chunk", "--input_path", str(tmp_path / "corpus.jsonl"),
        "--output_path", str(tmp_path / "chunks.jsonl"),
        "--chunk_by", "word", "--chunk_size", "6",
    ]
    try:
        chunk_main()
    finally:
        sys.argv = argv
    rows = load_jsonl(str(tmp_path / "chunks.jsonl"))
    assert rows[0]["contents"].startswith("once upon")  # title stripped
    assert all("Moon Lantern" not in r["contents"] for r in rows if r["doc_id"] == 0)
    # comma-less contents chunk whole (the reference crashes here)
    assert any(r["contents"].startswith("no comma") for r in rows if r["doc_id"] == 1)
