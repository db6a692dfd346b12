import json

from comorag_tpu.agents.pool_agent import PoolAgent
from comorag_tpu.agents.probe_agent import ProbeAgent
from comorag_tpu.ie.openie import OpenIE
from comorag_tpu.llm.fake import FakeLLM
from comorag_tpu.memory.pool import MemoryNode, MemoryPool, NodeType
from comorag_tpu.models.hash_encoder import HashEncoder
from comorag_tpu.prompts.manager import PromptManager
from comorag_tpu.rerank import FactFilter


def test_prompt_catalog_renders():
    pm = PromptManager()
    names = set(pm.names())
    assert {
        "ner", "ner_query", "triple_extraction", "rag_qa_narrativeqa",
        "rag_qa_mc", "rag_qa_mc_memory", "memory_fusion", "node_fusion", "agent_probe",
    } <= names
    msgs = pm.render("ner", passage="Alice went to Paris.")
    assert msgs[-1]["content"] == "Alice went to Paris."
    qa = pm.render("rag_qa_narrativeqa", prompt_user="### Detail Chunks\nfoo\n\nQuestion: bar\nThought: ")
    assert qa[0]["role"] == "system" and "### Final Answer" in qa[0]["content"]
    probe = pm.render("agent_probe", query="q", context="c", previous_probes="")
    assert "probe_1" in probe[0]["content"]


def test_fake_llm_ner_and_triples():
    llm = FakeLLM()
    ie = OpenIE(llm)
    # the pseudo-NER only treats sentence-INITIAL capitals as entities when
    # they also appear capitalized mid-sentence (real-NER-like behavior)
    chunks = {"c1": "Cinderella lived with her Stepmother in the Kingdom. The Prince invited Cinderella to a Festival."}
    ners, triples = ie.batch_openie(chunks)
    assert "Cinderella" in ners["c1"].unique_entities
    assert "The" not in ners["c1"].unique_entities
    assert all(len(t) == 3 for t in triples["c1"].triples)
    assert len(triples["c1"].triples) > 0


def test_probe_agent_parses_json():
    agent = ProbeAgent(FakeLLM())
    probes = agent.find_probes("Where did Cinderella lose her Slipper?", context="ctx")
    assert 1 <= len(probes) <= 3
    assert all(isinstance(p, str) for p in probes)


def test_pool_agent_fusion_cues():
    agent = PoolAgent(FakeLLM())
    v, s, e = agent.fusion("who?", vers="Alpha did a thing. Beta saw it.", sems="", epis="Gamma timeline.")
    assert "Key Finding" in v
    assert s == ""  # empty layer skipped
    assert "Key Finding" in e


def test_memory_pool_dedup_and_similarity():
    enc = HashEncoder(dim=64)
    agent = PoolAgent(FakeLLM())
    pool = MemoryPool(encoder=enc, agent=agent)
    n1 = MemoryNode(probe="about the slipper", node_type=NodeType.VER,
                    original_content=["the slipper fit"], cue="slipper fits cinderella")
    n2 = MemoryNode(probe="about the ball", node_type=NodeType.SEM,
                    original_content=["the grand ball"], cue="prince hosts ball")
    pool.add_to_temp_pool(n1)
    pool.add_to_temp_pool(n2)
    pool.merge_temp_to_main()
    hashes = pool.get_all_hashes()
    assert len(hashes[NodeType.VER]) == 1 and len(hashes[NodeType.SEM]) == 1
    similar = pool.retrieve_similar_nodes("slipper fitting", top_percent=0.5)
    assert similar[0] is n1
    fused = pool.create_fusion_content("slipper fitting", top_k_percent=0.5)
    assert isinstance(fused, str) and fused
    pool.add_fused_node("slipper fitting", fused)
    assert len(pool.get_temp_nodes_by_type(NodeType.FUSION)) == 1


def test_fact_filter_roundtrip():
    llm = FakeLLM()
    filt = FactFilter(llm)
    candidates = [("cinderella", "lost", "slipper"), ("prince", "held", "festival")]
    idx, items, log = filt.rerank("who lost the slipper?", candidates, [10, 20], len_after_rerank=5)
    # FakeLLM echoes all candidates back
    assert idx == [10, 20]
    assert items == candidates


def test_fact_filter_rerank_batch_single_llm_call():
    """rerank_batch must reach the LLM as ONE batch_infer (the serving
    window and the offline engine coalesce it into shared device
    programs), never N sequential infer calls."""
    from comorag_tpu.llm.base import LLMResponse

    class SpyLLM:
        def __init__(self):
            self.infer_calls = 0
            self.batch_sizes = []

        def infer(self, messages, **kw):
            self.infer_calls += 1
            return LLMResponse(text='{"fact": []}')

        def batch_infer(self, batch, **kw):
            self.batch_sizes.append(len(batch))
            assert kw.get("max_completion_tokens") == 512
            return [
                LLMResponse(text='[[ ## fact_after_filter ## ]]\n{"fact": [["x","y","z"]]}')
                for _ in batch
            ]

    spy = SpyLLM()
    filt = FactFilter(spy)
    cands = [("x", "y", "z"), ("a", "b", "c")]
    out = filt.rerank_batch(["q1", "q2", "q3"], [cands] * 3, [[5, 6]] * 3, 2)
    assert spy.batch_sizes == [3] and spy.infer_calls == 0
    for idx, items, _ in out:
        assert idx == [5] and items == [("x", "y", "z")]


def test_fact_filter_parse_handles_prose():
    text = 'chatter\n[[ ## fact_after_filter ## ]]\n{"fact": [["a","b","c"]]}\n\n[[ ## completed ## ]]'
    assert FactFilter.parse_response(text) == [["a", "b", "c"]]
    assert FactFilter.parse_response("no sections here") == []


def test_qa_protocol_fake_llm():
    llm = FakeLLM()
    pm = PromptManager()
    prompt_user = (
        "### Detail Chunks\nThe golden slipper fit Cinderella perfectly and the prince rejoiced.\n\n"
        "Question: Whose foot did the golden slipper fit?\nThought: "
    )
    msgs = pm.render("rag_qa_narrativeqa", prompt_user=prompt_user)
    out = llm.infer(msgs).text
    assert "### Final Answer" in out
    answer = out.split("### Final Answer")[1].strip()
    assert "Cinderella" in answer or answer == "*"


def test_fact_filter_loads_dspy_prompt_file(tmp_path):
    """Golden test of the tuned-prompt loader against a fixture with the
    reference's on-disk shape ({"prog": {"system", "demos": [{question,
    fact_before_filter, fact_after_filter}]}} — rerank.py:100-122,
    prompts/dspy_prompts/filter_llama3.3-70B-Instruct.json)."""
    import json

    fixture = {
        "prog": {
            "lm": None,
            "traces": [],
            "train": [],
            "demos": [
                {
                    "augmented": True,
                    "question": "Did the Orion Ferry and the Kestrel Line both serve Port Alden?",
                    "fact_before_filter": json.dumps(
                        {"fact": [["orion ferry", "served", "port alden"],
                                   ["kestrel line", "served", "cape morrow"],
                                   ["port alden", "is a", "harbor town"]]}
                    ),
                    "fact_after_filter": json.dumps(
                        {"fact": [["orion ferry", "served", "port alden"],
                                   ["kestrel line", "served", "cape morrow"]]}
                    ),
                }
            ],
            "signature": {"instructions": "ignored by the loader", "fields": []},
            "system": "You filter candidate facts down to the ones relevant to the question.",
        }
    }
    path = tmp_path / "tuned.json"
    path.write_text(json.dumps(fixture))

    from comorag_tpu.llm.fake import FakeLLM

    filt = FactFilter(FakeLLM(), prompt_file=str(path))
    # system message taken from the file
    assert filt.message_template[0] == {
        "role": "system",
        "content": fixture["prog"]["system"],
    }
    # each demo expands to a user/assistant pair carrying its fields
    assert len(filt.message_template) == 3
    assert "Orion Ferry" in filt.message_template[1]["content"]
    assert "orion ferry" in filt.message_template[2]["content"]
    assert filt.message_template[2]["role"] == "assistant"

    # the loaded template still drives a full rerank round-trip
    candidates = [("orion ferry", "served", "port alden"), ("moss", "grew on", "stones")]
    idxs, items, log = filt.rerank("Which ferry served Port Alden?", candidates, [0, 1])
    assert isinstance(idxs, list) and isinstance(items, list)


def test_probe_agent_recovers_truncated_json():
    """A token-capped probe response (finish cut mid-string) must still
    yield the complete probes — extract_json_object repairs truncation
    (a capped response used to parse to None and the impasse round ran
    with zero probes)."""
    from comorag_tpu.agents.probe_agent import ProbeAgent
    from comorag_tpu.llm.base import LLMResponse

    class CappedLLM:
        def infer(self, messages, **kw):
            return LLMResponse(
                text='{"probe_1": "Find passages about Edith Marsh", "probe_2": "Find pass',
                metadata={"finish_reason": "length"},
            )

    probes = ProbeAgent(CappedLLM()).find_probes("Who directed the museum?")
    assert "Find passages about Edith Marsh" in probes
