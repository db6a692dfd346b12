"""Hermetic rule-based fake LLM for tests and offline development.

Recognizes each of the framework's prompt protocols by their markers and
produces deterministic, well-formed responses, so the ENTIRE pipeline —
OpenIE, timeline, clustering summaries, QA loop, probes, fusion, rerank —
runs end-to-end with no server. This is the fake-backend leg of the test
strategy (SURVEY.md §4); the reference has no equivalent.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Optional

from comorag_tpu.llm.base import BaseLLM, LLMResponse, Messages


def _words(text: str) -> List[str]:
    return re.findall(r"[A-Za-z][A-Za-z0-9']+", text)


def _cap_entities(text: str, limit: int = 12) -> List[str]:
    """Deterministic pseudo-NER: capitalized non-initial words + leading
    words of sentences, deduped, order-preserving."""
    ents: List[str] = []
    seen = set()
    for m in re.finditer(r"\b([A-Z][a-z]+(?:\s[A-Z][a-z]+)?)\b", text):
        e = m.group(1)
        if e.lower() in {"the", "a", "an", "it", "he", "she", "they", "when", "then", "and", "but"}:
            continue
        if e not in seen:
            seen.add(e)
            ents.append(e)
        if len(ents) >= limit:
            break
    return ents


def _sentences(text: str) -> List[str]:
    return [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]


class FakeLLM(BaseLLM):
    """``qa_answer_fn(question, context) -> str | None`` lets tests script
    exact answers; everything else is handled by the default rules."""

    def __init__(self, qa_answer_fn: Optional[Callable[[str, str], Optional[str]]] = None):
        self.qa_answer_fn = qa_answer_fn
        self.calls: List[Dict] = []  # inspection hook for tests

    def infer(self, messages: Messages, **gen_kwargs) -> LLMResponse:
        system = next((m["content"] for m in messages if m["role"] == "system"), "")
        user = [m["content"] for m in messages if m["role"] == "user"][-1] if messages else ""
        text = self._respond(system, user)
        self.calls.append({"system": system[:80], "user": user[:120], "response": text[:120]})
        return LLMResponse(text=text, metadata={"prompt_tokens": 0, "completion_tokens": 0, "finish_reason": "stop"})

    # ------------------------------------------------------------------ rules
    def _respond(self, system: str, user: str) -> str:
        sys_lower = system.lower()

        # DSPy-style fact filter: echo every candidate fact back.
        if "fact_after_filter" in system or "fact_after_filter" in user:
            m = re.search(r"\[\[ ## fact_before_filter ## \]\]\s*\n(.*?)(?:\n\n|\Z)", user, re.DOTALL)
            facts = {"fact": []}
            if m:
                try:
                    facts = json.loads(m.group(1))
                except json.JSONDecodeError:
                    pass
            return f"[[ ## fact_after_filter ## ]]\n{json.dumps(facts)}\n\n[[ ## completed ## ]]"

        # Probe generation.
        if "retrieval probe" in sys_lower or "probe_1" in system:
            q = self._field(user, "Original Query")
            ents = _cap_entities(q or user, limit=3) or _words(q or user)[:3]
            probes = {f"probe_{i+1}": f"Find passages about {e}" for i, e in enumerate(ents[:3])}
            return json.dumps(probes)

        # NER (passage or query).
        if "named entities" in sys_lower or "entity extraction" in sys_lower:
            target = user
            qm = re.search(r"Question:\s*(.*)", user, re.DOTALL)
            if qm:
                target = qm.group(1)
            return json.dumps({"named_entities": _cap_entities(target)})

        # Triple extraction.
        if "rdf" in sys_lower or '"triples"' in system:
            passage = self._passage_block(user)
            ents = _cap_entities(passage)
            triples = []
            for i in range(len(ents) - 1):
                triples.append([ents[i], "relates to", ents[i + 1]])
            sents = _sentences(passage)
            if ents and sents:
                triples.append([ents[0], "appears in", sents[0][:40]])
            return json.dumps({"triples": triples})

        # Memory fusion -> key findings.
        if "key finding" in sys_lower:
            content = self._field(user, "Content") or user
            sents = _sentences(content)[:5]
            lines = [f"- Key Finding: {s[:200]}" for s in sents] or ["- Key Finding: no content provided"]
            return "\n".join(lines)

        # Node fusion -> synthesis paragraph.
        if "synthesis" in sys_lower or "previous analysis" in sys_lower:
            content = self._field(user, "Previous Analysis") or user
            return "Synthesis: " + " ".join(_sentences(content)[:3])[:500]

        # QA with the "### Final Answer" protocol.
        if "### final answer" in sys_lower or "final answer" in sys_lower:
            question = ""
            qm = re.search(r"Question:\s*(.*?)(?:\nThought:|\Z)", user, re.DOTALL)
            if qm:
                question = qm.group(1).strip()
            answer = None
            if self.qa_answer_fn is not None:
                answer = self.qa_answer_fn(question, user)
            if answer is None:
                answer = self._overlap_answer(question, user)
            return (
                "### Content Understanding\nThe context describes the story.\n\n"
                "### Relevant Information Analysis\n- considered the retrieved context\n\n"
                "### Key Facts\n- selected the best-supported answer\n\n"
                f"### Final Answer\n{answer}"
            )

        # Plain summarization.
        if "summary" in sys_lower or "summar" in user.lower()[:200]:
            body = re.sub(r"^.*?:", "", user, count=1, flags=re.DOTALL) if ":" in user[:120] else user
            sents = _sentences(body)
            return "Summary: " + " ".join(sents[:2])[:400]

        return "OK"

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _field(user: str, name: str) -> Optional[str]:
        m = re.search(rf"{name}:\s*\n?(.*?)(?:\n\n[A-Z][a-z]+ ?[A-Za-z]*:|\Z)", user, re.DOTALL)
        return m.group(1).strip() if m else None

    @staticmethod
    def _passage_block(user: str) -> str:
        m = re.search(r"```\n?(.*?)```", user, re.DOTALL)
        return m.group(1) if m else user

    @staticmethod
    def _overlap_answer(question: str, context: str) -> str:
        """Pick the context sentence with the highest word overlap with the
        question — a deterministic stand-in for extractive QA."""
        q_words = {w.lower() for w in _words(question)}
        best, best_score = "*", 0
        for s in _sentences(context):
            if s.startswith(("###", "-", "Question:")):
                continue
            overlap = len(q_words & {w.lower() for w in _words(s)})
            if overlap > best_score:
                best, best_score = s[:120], overlap
        return best if best_score >= 2 else "*"
