"""Defensive JSON parsing for LLM output.

The framework treats LLM responses as untrusted text. This module provides:
  - ``repair_json``: close unbalanced braces/brackets after truncation
    (capability parity with llm_utils.py:146-215; own implementation).
  - ``extract_json_object`` / ``extract_json_array``: pull the first JSON
    value out of surrounding prose, *without* ``eval`` (the reference uses
    ``eval`` on model output — openie_openai.py:37,46; we never do).
  - ``filter_valid_triples``: keep unique, exactly-3-element triples
    (llm_utils.py:218-250 semantics).
"""

from __future__ import annotations

import json
from typing import Any, List, Optional


def repair_json(text: str) -> str:
    """Best-effort fix of truncated JSON: drop a trailing partial element
    after the last comma, then close any unbalanced brackets (string-aware)."""
    try:
        json.loads(text)
        return text
    except json.JSONDecodeError:
        pass

    last_comma = text.rfind(",")
    if last_comma != -1:
        text = text[:last_comma]

    stack: List[str] = []
    in_string = False
    escaped = False
    for ch in text:
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch in "{[":
            stack.append(ch)
        elif ch in "}]":
            if stack and ((ch == "}" and stack[-1] == "{") or (ch == "]" and stack[-1] == "[")):
                stack.pop()

    if in_string:
        text += '"'
    closers = {"{": "}", "[": "]"}
    for opener in reversed(stack):
        text += closers[opener]
    return text


def _scan_balanced(text: str, start: int) -> Optional[str]:
    """Return the balanced JSON substring starting at ``start`` or None."""
    opener = text[start]
    closer = {"{": "}", "[": "]"}[opener]
    depth = 0
    in_string = False
    escaped = False
    for i in range(start, len(text)):
        ch = text[i]
        if in_string:
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == '"':
                in_string = False
            continue
        if ch == '"':
            in_string = True
        elif ch == opener:
            depth += 1
        elif ch == closer:
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def _extract_first(text: str, opener: str) -> Optional[Any]:
    idx = 0
    while True:
        idx = text.find(opener, idx)
        if idx == -1:
            return None
        candidate = _scan_balanced(text, idx)
        if candidate is not None:
            for attempt in (candidate, repair_json(candidate)):
                try:
                    return json.loads(attempt)
                except json.JSONDecodeError:
                    continue
        idx += 1


def extract_json_object(text: str) -> Optional[dict]:
    """First parseable JSON object embedded in ``text`` (repairing if needed)."""
    obj = _extract_first(text, "{")
    return obj if isinstance(obj, dict) else None


def extract_json_array(text: str) -> Optional[list]:
    """First parseable JSON array embedded in ``text`` (repairing if needed)."""
    arr = _extract_first(text, "[")
    return arr if isinstance(arr, list) else None


def filter_valid_triples(triples: List[List[Any]]) -> List[List[str]]:
    """Keep unique triples with exactly three elements, order-preserving."""
    seen = set()
    out: List[List[str]] = []
    for t in triples:
        if not isinstance(t, (list, tuple)) or len(t) != 3:
            continue
        st = [str(x) for x in t]
        key = tuple(st)
        if key not in seen:
            seen.add(key)
            out.append(st)
    return out
