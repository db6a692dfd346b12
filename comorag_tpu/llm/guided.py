"""Guided-JSON decoding: JSON schema -> byte-level DFA -> token table.

TPU-native counterpart of the reference's vLLM guided decoding
(llm/vllm_offline.py:77-86 passes ``guided_json=PROMPT_JSON_TEMPLATE[...]``,
schemas at utils/llm_utils.py:253-322). There the constraint runs inside
vLLM's CUDA engine; here the schema is compiled ONCE on the host into a
dense int32 transition table ``[n_states, n_tokens]`` (-1 = forbidden) and
generation masks logits with two table lookups per step, entirely on
device (models/decoder.py:generate) — no per-step host round-trip, which
matters when every blocking sync costs ~30 ms through the remote tunnel.

Supported schema subset (covers every template the reference uses):
  - ``{"type": "object", "properties": {...}, "required": [...]}`` —
    emitted canonically: all declared properties, declaration order;
  - ``{"type": "array", "items": ...}`` with optional min/maxItems
    (equal min/max unrolls exactly, e.g. the triples' inner 3-arrays);
  - ``{"type": "string"}`` with optional minLength>=1 (maxLength is NOT
    enforced in-grammar — ``max_new_tokens`` bounds it; host-side schema
    validation stays advisory, as in the reference's repair path);
  - bare ``{"type": "object"}`` (the "json" template): a generic object
    machine, bounded nesting depth 3, values are strings / booleans /
    null / nested objects / arrays (numbers must be quoted).

The DFA is over BYTES (0..255) plus a virtual EOS symbol, so with the
byte-level tokenizer (llm/jax_offline.py) the token table IS the byte
table; for a sub-word tokenizer, ``make_token_table`` walks each token's
byte string through the DFA (product construction) so multi-byte tokens
are allowed iff their whole expansion is.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

_EOS_SYM = 256  # virtual end-of-sequence column in the byte DFA
_WS = b" \n\t"
# Single-byte (ASCII) string characters: 0x20..0x7E except '"' and '\'.
# Bytes >= 0x80 are NOT free-standing — string bodies run a precise UTF-8
# automaton (see _Builder.utf8_char), because a byte-capable vocab (llama
# byte-fallback, byte-level BPE singles, the hermetic ByteTokenizer) could
# otherwise be steered into emitting a lone continuation byte: byte-DFA-
# legal, but invalid UTF-8, so the "guided" JSON wouldn't parse. Caught by
# the r3 fuzz walk over a real BPE vocab.
_ASCII_BODY = bytes(c for c in range(0x20, 0x7F) if c not in (0x22, 0x5C))
_ESCAPABLE = b'"\\/bfnrt'

# Canonical guided-decoding schemas (same field names as the reference's
# PROMPT_JSON_TEMPLATE, utils/llm_utils.py:253-322 — the field names are
# the API contract the prompts and parsers rely on).
JSON_TEMPLATES: Dict[str, dict] = {
    "ner": {
        "type": "object",
        "properties": {"named_entities": {"type": "array", "items": {"type": "string"}}},
        "required": ["named_entities"],
    },
    "triples": {
        "type": "object",
        "properties": {
            "triples": {
                "type": "array",
                "items": {"type": "array", "items": {"type": "string"}, "minItems": 3, "maxItems": 3},
            }
        },
        "required": ["triples"],
    },
    "fact": {
        "type": "object",
        "properties": {
            "fact": {
                "type": "array",
                "items": {"type": "array", "items": {"type": "string"}, "minItems": 3, "maxItems": 3},
            }
        },
        "required": ["fact"],
    },
    "json": {"type": "object"},
    "qa_cot": {
        "type": "object",
        "properties": {
            "Thought": {"type": "string", "minLength": 1},
            "Answer": {"type": "string", "minLength": 1},
        },
        "required": ["Thought", "Answer"],
    },
}


class JsonDfa:
    """Byte-level DFA: ``table[state, byte] -> state`` (-1 forbidden).
    Column 256 is the virtual EOS symbol, legal only in the accept state."""

    def __init__(self, table: np.ndarray, accept_state: int):
        self.table = table
        self.accept_state = accept_state

    @property
    def n_states(self) -> int:
        return self.table.shape[0]

    def walk(self, data: bytes, state: int = 0) -> int:
        """Advance ``state`` over ``data``; returns -1 if rejected."""
        for byte in data:
            if state < 0:
                return -1
            state = int(self.table[state, byte])
        return state

    def accepts(self, data: bytes) -> bool:
        return self.walk(data) == self.accept_state


class _Builder:
    def __init__(self, whitespace: bool = False):
        self.trans: List[Dict[int, int]] = []
        self.whitespace = whitespace

    def state(self) -> int:
        self.trans.append({})
        return len(self.trans) - 1

    def add(self, s: int, symbols: Sequence[int], t: int) -> None:
        row = self.trans[s]
        for sym in symbols:
            existing = row.get(sym)
            if existing is not None and existing != t:
                raise ValueError(f"DFA conflict at state {s} on byte {sym}")
            row[sym] = t

    def ws_loop(self, s: int) -> None:
        # Whitespace self-loops are opt-in: canonical (no-whitespace) JSON
        # is the default generation grammar so a constrained model can
        # never burn its token budget idling on ws (and untrained/hermetic
        # models can't greedy-loop on '\n' forever).
        if self.whitespace:
            self.add(s, _WS, s)

    def utf8_char(self, s: int, t: int) -> None:
        """One string character ``s -> t``: ASCII body bytes directly, and
        the full well-formed-UTF-8 byte automaton (RFC 3629 table — E0/ED/
        F0/F4 lead bytes get their narrowed continuation ranges so
        overlongs and surrogates are unreachable)."""
        cont = range(0x80, 0xC0)
        self.add(s, _ASCII_BODY, t)
        c1 = self.state()
        self.add(c1, cont, t)
        c2 = self.state()
        self.add(c2, cont, c1)
        c3 = self.state()
        self.add(c3, cont, c2)
        self.add(s, range(0xC2, 0xE0), c1)
        e0 = self.state()
        self.add(e0, range(0xA0, 0xC0), c1)
        self.add(s, [0xE0], e0)
        self.add(s, [e for e in range(0xE1, 0xF0) if e != 0xED], c2)
        ed = self.state()
        self.add(ed, range(0x80, 0xA0), c1)
        self.add(s, [0xED], ed)
        f0 = self.state()
        self.add(f0, range(0x90, 0xC0), c2)
        self.add(s, [0xF0], f0)
        self.add(s, range(0xF1, 0xF4), c3)
        f4 = self.state()
        self.add(f4, range(0x80, 0x90), c2)
        self.add(s, [0xF4], f4)

    def copy_entry(self, src: int, onto: int) -> None:
        """Merge ``src``'s outgoing transitions onto another state (the
        DFA-composition substitute for an epsilon edge)."""
        for sym, t in self.trans[src].items():
            self.add(onto, [sym], t)

    # ---- fragments: each returns the state AFTER the construct ----------
    def literal(self, start: int, text: bytes) -> int:
        s = start
        for byte in text:
            nxt = self.state()
            self.add(s, [byte], nxt)
            s = nxt
        return s

    def string(self, start: int, min_length: int = 0) -> int:
        if min_length > 1:
            # same convention as array(): silently weakening a bound would
            # emit schema-violating output with no warning
            raise ValueError(
                f"guided JSON supports string minLength 0 or 1, got {min_length}"
            )
        in_str = self.state()
        end = self.state()
        esc = self.state()
        self.utf8_char(in_str, in_str)
        self.add(in_str, b"\\", esc)
        self.add(esc, _ESCAPABLE, in_str)
        self.add(in_str, b'"', end)
        if min_length == 0:
            self.add(start, b'"', in_str)
        else:
            # an extra first-char state with no closing-quote edge
            first = self.state()
            esc0 = self.state()
            self.add(start, b'"', first)
            self.utf8_char(first, in_str)
            self.add(first, b"\\", esc0)
            self.add(esc0, _ESCAPABLE, in_str)
        return end

    def array(self, start: int, item_schema: dict, min_items: int, max_items: Optional[int], depth: int) -> int:
        open_ = self.state()
        self.add(start, b"[", open_)
        self.ws_loop(open_)
        end = self.state()
        if max_items is not None and min_items == max_items:
            # exact count: unroll (e.g. the triples' inner 3-string arrays)
            s = open_
            for i in range(max_items):
                if i > 0:
                    comma = self.state()
                    self.add(s, b",", comma)
                    self.ws_loop(comma)
                    s = comma
                s = self.value(s, item_schema, depth)
                self.ws_loop(s)
            self.add(s, b"]", end)
            return end
        # unbounded (minItems 0): [ ] or [ item (, item)* ].  Other
        # min/max combinations are rejected loudly — silently dropping a
        # bound would emit schema-violating output with no warning.
        if min_items not in (0, None) or max_items is not None:
            raise ValueError(
                f"unsupported array bounds minItems={min_items} maxItems={max_items}: "
                "only exact counts (min==max) or unbounded (min 0) compile"
            )
        self.add(open_, b"]", end)
        after = self.value(open_, item_schema, depth)
        self.ws_loop(after)
        self.add(after, b"]", end)
        comma = self.state()
        self.add(after, b",", comma)
        self.ws_loop(comma)
        item_entry = self.state()
        after2 = self.value(item_entry, item_schema, depth)
        self.copy_entry(item_entry, comma)
        # close the loop: the second item's exit behaves like the first's
        self.ws_loop(after2)
        self.add(after2, b"]", end)
        self.add(after2, b",", comma)
        return end

    def fixed_object(self, start: int, properties: Dict[str, dict], depth: int) -> int:
        open_ = self.state()
        self.add(start, b"{", open_)
        self.ws_loop(open_)
        s = open_
        for i, (name, sub) in enumerate(properties.items()):
            if i > 0:
                comma = self.state()
                self.add(s, b",", comma)
                self.ws_loop(comma)
                s = comma
            s = self.literal(s, json.dumps(name).encode())
            self.ws_loop(s)
            colon = self.state()
            self.add(s, b":", colon)
            self.ws_loop(colon)
            s = self.value(colon, sub, depth)
            self.ws_loop(s)
        end = self.state()
        self.add(s, b"}", end)
        return end

    def generic_object(self, start: int, depth: int) -> int:
        """``{"key": value, ...}`` with arbitrary string keys; empty allowed."""
        open_ = self.state()
        self.add(start, b"{", open_)
        self.ws_loop(open_)
        end = self.state()
        self.add(open_, b"}", end)

        def pair(entry: int) -> int:
            after_key = self.string(entry)
            self.ws_loop(after_key)
            colon = self.state()
            self.add(after_key, b":", colon)
            self.ws_loop(colon)
            return self.generic_value(colon, depth - 1)

        after = pair(open_)
        self.ws_loop(after)
        self.add(after, b"}", end)
        comma = self.state()
        self.add(after, b",", comma)
        self.ws_loop(comma)
        entry2 = self.state()
        after2 = pair(entry2)
        self.copy_entry(entry2, comma)
        self.ws_loop(after2)
        self.add(after2, b"}", end)
        self.add(after2, b",", comma)
        return end

    def generic_value(self, start: int, depth: int) -> int:
        """string | true | false | null, plus nested object/array while
        ``depth`` allows. All alternatives converge on one exit state."""
        exit_ = self.state()

        def merge(frag_end: int) -> None:
            self.copy_entry(frag_end, exit_)
            self.trans[frag_end] = self.trans[exit_]  # alias ends together

        # alternatives start on distinct first bytes, so entry merging is safe
        str_end = self.string(start)
        for lit in (b"true", b"false", b"null"):
            merge(self.literal(start, lit))
        merge(str_end)
        if depth > 0:
            obj_end = self.generic_object(start, depth)
            merge(obj_end)
            arr_entry = self.state()
            arr_end = self.array(arr_entry, {"type": "__generic__", "__depth__": depth - 1}, 0, None, depth - 1)
            self.copy_entry(arr_entry, start)
            merge(arr_end)
        return exit_

    def value(self, start: int, schema: dict, depth: int) -> int:
        t = schema.get("type")
        if t == "string":
            return self.string(start, min_length=int(schema.get("minLength", 0) or 0))
        if t == "array":
            return self.array(
                start,
                schema.get("items", {"type": "string"}),
                int(schema.get("minItems", 0) or 0),
                schema.get("maxItems"),
                depth,
            )
        if t == "object":
            props = schema.get("properties")
            if props:
                return self.fixed_object(start, props, depth)
            return self.generic_object(start, depth=max(depth, 1))
        if t == "__generic__":
            return self.generic_value(start, int(schema.get("__depth__", 1)))
        raise ValueError(f"unsupported schema node: {schema!r}")


def compile_json_schema(schema: dict, max_depth: int = 3, whitespace: bool = False) -> JsonDfa:
    """Compile a schema (subset above) into a byte DFA whose accept state
    allows only EOS. ``whitespace=True`` additionally permits blanks at
    the structural positions (for *validating* pretty-printed JSON);
    generation uses the canonical no-whitespace grammar."""
    b = _Builder(whitespace=whitespace)
    start = b.state()
    b.ws_loop(start)
    end = b.value(start, schema, max_depth)
    b.ws_loop(end)
    b.add(end, [_EOS_SYM], end)
    table = np.full((len(b.trans), 257), -1, np.int32)
    for s, row in enumerate(b.trans):
        for sym, t in row.items():
            table[s, sym] = t
    return JsonDfa(table, accept_state=end)


def make_token_table(
    dfa: JsonDfa,
    token_bytes: Sequence[Optional[bytes]],
    eos_token_id: int,
    check_liveness: bool = True,
) -> np.ndarray:
    """Product of the byte DFA with a tokenizer: ``[n_states, n_tokens]``
    int32, entry = state after emitting that token (-1 forbidden). For a
    byte-level tokenizer this is (a permutation of) the byte table; for a
    sub-word vocab each token's full byte expansion is walked.

    ``check_liveness`` (on by default; ADVICE r2 #2): verifies at build
    time that (a) every state reachable from 0 by whole tokens allows at
    least one token — a dead state would mask ALL logits to -inf and
    silently emit token 0 off-grammar — and (b) the accept state (EOS) is
    reachable from every such state, so constrained generation can always
    terminate. Both fail loudly instead of at decode time."""
    n_states, n_tokens = dfa.n_states, len(token_bytes)
    table = np.full((n_states, n_tokens), -1, np.int32)
    for tok, data in enumerate(token_bytes):
        if tok == eos_token_id:
            table[dfa.accept_state, tok] = dfa.accept_state
            continue
        if not data:
            continue
        # walk every state once per token (vectorized over states)
        states = np.arange(n_states, dtype=np.int32)
        for byte in data:
            valid = states >= 0
            nxt = np.full_like(states, -1)
            nxt[valid] = dfa.table[states[valid], byte]
            states = nxt
        table[:, tok] = states
    if check_liveness:
        succ: Dict[int, set] = {}
        seen = {0}
        frontier = [0]
        while frontier:
            s = frontier.pop()
            row = table[s]
            nxt = set(np.unique(row[row >= 0]).tolist())
            if not nxt:
                raise ValueError(
                    f"guided decoding dead state {s}: no token in this "
                    f"{n_tokens}-entry vocab can continue the grammar "
                    "(token table over-constrained — check the tokenizer's "
                    "byte expansion)"
                )
            succ[s] = nxt
            for t in nxt:
                if t not in seen:
                    seen.add(t)
                    frontier.append(t)
        # co-reachability: accept must be reachable from every live state
        co = {dfa.accept_state}
        changed = True
        while changed:
            changed = False
            for s, nxt in succ.items():
                if s not in co and nxt & co:
                    co.add(s)
                    changed = True
        stuck = seen - co
        if stuck:
            raise ValueError(
                f"guided decoding: EOS unreachable from state(s) "
                f"{sorted(stuck)[:8]} — this vocab cannot close the "
                "grammar from there (generation would never terminate)"
            )
    return table
