"""Ontology-term lexicon: the engine's stand-in for the reference's ZOOMA
HTTP service + memo cache (SURVEY.md §2.1 S5, ontodiscover/ZoomaOntoTermDiscoverer).

The reference resolved each distinct property-value string through a remote
ontology-mapping service and memoized results in-process. At transcript
scale a network hop per distinct string is untenable; instead the term
dictionary is a *broadcast* structure:

- ``Lexicon`` — a small plain-Python object (compiled regex alternation +
  unit map) shipped to executors inside the pandas-UDF closure; compiled
  once per Arrow-batch iterator (iterator UDF form), so the regex build is
  amortized per task, not per batch.
- ``lexicon_df`` — the (match_norm, match_kind) → (term_id, pred, conf)
  expansion as a DataFrame for the broadcast hash join in operators/link.py
  (SURVEY.md §2.4 J2). For dictionaries larger than driver memory the same
  join degrades gracefully to sort-merge by dropping the broadcast hint.

Confidence semantics are frozen per FIXTURES.md §2: label exact → HIGH 1.0,
synonym exact → GOOD 0.9, all label tokens present → MEDIUM 0.7.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

CONF_LEVELS = {"label": ("HIGH", 1.0), "synonym": ("GOOD", 0.9), "tokens": ("MEDIUM", 0.7)}

_WS = re.compile(r"\s+")


def norm_surface(s: str) -> str:
    """Normalization used for memo-keying, mirroring the reference's
    trim+lowercase+whitespace-collapse (SURVEY.md §2.2 P1)."""
    return _WS.sub(" ", s.strip().lower())


@dataclass
class Lexicon:
    """Compiled broadcastable dictionary."""

    terms: list[dict]
    # surface(normalized) -> (term_id, match_kind)
    surface_map: dict[str, tuple[str, str]] = field(default_factory=dict)
    # unit synonym (normalized) -> canonical unit label ('kg' -> 'kilogram')
    unit_map: dict[str, str] = field(default_factory=dict)
    # term_ids never emitted as triples (units + context-only like 'age')
    non_emitting: set[str] = field(default_factory=set)
    # multi-token labels for the MEDIUM token-containment path
    token_labels: list[tuple[str, tuple[str, ...]]] = field(default_factory=list)
    _regex: re.Pattern | None = None

    def __post_init__(self) -> None:
        for t in self.terms:
            tid, pred = t["term_id"], t["pred"]
            label_n = norm_surface(t["label"])
            if pred == "(unit)":
                self.non_emitting.add(tid)
                for syn in {label_n, *map(norm_surface, t.get("synonyms", []))}:
                    self.unit_map[syn] = label_n
                continue
            if pred == "(context)":
                self.non_emitting.add(tid)
            # label wins over synonym on collision; first term wins ties
            # (term order in the JSON is the deterministic tie-break)
            for syn in map(norm_surface, t.get("synonyms", [])):
                self.surface_map.setdefault(syn, (tid, "synonym"))
            self.surface_map[label_n] = (tid, "label")
            toks = tuple(label_n.split(" "))
            if len(toks) >= 2:
                self.token_labels.append((tid, toks))

    def pattern(self) -> re.Pattern:
        """Alternation over every surface, longest-first (approximates
        leftmost-longest), word-boundary anchored, case-insensitive.
        Equivalent to an Aho-Corasick scan for this dictionary size; for
        >100k-surface dictionaries swap in a real trie automaton here —
        the call-sites only use .finditer()."""
        if self._regex is None:
            surfaces = sorted(self.surface_map, key=len, reverse=True)
            alts = "|".join(re.escape(s).replace(r"\ ", r"\s+") for s in surfaces)
            self._regex = re.compile(rf"(?<!\w)(?:{alts})(?!\w)", re.IGNORECASE)
        return self._regex

    _hint: re.Pattern | None = None
    _first_tok_index: dict | None = None
    _label_token_map: dict | None = None

    def label_token_map(self) -> dict[str, tuple]:
        """token → (term_ids of multi-token labels containing it). Lets the
        MEDIUM containment path check only *candidate* terms surfaced by
        the text's own tokens — O(text_tokens + candidates), not
        O(dictionary)."""
        if self._label_token_map is None:
            m: dict[str, list] = {}
            for tid, toks in self.token_labels:
                for t in toks:
                    m.setdefault(t, []).append((tid, toks))
            self._label_token_map = {k: tuple(v) for k, v in m.items()}
        return self._label_token_map

    def matcher_index(self) -> dict[str, list[tuple[tuple[str, ...], str]]]:
        """Token-indexed surface dictionary (the 'broadcast trie'):
        first-token → [(token_tuple, canonical_surface)] sorted longest
        first. Scanning is O(text_tokens + matches) and INDEPENDENT of
        dictionary size — a 10^6-surface ontology costs the same per byte
        as 14 terms, unlike a regex alternation which is
        O(alternatives × text). Used by operators/extract.py X5."""
        if self._first_tok_index is None:
            idx: dict[str, list[tuple[tuple[str, ...], str]]] = {}
            tok_re = re.compile(r"\w+")
            for surf in self.surface_map:
                toks = tuple(tok_re.findall(surf))
                if not toks:
                    continue
                idx.setdefault(toks[0], []).append((toks, surf))
            for v in idx.values():
                v.sort(key=lambda t: -len(t[0]))
            self._first_tok_index = idx
        return self._first_tok_index

    def token_hint(self) -> re.Pattern:
        """Cheap pre-filter for the MEDIUM token-containment path: fires
        only when some multi-token-label token occurs at all, so the
        per-text token-set build is skipped on ~all filler text."""
        if self._hint is None:
            toks = sorted({t for _, lt in self.token_labels for t in lt})
            self._hint = re.compile(
                r"(?<!\w)(?:" + "|".join(map(re.escape, toks)) + r")(?!\w)",
                re.IGNORECASE,
            )
        return self._hint

    def term_pred(self, term_id: str) -> str | None:
        for t in self.terms:
            if t["term_id"] == term_id:
                return t["pred"]
        return None


def load_lexicon(path: str) -> Lexicon:
    with open(path) as f:
        data = json.load(f)
    return Lexicon(terms=data["terms"])


def lexicon_df(spark: SparkSession, lex: Lexicon) -> DataFrame:
    """(match_norm, match_kind, term_id, pred, conf, confidence) rows for
    the broadcast link join. Includes the 'tokens' pseudo-surfaces (the
    normalized multi-token label) so MEDIUM mentions resolve on the same
    join keys."""
    rows = []
    pred_of = {t["term_id"]: t["pred"] for t in lex.terms}
    label_of = {t["term_id"]: norm_surface(t["label"]) for t in lex.terms}
    for surf, (tid, kind) in lex.surface_map.items():
        lvl, conf = CONF_LEVELS[kind]
        rows.append((surf, kind, tid, pred_of[tid], label_of[tid], conf, lvl))
    for tid, toks in lex.token_labels:
        lvl, conf = CONF_LEVELS["tokens"]
        rows.append((" ".join(toks), "tokens", tid, pred_of[tid], label_of[tid], conf, lvl))
    return spark.createDataFrame(
        rows,
        "match_norm string, match_kind string, term_id string, pred string, "
        "term_label string, conf double, confidence string",
    )
