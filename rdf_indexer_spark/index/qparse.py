"""Lucene/Solr query-syntax parser for the index's search surfaces.

Grammar (the subset of Lucene classic syntax the engine can execute —
see ``IndexReader.search_lucene``):

    clause   := [+|-] ( '"' phrase '"' | word ) [ ^boost ]
    query    := clause ( ws clause )*

* ``+`` = MUST, ``-`` = MUST_NOT, bare = SHOULD (Lucene default OR);
* ``"quoted words"`` = exact phrase (positional index required);
* ``^2.5`` = boost (scales the clause's idf contribution);
* clause text is run through the engine's pinned analyzer, so ``Foo-Bar``
  tokenizes to two terms that inherit the clause's prefix and boost —
  the same thing Lucene's analyzer chain does to a multi-token clause.

Unsupported Lucene syntax raises ``ValueError`` up front rather than
silently degrading: field prefixes (``title:x`` — the index has one text
field), range queries, wildcards/fuzzy (``*``, ``~``), and explicit
AND/OR/NOT connectives (use +/- prefixes).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analyzer import tokenize

__all__ = ["ParsedQuery", "parse_query"]

_CLAUSE_RE = re.compile(
    r'([+-]?)'                       # prefix
    r'(?:"([^"]*)"|([^\s"]+?))'      # quoted phrase | bare word
    r'(?:\^(\d+(?:\.\d+)?))?'        # optional boost
    r'(?=\s|$)'
)
_RESERVED_RE = re.compile(r'(?:^|\s)(AND|OR|NOT)(?:\s|$)')
_UNSUPPORTED_RE = re.compile(r'[*?~]|(?<!\s)\w:')


@dataclass
class ParsedQuery:
    must: list[tuple[str, float]] = field(default_factory=list)
    should: list[tuple[str, float]] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # (tokens, required?, boost) per quoted clause
    phrases: list[tuple[tuple[str, ...], bool, float]] = \
        field(default_factory=list)

    @property
    def boosts(self) -> dict[str, float]:
        return {t: b for t, b in [*self.must, *self.should] if b != 1.0}


def parse_query(q: str) -> ParsedQuery:
    """Parse a Lucene-syntax query string into clause lists."""
    if _RESERVED_RE.search(q):
        raise ValueError(
            "AND/OR/NOT connectives are not supported — use +required / "
            "-prohibited prefixes (Lucene's own recommendation)")
    if _UNSUPPORTED_RE.search(q):
        raise ValueError(
            "unsupported Lucene syntax (field:, wildcard, fuzzy); "
            "only +/-, \"phrases\" and ^boosts are recognized")
    if q.count('"') % 2:
        raise ValueError(f"unbalanced quote in query: {q!r}")
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q):
        prefix, phrase, word, boost_s = m.groups()
        boost = float(boost_s) if boost_s else 1.0
        if phrase is not None:
            if prefix == "-":
                raise ValueError(
                    "prohibited phrases (-\"...\") are not supported")
            toks = tuple(tokenize(phrase))
            if toks:
                out.phrases.append((toks, prefix == "+", boost))
            continue
        for tok in tokenize(word):
            if prefix == "+":
                out.must.append((tok, boost))
            elif prefix == "-":
                out.must_not.append(tok)
            else:
                out.should.append((tok, boost))
    return out
