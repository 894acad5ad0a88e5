"""Lucene/Solr query-syntax parser for the index's search surfaces.

Grammar (the subset of Lucene classic syntax the engine can execute —
see ``IndexReader.search_lucene``):

    clause   := [+|-] ( '"' phrase '"' [~slop] | word ) [ ^boost ]
    word     := term | wildcard | term~[edits]
    query    := clause ( ws clause )*

* ``+`` = MUST, ``-`` = MUST_NOT, bare = SHOULD (Lucene default OR);
* ``"quoted words"`` = exact phrase (positional index required);
  ``"quoted words"~2`` = sloppy phrase — ordered near-match semantics,
  see ``IndexReader.search_phrase(slop=...)`` for the exact contract;
  ``-"quoted words"`` = prohibited phrase (docs containing the phrase
  are excluded; slop applies, boosts rejected — exclusions never score);
* ``wild*ard`` / ``wi?d`` = wildcard term (``*`` = any run, ``?`` = one
  char) — expanded against the term dictionary at search time (Lucene
  WildcardQuery under the SCORING_BOOLEAN_REWRITE, capped top-df);
* ``term~`` / ``term~1`` = fuzzy term within N Levenshtein edits
  (default 2, Lucene's FuzzyQuery default; max 2, Lucene's automaton
  limit). CLASSIC Levenshtein — a transposition costs 2 edits, unlike
  Lucene's default ``transpositions=true`` (documented deviation);
* ``^2.5`` = boost (scales the clause's idf contribution);
* plain clause text is run through the engine's pinned analyzer, so
  ``Foo-Bar`` tokenizes to two terms that inherit the clause's prefix and
  boost — the same thing Lucene's analyzer chain does to a multi-token
  clause. Wildcard/fuzzy terms are NOT analyzed beyond lowercasing
  (Lucene's classic parser does the same for multi-term queries); their
  literal characters must be single analyzer-token chars.

Unsupported Lucene syntax raises ``ValueError`` up front rather than
silently degrading: field prefixes (``title:x`` — the index has one text
field), range queries, explicit AND/OR/NOT connectives (use +/-
prefixes), fractional fuzzy similarity (``~0.8`` — removed in Lucene 4),
edit distances above 2, and all-wildcard patterns (``*`` — use a
match-all surface such as ``matched_docs``/``facet_browse`` instead).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analyzer import tokenize

__all__ = ["ParsedQuery", "parse_query", "wildcard_regex"]

_CLAUSE_RE = re.compile(
    r'([+-]?)'                       # prefix
    r'(?:"([^"]*)"(?:~(\d+))?'       # quoted phrase [+ slop]
    r'|([^\s"]+?))'                  # | bare word (may carry * ? ~)
    r'(?:\^(\d+(?:\.\d+)?))?'        # optional boost
    r'(?=\s|$)'
)
_RESERVED_RE = re.compile(r'(?:^|\s)(AND|OR|NOT)(?:\s|$)')
_FIELD_RE = re.compile(r'\w:')  # any token char before ':' = field syntax
# one analyzer token char (letters/digits/underscore, unicode)
_TOKEN_CHAR_RE = re.compile(r'\w', re.UNICODE)
_WILDCARD_BODY_RE = re.compile(r'[*?\w]+\Z', re.UNICODE)
_TERM_BODY_RE = re.compile(r'\w+\Z', re.UNICODE)


@dataclass
class ParsedQuery:
    must: list[tuple[str, float]] = field(default_factory=list)
    should: list[tuple[str, float]] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    # (tokens, required?, boost, slop) per positive quoted clause
    phrases: list[tuple[tuple[str, ...], bool, float, int]] = \
        field(default_factory=list)
    # (tokens, slop) per prohibited quoted clause (-"..."; boost is
    # meaningless on a non-scoring exclusion and rejected by the parser)
    not_phrases: list[tuple[tuple[str, ...], int]] = \
        field(default_factory=list)
    # (lowercased pattern, occur '+'/'-'/'', boost) per wildcard clause
    wildcards: list[tuple[str, str, float]] = field(default_factory=list)
    # (lowercased term, max_edits, occur, boost) per fuzzy clause
    fuzzies: list[tuple[str, int, str, float]] = field(default_factory=list)

    @property
    def boosts(self) -> dict[str, float]:
        return {t: b for t, b in [*self.must, *self.should] if b != 1.0}


def wildcard_regex(pattern: str) -> str:
    """Translate a (validated, lowercased) Lucene wildcard pattern into an
    anchored regex understood identically by Python ``re``, Java
    ``java.util.regex`` (Spark ``rlike``) and RE2 (the DuckDB oracle):
    ``*`` → ``.*``, ``?`` → ``.``, literals escaped. The parser guarantees
    literals are analyzer-token chars, so ``re.escape`` is a no-op and the
    emitted regex contains no engine-specific syntax."""
    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return "^" + "".join(parts) + "$"


def _parse_word(word: str, prefix: str, boost: float,
                out: ParsedQuery) -> None:
    """Classify one bare-word clause: wildcard, fuzzy, or plain term(s)."""
    if "*" in word or "?" in word:
        if "~" in word:
            raise ValueError(
                f"cannot combine wildcard and fuzzy in one clause: {word!r}")
        pat = word.lower()
        if not _WILDCARD_BODY_RE.fullmatch(pat):
            raise ValueError(
                f"wildcard pattern may contain only token characters and "
                f"*/?: {word!r}")
        if not _TOKEN_CHAR_RE.search(pat):
            raise ValueError(
                f"all-wildcard patterns are not supported: {word!r} — use "
                f"a match-all surface (matched_docs/facet_browse) instead")
        out.wildcards.append((pat, prefix, boost))
        return
    if "~" in word:
        term, _, edits_s = word.partition("~")
        if "~" in edits_s:
            raise ValueError(f"malformed fuzzy clause: {word!r}")
        if edits_s == "":
            edits = 2  # Lucene FuzzyQuery default
        elif re.fullmatch(r"\d+", edits_s):
            edits = int(edits_s)
            if edits > 2:
                raise ValueError(
                    f"fuzzy edit distance above 2 is not supported "
                    f"(Lucene's LevenshteinAutomata limit): {word!r}")
        else:
            raise ValueError(
                f"fractional fuzzy similarity was removed in Lucene 4; "
                f"use ~0, ~1 or ~2: {word!r}")
        term = term.lower()
        if not _TERM_BODY_RE.fullmatch(term):
            raise ValueError(
                f"fuzzy term must be a single analyzer token: {word!r}")
        if edits == 0:
            # ``term~0`` is the exact term (Lucene rewrites it the same way)
            _emit_terms(term, prefix, boost, out)
        else:
            out.fuzzies.append((term, edits, prefix, boost))
        return
    _emit_terms(word, prefix, boost, out)


def _emit_terms(text: str, prefix: str, boost: float,
                out: ParsedQuery) -> None:
    for tok in tokenize(text):
        if prefix == "+":
            out.must.append((tok, boost))
        elif prefix == "-":
            out.must_not.append(tok)
        else:
            out.should.append((tok, boost))


def parse_query(q: str) -> ParsedQuery:
    """Parse a Lucene-syntax query string into clause lists."""
    if _RESERVED_RE.search(q):
        raise ValueError(
            "AND/OR/NOT connectives are not supported — use +required / "
            "-prohibited prefixes (Lucene's own recommendation)")
    if _FIELD_RE.search(q):
        raise ValueError(
            "field prefixes (field:term) are not supported — the index "
            "has a single text field")
    if q.count('"') % 2:
        raise ValueError(f"unbalanced quote in query: {q!r}")
    out = ParsedQuery()
    for m in _CLAUSE_RE.finditer(q):
        prefix, phrase, slop_s, word, boost_s = m.groups()
        boost = float(boost_s) if boost_s else 1.0
        if phrase is not None:
            toks = tuple(tokenize(phrase))
            slop = int(slop_s) if slop_s else 0
            if prefix == "-":
                if boost_s is not None:
                    raise ValueError(
                        "a boost on a prohibited phrase is meaningless "
                        "(exclusions never score)")
                if toks:
                    out.not_phrases.append((toks, slop))
                continue
            if toks:
                out.phrases.append((toks, prefix == "+", boost, slop))
            continue
        _parse_word(word, prefix, boost, out)
    return out
