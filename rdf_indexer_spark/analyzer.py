"""Text analysis chain shared by the index build path and the query path.

The reference delegates tokenization to Solr, but every *character-level*
transform that feeds the analyzer is in-repo; rank identity depends on
replicating them exactly, in order:

* ``normalize_whitespace``   — reference ``TextUtils.java:14-27``  (T-1)
* ``strip_unknown_utf8``     — reference ``TextUtils.java:40-64``  (T-2)
* ``strip_escape_sequences`` — reference ``TextUtils.java:77-118`` (T-3)
* ``clean_html``             — reference ``RawTextCleaner.java:249-295`` (T-5)
* ``tokenize``               — the engine's pinned analyzer (T-11): lowercase +
  Unicode word-character runs (``[\\p{L}\\p{N}_]+``), the single function used
  by BOTH the posting builder and the query parser.

Each transform exists twice, verified equivalent by property tests:

1. a pure-Python reference implementation (ground truth, unit-testable), and
2. a distributed form — native Column expressions where the semantics allow
   (JVM-side, whole-stage codegen) or an Arrow-batched pandas UDF otherwise.
   Per-row Python UDFs are never used.
"""

from __future__ import annotations

import re

import pandas as pd

try:  # Spark is optional at import time so pure functions stay testable alone
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    HAVE_SPARK = True
except ImportError:  # pragma: no cover
    HAVE_SPARK = False

# ---------------------------------------------------------------------------
# T-11: tokenizer. Pinned analyzer for the whole engine. The same regex is
# used in three runtimes (they must stay in sync — see test_analyzer.py):
#   Python:  TOKEN_RE            (pandas UDF path, pure functions)
#   Spark:   TOKEN_REGEX_JVM     (java.util.regex in regexp_extract_all)
#   DuckDB:  TOKEN_REGEX_RE2     (RE2 in the correctness oracle)
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(r"[^\W]+", re.UNICODE)  # letters, digits, underscore
TOKEN_REGEX_JVM = r"[\p{L}\p{N}_]+"
TOKEN_REGEX_RE2 = r"[\p{L}\p{N}_]+"

_XML_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|apos|#[0-9]+|#[xX][0-9a-fA-F]+);")


def tokenize(text: str) -> list[str]:
    """Lowercase + split into Unicode word-character runs (T-11)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------------------
# T-1: whitespace normalization (TextUtils.normalizeWhitespace)
# ---------------------------------------------------------------------------

_JAVA_WS = "".join(chr(c) for c in range(0x21))  # Java String.trim(): chars <= U+0020


def _java_trim(s: str) -> str:
    """Java ``String.trim()`` — strips only code points <= U+0020.

    Python ``str.strip()`` also eats U+00A0 etc., which would diverge from
    the reference (golden pair keeps non-breaking-space lines)."""
    return s.strip(_JAVA_WS)


def normalize_whitespace(src: str) -> str:
    """Collapse runs of blank lines / spaces; trim every line; drop empties.

    Mirrors ``TextUtils.java:14-27``: collapse ``\\n+``, then per line map
    tabs to spaces, collapse space runs, Java-trim, drop empty lines, join
    with ``\\n``, Java-trim the result.
    """
    out = []
    for line in re.sub(r"\n+", "\n", src).split("\n"):
        line = _java_trim(re.sub(r" +", " ", line.replace("\t", " ")))
        if line:
            out.append(line)
    return _java_trim("\n".join(out))


def normalize_whitespace_col(col: "Column") -> "Column":
    """Native-expression form of T-1 (proved equivalent by unit tests).

    The per-line / whole-string trims replicate Java ``String.trim()``
    (code points <= U+0020 only, NOT Unicode whitespace)."""
    x = F.regexp_replace(col, r"\n+", "\n")
    x = F.regexp_replace(x, "\t", " ")
    x = F.regexp_replace(x, " +", " ")
    # per-line Java-trim (exclude \n itself from the class)
    x = F.regexp_replace(
        x, r"(?m)^[\x00-\x09\x0B-\x20]+|[\x00-\x09\x0B-\x20]+$", ""
    )
    x = F.regexp_replace(x, r"\n+", "\n")
    return F.regexp_replace(x, r"^[\x00-\x20]+|[\x00-\x20]+$", "")


# ---------------------------------------------------------------------------
# T-2: strip U+FFFD (TextUtils.stripUnknownUTF8); error positions separate
# ---------------------------------------------------------------------------

def strip_unknown_utf8(value: str) -> str:
    return value.replace("�", "")


def find_unknown_utf8(value: str) -> list[tuple[int, str]]:
    """(position, ±25-char snippet) per U+FFFD, as the reference logs them."""
    hits = []
    pos = value.find("�")
    while pos != -1:
        hits.append((pos, value[max(0, pos - 25): pos + 25]))
        pos = value.find("�", pos + 1)
    return hits


def strip_unknown_utf8_col(col: "Column") -> "Column":
    return F.regexp_replace(col, "�", "")


# ---------------------------------------------------------------------------
# T-3: XML unescape + invalid-escape removal (TextUtils.stripEscapeSequences)
# ---------------------------------------------------------------------------

def unescape_xml(src: str) -> str:
    """The five XML named entities + numeric character references.

    Mirrors commons-lang ``StringEscapeUtils.unescapeXml`` (the subset the
    reference relies on): named &amp; &lt; &gt; &quot; &apos; plus decimal
    ``&#dd;`` and hex ``&#xhh;`` references. Unknown entities pass through.
    """

    def repl(m: re.Match) -> str:
        body = m.group(1)
        if body in _XML_ENTITIES:
            return _XML_ENTITIES[body]
        try:
            cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
            return chr(cp)
        except (ValueError, OverflowError):
            return m.group(0)

    return _ENTITY_RE.sub(repl, src)


def strip_escape_sequences(src: str) -> tuple[str, list[str]]:
    """Unescape XML entities, then remove residual short ``&#…;`` runs.

    Returns (cleaned, [removed sequences]) — the reference logs each removed
    sequence as an error (``TextUtils.java:98-103``). A residual sequence is
    ``&#`` with a closing ``;`` within 6 chars of the ``&``; removal is global
    (the reference uses ``replaceAll`` — every occurrence of the same bad
    sequence goes at once).

    Deviation (documented): the reference passes the bad sequence to
    ``String.replaceAll`` as a *regex*; since ``&#…;`` contains no active
    metacharacters for the sequences that survive unescaping, literal removal
    is output-identical and is what we implement.
    """
    cleaned = unescape_xml(src)
    removed: list[str] = []
    start = 0
    while True:
        pos = cleaned.find("&#", start)
        if pos == -1:
            break
        end = cleaned.find(";", pos)
        if end == -1:
            start = pos + 2
        elif end <= pos + 6:
            bad = cleaned[pos: end + 1]
            cleaned = cleaned.replace(bad, "")
            removed.append(bad)
            start = pos
        else:
            start = pos + 2
    return cleaned, removed


# ---------------------------------------------------------------------------
# T-5: HTML strip (RawTextCleaner.cleanText)
# ---------------------------------------------------------------------------

def _remove_bracketed(text: str, left: str, right: str) -> str:
    """Left-to-right scan removing <...> regions (RawTextCleaner.java:272-291).

    Inline tags i/b/em vanish; any other tag becomes a newline. Iterative,
    not regex — unterminated brackets are left alone, like the reference.
    """
    out = []
    pos = 0
    while True:
        start = text.find(left, pos)
        if start == -1:
            out.append(text[pos:])
            break
        end = text.find(right, start)
        if end == -1:
            out.append(text[pos:])
            break
        tag = text[start + len(left): end]
        out.append(text[pos:start])
        if tag not in ("i", "/i", "b", "/b", "em", "/em"):
            out.append("\n")
        pos = end + len(right)
    return "".join(out)


def _remove_tag_block(text: str, tag: str) -> str:
    """Remove every <tag ...>...</tag> region (RawTextCleaner.removeTag)."""
    left, right = "<" + tag, "</" + tag + ">"
    out = []
    pos = 0
    while True:
        start = text.find(left, pos)
        if start == -1:
            out.append(text[pos:])
            break
        end = text.find(right, start)
        if end == -1:
            out.append(text[pos:])
            break
        out.append(text[pos:start])
        out.append("\n")
        pos = end + len(right)
    return "".join(out)


def clean_html(full_text: str) -> str:
    """Strip html-ish markup (T-5), replicating the reference order exactly:
    <head>…</head>, <script>…</script>, every <…>, \\r, &nbsp;/&#160;,
    then spaces adjacent to newlines."""
    t = _remove_tag_block(full_text, "head")
    t = _remove_tag_block(t, "script")
    t = _remove_bracketed(t, "<", ">")
    t = t.replace("\r", "")
    t = t.replace("&nbsp;", " ").replace("&#160;", " ")
    t = t.replace(" \n", "\n").replace("\n ", "\n")
    return t


# ---------------------------------------------------------------------------
# Field-value cleaning = the exact addFieldEntry chain
# (NinesStatementHandler.java:792-800): escapes → whitespace → U+FFFD
# ---------------------------------------------------------------------------

def clean_field_value(value: str) -> str:
    data, _ = strip_escape_sequences(value)
    data = normalize_whitespace(data)
    return strip_unknown_utf8(data)


def clean_field_value_errors(value: str) -> tuple[str, list[str]]:
    """The addFieldEntry chain WITH the reference's error messages.

    Escape removals log ``Removed potentially invalid escape sequece [..]``
    (TextUtils.java:101-102 — the "sequece" typo is the reference's,
    preserved for report parity); U+FFFD positions log
    ``Removed invalid UTF-8 character at position N of field text`` with the
    ±25-char snippet (TextUtils.java:56-61). Positions are measured after
    escape-strip + whitespace-normalize, matching the chain order at
    NinesStatementHandler.java:797-799."""
    msgs: list[str] = []
    data, removed = strip_escape_sequences(value)
    msgs.extend(
        f"Removed potentially invalid escape sequece [{bad}]" for bad in removed
    )
    data = normalize_whitespace(data)
    msgs.extend(
        f"Removed invalid UTF-8 character at position {pos} of field text"
        f"\n  Snippet: [{snip}]"
        for pos, snip in find_unknown_utf8(data)
    )
    return strip_unknown_utf8(data), msgs


def clean_raw_text(content: str, archive: str = "", custom_cleaner=None) -> str:
    """Full raw-text clean chain (RawTextCleaner.java:92-109, order exact):
    strip U+FFFD → optional custom cleaner → HTML strip → escapes → whitespace.
    """
    t = strip_unknown_utf8(content)
    if custom_cleaner is not None:
        t = custom_cleaner(archive, t)
    t = clean_html(t)
    t, _ = strip_escape_sequences(t)
    return normalize_whitespace(t)


# ---------------------------------------------------------------------------
# Distributed (vectorized) forms
# ---------------------------------------------------------------------------

if HAVE_SPARK:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def tokenize_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: tokenize(t) if t is not None else [])

    @pandas_udf(StringType())
    def clean_field_value_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: clean_field_value(v) if v is not None else None)

    @pandas_udf(StringType())
    def clean_raw_text_udf(content: pd.Series, archive: pd.Series) -> pd.Series:
        from .cleaners import clean_with_registry
        return pd.Series(
            [clean_raw_text(c, a, clean_with_registry) if c is not None else None
             for c, a in zip(content, archive)]
        )

    @pandas_udf(IntegerType())
    def token_count_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: len(tokenize(t)) if t is not None else 0)

    def tokenize_col(col: "Column") -> "Column":
        """JVM-native tokenizer (T-11) — stays inside whole-stage codegen.

        Equivalence with :func:`tokenize` is property-tested; the native form
        is preferred in the build path (no Python worker round-trip at all).
        """
        return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_REGEX_JVM), 0)

    def clean_field_value_col(col: "Column") -> "Column":
        """Hybrid field-clean: UDF only where '&' or U+FFFD is present.

        Metadata values rarely contain escapes, so the common case stays
        JVM-native (T-1 then T-2, preserving the reference's order: escapes →
        whitespace → U+FFFD); rows containing '&' take the exact Python chain
        via Arrow.
        """
        fast = strip_unknown_utf8_col(normalize_whitespace_col(col))
        return F.when(col.contains("&"), clean_field_value_udf(col)).otherwise(fast)

    _CLEAN_ERRS_TYPE = StructType([
        StructField("value", StringType()),
        StructField("errs", ArrayType(StringType())),
    ])

    @pandas_udf(_CLEAN_ERRS_TYPE)
    def clean_field_value_errors_udf(s: pd.Series) -> pd.DataFrame:
        vals, errs = [], []
        for v in s:
            if v is None:
                vals.append(None)
                errs.append([])
            else:
                c, m = clean_field_value_errors(v)
                vals.append(c)
                errs.append(m)
        return pd.DataFrame({"value": vals, "errs": errs})

    def clean_field_value_with_errors_col(col: "Column") -> "Column":
        """Like :func:`clean_field_value_col` but yielding
        ``struct(value, errs)`` so T-2/T-3 error rows reach the distributed
        error stream. The Arrow UDF runs only on rows that can possibly emit
        an error or need the escape chain ('&' or U+FFFD present); everything
        else takes the JVM-native fast path with an empty error array."""
        fast = F.struct(
            strip_unknown_utf8_col(normalize_whitespace_col(col)).alias("value"),
            F.array().cast("array<string>").alias("errs"),
        )
        needs_udf = col.contains("&") | col.contains("�")
        return F.when(needs_udf, clean_field_value_errors_udf(col)).otherwise(fast)
