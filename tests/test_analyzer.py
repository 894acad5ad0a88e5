"""T-1/T-2/T-3/T-5/T-11 unit + property tests, including the reference's
golden HTML cleaning pair (test_data/problematic_full_text_source.html)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_indexer_spark.analyzer import (
    clean_field_value, clean_html, clean_raw_text, normalize_whitespace,
    strip_escape_sequences, strip_unknown_utf8, tokenize, unescape_xml,
)

GOLDEN_HTML = "/root/reference/test_data/problematic_full_text_source.html"
GOLDEN_TXT = "/root/reference/test_data/problematic_full_text_source.html.txt"


def test_normalize_whitespace_basic():
    assert normalize_whitespace("a\tb") == "a b"
    assert normalize_whitespace("a  b   c") == "a b c"
    assert normalize_whitespace("a\n\n\nb") == "a\nb"
    assert normalize_whitespace("  a  \n   \n b ") == "a\nb"
    assert normalize_whitespace("") == ""
    assert normalize_whitespace("\n\n  \n") == ""


def test_strip_unknown_utf8():
    assert strip_unknown_utf8("a�b") == "ab"
    assert strip_unknown_utf8("abc") == "abc"


def test_unescape_xml():
    assert unescape_xml("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert unescape_xml("&#65;&#x42;") == "AB"
    assert unescape_xml("&unknown;") == "&unknown;"
    assert unescape_xml("&#8211;") == "–"


def test_strip_escape_sequences():
    # residual &#…; sequences (≤6 chars wide incl. delimiters) are removed
    cleaned, removed = strip_escape_sequences("a&amp;#99;b")
    assert cleaned == "ab"
    assert removed == ["&#99;"]
    # no closing ';' nearby → skipped
    cleaned, removed = strip_escape_sequences("a&amp;#999999 b")
    assert cleaned == "a&#999999 b"
    assert removed == []


def test_clean_html_inline_tags_vs_block_tags():
    assert clean_html("x<i>y</i>z") == "xyz"
    assert clean_html("x<b>y</b>z") == "xyz"
    assert clean_html("x<em>y</em>z") == "xyz"
    assert clean_html("x<p>y</p>z") == "x\ny\nz"
    assert clean_html("a<head>junk</head>b") == "a\nb"
    assert clean_html("a<script>var x;</script>b") == "a\nb"
    assert clean_html("a\r\nb") == "a\nb"
    assert clean_html("a&nbsp;b&#160;c") == "a b c"
    assert clean_html("a \nb") == "a\nb"


def test_golden_html_pair():
    """The reference's own golden input/output pair.

    The pair predates the escape-strip stage (the golden output keeps
    ``&gt;`` entities), so it pins the U+FFFD → html-strip → whitespace
    portion of the chain; the escape stage is covered separately."""
    with open(GOLDEN_HTML, encoding="utf-8", errors="replace") as f:
        raw = f.read()
    with open(GOLDEN_TXT, encoding="utf-8") as f:
        expected = f.read()
    got = normalize_whitespace(clean_html(strip_unknown_utf8(raw)))
    # Java String.trim() on the final result; the stored file has an extra
    # leading blank line + trailing newline from the file writer
    assert got == expected.strip("\n \t")


def test_clean_field_value_chain_order():
    # escapes → whitespace → U+FFFD (NinesStatementHandler.java:796-799);
    # the U+FFFD strip runs LAST, so its removal can leave double spaces.
    assert clean_field_value("a � b") == "a  b"
    assert clean_field_value("x&amp;y  z\t") == "x&y z"


def test_tokenize():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("foo_bar baz-qux 42") == ["foo_bar", "baz", "qux", "42"]
    assert tokenize("") == []
    assert tokenize("  ") == []


@given(st.text(alphabet=string.printable, max_size=200))
@settings(max_examples=200, deadline=None)
def test_normalize_whitespace_idempotent(s):
    once = normalize_whitespace(s)
    assert normalize_whitespace(once) == once


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_tokenize_total(s):
    toks = tokenize(s)
    assert all(t == t.lower() for t in toks)
    assert all(toks.count  is not None for _ in [0])  # no exception path


class TestSparkEquivalence:
    """Native Column expressions must equal the pure-Python ground truth."""

    def test_normalize_whitespace_col(self, spark):
        from pyspark.sql import functions as F

        from rdf_indexer_spark.analyzer import normalize_whitespace_col

        samples = [
            "a\tb", "a  b   c", "a\n\n\nb", "  a  \n   \n b ", "",
            "\n\n  \n", "x \n y\t\tz\n\n\nw", " lead", "trail ",
            "a\n \t \nb", "multi  space\tand\ttab",
        ]
        df = spark.createDataFrame([(s,) for s in samples], ["s"])
        got = [r[0] for r in df.select(normalize_whitespace_col(F.col("s"))).collect()]
        assert got == [normalize_whitespace(s) for s in samples]

    def test_tokenize_col(self, spark):
        from pyspark.sql import functions as F

        from rdf_indexer_spark.analyzer import tokenize_col, tokenize_udf

        samples = [
            "Hello, World!", "foo_bar baz-qux 42", "", "CaFÉ au_lait",
            "x" * 50 + " y z", "tabs\tand\nnewlines", "naïve café 名前 42",
        ]
        df = spark.createDataFrame([(s,) for s in samples], ["s"])
        native = [r[0] for r in df.select(tokenize_col(F.col("s"))).collect()]
        udf = [r[0] for r in df.select(tokenize_udf(F.col("s"))).collect()]
        pure = [tokenize(s) for s in samples]
        assert native == pure
        assert udf == pure

    def test_clean_field_value_col(self, spark):
        from pyspark.sql import functions as F

        from rdf_indexer_spark.analyzer import clean_field_value_col

        samples = [
            "plain value", "a � b", "x&amp;y  z\t", "a&#99;b",
            "  spaced  out  ", "multi\nline\n\nvalue",
        ]
        df = spark.createDataFrame([(s,) for s in samples], ["s"])
        got = [r[0] for r in df.select(clean_field_value_col(F.col("s"))).collect()]
        assert got == [clean_field_value(s) for s in samples]
