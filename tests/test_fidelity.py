"""r2 fidelity items (VERDICT r1 #5): T-4 invalid-escape detector, T-2/T-3
distributed clean-error rows, J-5 mismatch message with byte dumps, T-10
safe_archive — each asserted against the reference's exact message formats.
"""

from pyspark.sql import functions as F

RDF_WRAP = (
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
    'xmlns:collex="http://www.collex.org/schema#" '
    'xmlns:dc="http://purl.org/dc/elements/1.1/" '
    'xmlns:role="http://www.loc.gov/loc.terms/relators/">{}</rdf:RDF>'
)


# ---------------------------------------------------------------------------
# T-4 — RdfDocumentParser.validateContent (java:115-130)
# ---------------------------------------------------------------------------

def test_find_invalid_escapes_positions_and_snippets():
    from rdf_indexer_spark.rdfxml import find_invalid_escapes

    #          0123456789...  after unescape "&amp;#38;" -> "&#38;" at pos 6
    content = "abcdef&amp;#38;ghij"
    errs = find_invalid_escapes(content, "f.rdf")
    assert len(errs) == 1
    e = errs[0]
    assert e["file"] == "f.rdf" and e["uri"] == ""
    # unescaped text is "abcdef&#38;ghij": "&#" at pos 6, snippet +-25 chars
    assert e["message"] == (
        "Potentially Invalid Escape sequence.\n   Position: [6]"
        "\n   Snippet: [abcdef&#38;ghij]"
    )


def test_find_invalid_escapes_scan_advance():
    from rdf_indexer_spark.rdfxml import find_invalid_escapes

    # two raw "&#" runs that survive unescaping (no valid entity form)
    errs = find_invalid_escapes("x&#zz y&#ww", "f.rdf")
    assert [int(e["message"].split("[")[1].split("]")[0]) for e in errs] == [1, 7]


def test_invalid_escape_reaches_distributed_error_stream(spark):
    from rdf_indexer_spark.fields import assemble_documents
    from rdf_indexer_spark.rdfxml import parse_files_df

    body = (
        '<collex:Document rdf:about="http://x/a">'
        "<dc:title>bad &amp;#38; title</dc:title>"
        "</collex:Document>"
    )
    files = spark.createDataFrame([("f.rdf", RDF_WRAP.format(body))],
                                  ["file", "content"])
    _, errors, _ = assemble_documents(parse_files_df(files))
    msgs = [r["message"] for r in errors.collect()]
    assert any(m.startswith("Potentially Invalid Escape sequence.") for m in msgs)


# ---------------------------------------------------------------------------
# T-2 / T-3 — TextUtils.stripUnknownUTF8 / stripEscapeSequences error rows
# ---------------------------------------------------------------------------

def test_clean_field_value_errors_messages():
    from rdf_indexer_spark.analyzer import clean_field_value_errors

    cleaned, msgs = clean_field_value_errors("a &#zq1; b � c")
    # escape strip -> "a  b � c", whitespace normalize -> "a b � c",
    # then U+FFFD strip -> "a b  c"
    assert cleaned == "a b  c"
    # reference's typo "sequece" preserved (TextUtils.java:101-102)
    assert msgs[0] == "Removed potentially invalid escape sequece [&#zq1;]"
    # U+FFFD position measured AFTER escape strip + whitespace normalize
    assert msgs[1] == (
        "Removed invalid UTF-8 character at position 4 of field text"
        "\n  Snippet: [a b � c]"
    )


def test_clean_errors_reach_distributed_stream(spark):
    from rdf_indexer_spark.fields import assemble_documents
    from rdf_indexer_spark.rdfxml import parse_files_df

    body = (
        '<collex:Document rdf:about="http://x/a">'
        "<dc:title>bad � title</dc:title>"
        "</collex:Document>"
    )
    files = spark.createDataFrame([("f.rdf", RDF_WRAP.format(body))],
                                  ["file", "content"])
    docs, errors, _ = assemble_documents(parse_files_df(files))
    msgs = [r["message"] for r in errors.collect()]
    assert any(
        m.startswith("Removed invalid UTF-8 character at position 4 of field text")
        and "Snippet: [bad � title]" in m
        for m in msgs
    ), msgs
    # and the stored value is stripped
    row = docs.collect()[0]
    assert row["fields"]["title"] == ["bad  title"]


# ---------------------------------------------------------------------------
# J-5 — RDFCompare.logMismatchedText / getBytesString (java:628-658)
# ---------------------------------------------------------------------------

def test_mismatch_message_exact_format():
    from rdf_indexer_spark.compare import mismatch_message

    new = "abcdefXYZ" + "x" * 100
    old = "abcdefQRS" + "x" * 100
    msg = mismatch_message("http://u/1", new, old)
    lines = msg.split("\n")
    # indexOfDifference = 6, backed up 4 -> pos 2; 51-char windows
    assert lines[0] == "==== http://u/1 mismatch at line 0 col 2:"
    assert lines[1] == f"(new {len(new)})"
    assert lines[2] == new[2:53]
    assert lines[3] == "-- vs --"
    assert lines[4] == f"(old {len(old)})"
    assert lines[5] == old[2:53]
    # decimal byte dump, space-separated, stops once > 45 chars
    assert lines[6].startswith("NEW: 99 100 101 102 88 89 90 ")  # c d e f X Y Z
    assert lines[7].startswith("OLD: 99 100 101 102 81 82 83 ")  # c d e f Q R S
    for ln in (lines[6], lines[7]):
        body = ln[5:]
        assert len(body) > 45                      # stopped after exceeding
        assert len(body) - len(body.split()[-1]) - 1 <= 45


def test_bytes_string_multibyte_and_cap():
    from rdf_indexer_spark.compare import _bytes_string

    assert _bytes_string("Aé") == "65 195 169 "    # UTF-8 of é = C3 A9
    long = _bytes_string("z" * 60)
    assert len(long) > 45 and len(long) <= 45 + len("122 ")


def test_compare_emits_byte_dump(spark):
    from rdf_indexer_spark.compare import compare_archives

    def _docs(rows):
        return spark.createDataFrame(rows, "file string, uri string, "
                                           "fields map<string,array<string>>")

    base = "shared prefix " * 10
    new = _docs([("f", "u1", {"text": [base + "ending one"]})])
    old = _docs([("f", "u1", {"text": [base + "ending two"]})])
    msgs = [r["message"]
            for r in compare_archives(new, old)["txt_errors"].collect()]
    assert len(msgs) == 1
    assert "NEW: " in msgs[0] and "OLD: " in msgs[0] and "-- vs --" in msgs[0]


# ---------------------------------------------------------------------------
# T-10 — RDFIndexerConfig.safeArchive / coreName (java:141-159)
# ---------------------------------------------------------------------------

def test_safe_archive_and_core_name(spark):
    from rdf_indexer_spark.fields import (
        archive_core_name, safe_archive, safe_archive_col,
    )

    assert safe_archive("a:b c,d") == "a_b_c_d"
    assert archive_core_name("rossetti") == "archive_rossetti"
    assert archive_core_name("pages_rossetti") == "pages_rossetti"
    got = (
        spark.createDataFrame([("a:b c,d",)], ["a"])
        .select(safe_archive_col(F.col("a")).alias("s")).collect()[0]["s"]
    )
    assert got == "a_b_c_d"


# ---------------------------------------------------------------------------
# J-7 — RDFCompare.validateRequiredFields (java:737-776), compare-side list
# ---------------------------------------------------------------------------

def test_compare_required_field_errors(spark):
    from rdf_indexer_spark.compare import required_field_errors

    docs = spark.createDataFrame(
        [
            ("u1", {  # complete doc: no errors
                "title_sort": ["t"], "title": ["t"], "genre": ["Poetry"],
                "archive": ["a"], "url": ["http://x"], "federation": ["NINES"],
                "year_sort": ["1850"], "year_sort_asc": ["1850"],
                "year_sort_desc": ["1850"], "freeculture": ["true"],
                "is_ocr": ["false"],
            }),
            ("u2", {"title": [""], "genre": ["x", ""]}),  # missing + empties
        ],
        "uri string, fields map<string,array<string>>",
    )
    got = {(r["uri"], r["message"]) for r in required_field_errors(docs).collect()}
    assert not any(u == "u1" for u, _ in got)
    assert ("u2", "required field: title_sort missing in new index") in got
    assert ("u2", "required ARR field: title is all spaces in new index") in got
    # concatenated non-empty values pass even with an empty member
    assert ("u2", "required ARR field: genre is all spaces in new index") not in got
    # pages list is the 3-field variant
    pg = {r["message"] for r in required_field_errors(
        spark.createDataFrame([("p1", {})],
                              "uri string, fields map<string,array<string>>"),
        is_pages=True).collect()}
    assert pg == {
        "required field: text missing in new index",
        "required field: page_num missing in new index",
        "required field: page_of missing in new index",
    }
