"""Golden end-to-end check against the reference's shipped error report
(``/root/reference/test_data/report.txt``, written by ErrorReport.java:41-52
as ``file\\turi\\tmessage`` lines, IndexerError.toString).

The shipped report predates two changes in the reference's CURRENT source,
so exact-line equality is asserted modulo two documented divergences:

1. nines:* predicates — report.txt has the older per-property message
   (``NINES does not support this property: ...#seeAlso``, only for
   unknown properties); the current source blanket-rejects EVERY nines:*
   predicate with ``NINES is no longer a valid attribute: <pred>``
   (NinesStatementHandler.java:103-106). We implement current source.
2. XML parse failure — report.txt carries Sesame's
   ``org.xml.sax.SAXParseException: Content is not allowed in prolog.``;
   our parser reports the same failure (same file, same uri, line 1 col 0)
   with its own message text.

Everything else is asserted byte-identical, tab-separated.
"""

import os

import pytest

REPORT = "/root/reference/test_data/report.txt"
FIXTURES = ("bad_date.rdf", "bad_nines_element.rdf", "invalid_xml.rdf")


@pytest.fixture(scope="module")
def engine_lines(spark):
    from rdf_indexer_spark.fields import assemble_documents
    from rdf_indexer_spark.rdfxml import parse_files_df

    rows = []
    for fn in FIXTURES:
        path = f"/root/reference/test_data/{fn}"
        with open(path, encoding="utf-8", errors="replace") as f:
            rows.append((fn, f.read()))
    files_df = spark.createDataFrame(rows, ["file", "content"])
    _, errors, _ = assemble_documents(parse_files_df(files_df), mode="TEST")
    return sorted(
        f'{r["file"]}\t{r["uri"]}\t{r["message"]}' for r in errors.collect()
    )


@pytest.fixture(scope="module")
def golden_lines():
    with open(REPORT, encoding="utf-8") as f:
        return sorted(ln.rstrip("\r\n") for ln in f if ln.strip())


def test_report_exists():
    assert os.path.exists(REPORT)


def test_stable_golden_lines_byte_identical(engine_lines, golden_lines):
    """Lines untouched by the two documented source changes must match
    byte-for-byte in IndexerError format."""
    stable = [
        ln for ln in golden_lines
        if "NINES does not support" not in ln and "SAXParseException" not in ln
    ]
    assert stable == [
        "bad_date.rdf\thttp://www.patacriticism.org/test/bad_nines_element"
        "\tInvalid date format: 1869 November 15 (before 25 November)",
        "invalid_xml.rdf\t\tNo objects in this file.",
    ]
    for ln in stable:
        assert ln in engine_lines, f"missing golden line: {ln!r}"


def test_diverged_lines_map_to_current_source(engine_lines, golden_lines):
    """Each stale golden line must be covered by the current-source
    equivalent from our engine (same file, same uri, modern message)."""
    # report.txt: NINES does not support ...#seeAlso  (old message) →
    # current source: blanket 'no longer a valid attribute' for seeAlso
    assert (
        "bad_nines_element.rdf\thttp://www.patacriticism.org/test/bad_nines_element"
        "\tNINES is no longer a valid attribute: http://www.nines.org/schema#seeAlso"
    ) in engine_lines
    # report.txt: SAXParseException in prolog → same failure, our parser text
    sax = [ln for ln in engine_lines
           if ln.startswith("invalid_xml.rdf\t\tFATAL PARSE ERROR at line 1")]
    assert sax, engine_lines


def test_no_unexplained_extra_error_families(engine_lines):
    """Every engine error line belongs to a family the current reference
    source emits for these fixtures (no invented error types)."""
    allowed_prefixes = (
        "NINES is no longer a valid attribute: ",   # NinesStatementHandler:104
        "Invalid date format: ",                    # date parsing
        "No objects in this file.",                 # RDFIndexer empty-file
        "FATAL PARSE ERROR at line ",               # parse listener
        "Potentially Invalid Escape sequence.",     # RdfDocumentParser:115-130
        "Removed potentially invalid escape sequece [",  # TextUtils:101
        "Removed invalid UTF-8 character at position ",  # TextUtils:56
        "Duplicate URI",                            # NinesStatementHandler:89
    )
    for ln in engine_lines:
        msg = ln.split("\t", 2)[2]
        assert msg.startswith(allowed_prefixes), ln
