"""D-1..D-5 unit tests, porting NinesStatementHandlerTest.testYearParsing
(reference src/test/java/org/nines/NinesStatementHandlerTest.java:71-91)."""

from rdf_indexer_spark.years import (
    derived_date_fields, make_century, make_decade, make_half_century,
    make_quarter_century, parse_years,
)


def test_wildcard_expansion():
    years = parse_years("184u")
    assert len(years) == 10
    assert years[0] == "1840"
    assert years[9] == "1849"


def test_double_wildcard():
    years = parse_years("18uu")
    assert len(years) == 100
    assert years[0] == "1800"
    assert years[-1] == "1899"


def test_mixed_range_and_years():
    years = parse_years("1862-12-25,1864-01-01 1875 1954-10")
    assert years == ["1862", "1863", "1864", "1875", "1954"]


def test_unknown_and_uncertain():
    # Reference test/impl divergence (SURVEY.md §5.1): the JUnit tests expect
    # ["Uncertain"], but the shipped implementation returns [] and applies the
    # Uncertain default at document finalization. We follow the implementation.
    assert parse_years("unknown") == []
    assert parse_years("  Uncertain  ") == []


def test_leading_alpha_aborts():
    assert parse_years("Aug 1850") == []
    assert parse_years("1850 Aug") == []


def test_range_with_wildcard_forbidden():
    assert parse_years("184u,1850") == []


def test_short_token_aborts():
    assert parse_years("184") == []
    assert parse_years("1850 99") == []


def test_malformed_range_clears_but_continues():
    # Faithful quirk: NinesStatementHandler.java:931-934 clears accumulated
    # years on a bad range but keeps parsing later tokens.
    assert parse_years("1850 1,2,3 1860") == ["1860"]
    # a short range endpoint also clears; nothing follows → empty
    assert parse_years("1850 185,1860") == []


def test_range_start_after_end():
    assert parse_years("1864,1862") == ["1864"]
    assert parse_years("1850,1850") == ["1850"]


def test_plain_year_truncated_to_four():
    assert parse_years("1869-11-15") == ["1869"]


def test_bad_date_fixture_value():
    # test_data/bad_date.rdf: leading digit token parses, "November" aborts all
    assert parse_years("1869 November 15 (before 25 November)") == []


def test_derived_fields():
    assert make_decade("1874") == "1870"
    assert make_quarter_century("1874") == "1850"
    assert make_quarter_century("1875") == "1875"
    assert make_quarter_century("1824") == "1800"
    assert make_quarter_century("1825") == "1825"
    assert make_half_century("1849") == "1800"
    assert make_half_century("1850") == "1850"
    assert make_century("1874") == "1800"


def test_derived_unique_first_seen_order():
    d = derived_date_fields(["1840", "1841", "1850", "Uncertain"])
    assert d["decade"] == ["1840", "1850"]
    assert d["quarter_century"] == ["1825", "1850"]
    assert d["half_century"] == ["1800", "1850"]
    assert d["century"] == ["1800"]
