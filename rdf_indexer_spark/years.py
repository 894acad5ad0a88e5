"""Date-label → year parsing and derived date fields (D-1..D-6).

Pure functions mirroring ``NinesStatementHandler.java:661-743,900-961``,
plus their distributed forms: an Arrow-batched pandas UDF for ``parse_years``
(its all-or-nothing failure mode doesn't decompose into array expressions)
and native Column expressions for the derived decade / quarter-century /
half-century / century fields (D-5).

Known reference test/impl divergence (documented in SURVEY.md §5.1): the
reference's own unit test expects ``parseYears("unknown") == ["Uncertain"]``
but its implementation returns ``[]`` — the "Uncertain" default moved to
document finalization (``NinesStatementHandler.java:874-879``). We follow the
implementation.
"""

from __future__ import annotations

import re

import pandas as pd

try:
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    HAVE_SPARK = True
except ImportError:  # pragma: no cover
    HAVE_SPARK = False

UNCERTAIN = "Uncertain"
_YEAR4_RE = re.compile(r"^\d{4}$")


def _enumerate_years(start_year: str, end_year: str) -> list[str]:
    """NinesStatementHandler.java:947-961 — start>=end yields just start."""
    y1, y2 = int(start_year), int(end_year)
    years = [start_year]
    if y2 <= y1:
        return years
    years.extend(str(i) for i in range(y1 + 1, y2 + 1))
    return years


def _parse_year_range(token: str) -> list[str] | None:
    """NinesStatementHandler.java:928-945 — 'a,b' with both ≥4 chars."""
    parts = token.split(",")
    if len(parts) != 2:
        return None
    start, finish = parts
    if len(start) >= 4 and len(finish) >= 4:
        return _enumerate_years(start[:4], finish[:4])
    return None


def _parse_year_wild(token: str) -> list[str]:
    """NinesStatementHandler.java:900-926 — expand '184u'→1840..1849,
    '18uu'→1800..1899 (pad width from the first 'u' position)."""
    years: list[str] = []
    num_length = min(len(token), 4)
    factor = 10 ** num_length
    for i in range(num_length):
        if token[i] == "u":
            pad = num_length - i
            years.extend(token[:i] + format(j, f"0{pad}d") for j in range(factor))
            break
        factor //= 10
    return years


def parse_years(value: str) -> list[str]:
    """Date label → list of 4-digit year strings (D-1), all-or-nothing.

    Mirrors ``NinesStatementHandler.java:661-704``: 'unknown'/'Uncertain' →
    []; ranges normalized (', '/' ,' → ','); whitespace-tokenized; a leading
    alphabetic character or a range+wildcard mix or a <4-char plain token
    aborts the whole parse (empty result)."""
    if value.strip().lower() in ("unknown", "uncertain"):
        return []
    value = value.replace(", ", ",").replace(" ,", ",")
    years: list[str] = []
    for token in value.split():
        has_range = "," in token
        has_wild = "u" in token
        if token[0].isalpha():
            return []
        if has_range and has_wild:
            return []
        if has_range:
            rng = _parse_year_range(token)
            if rng is None:
                # faithful quirk: a malformed range clears what accumulated
                # so far but does NOT abort the parse
                # (NinesStatementHandler.java:931-934,941-943)
                years.clear()
            else:
                years.extend(rng)
        elif has_wild:
            years.extend(_parse_year_wild(token))
        else:
            if len(token) >= 4:
                years.append(token[:4])
            else:
                return []
    return years


# ---------------------------------------------------------------------------
# D-5: derived date fields (only for \d{4} years; uniqueness handled by the
# caller via array_distinct / addFieldIfUnique semantics)
# ---------------------------------------------------------------------------

def make_decade(year: str) -> str:
    return year[:3] + "0"


def make_quarter_century(year: str) -> str:
    sub = int(year[2:4])
    quarter = "75" if sub >= 75 else "50" if sub >= 50 else "25" if sub >= 25 else "00"
    return year[:2] + quarter


def make_half_century(year: str) -> str:
    return year[:2] + ("50" if int(year[2:4]) >= 50 else "00")


def make_century(year: str) -> str:
    return year[:2] + "00"


def derived_date_fields(years: list[str]) -> dict[str, list[str]]:
    """decade/quarter_century/half_century/century with first-seen-order
    uniqueness (NinesStatementHandler.java:706-743 + addFieldIfUnique)."""
    out: dict[str, list[str]] = {
        "decade": [], "quarter_century": [], "half_century": [], "century": []
    }
    for year in years:
        if _YEAR4_RE.match(year):
            for field, val in (
                ("decade", make_decade(year)),
                ("quarter_century", make_quarter_century(year)),
                ("half_century", make_half_century(year)),
                ("century", make_century(year)),
            ):
                if val not in out[field]:
                    out[field].append(val)
    return out


if HAVE_SPARK:

    @pandas_udf(ArrayType(StringType()))
    def parse_years_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: parse_years(v) if v is not None else [])

    def decade_col(year: "Column") -> "Column":
        return F.concat(F.substring(year, 1, 3), F.lit("0"))

    def quarter_century_col(year: "Column") -> "Column":
        sub = F.substring(year, 3, 2).cast("int")
        q = (
            F.when(sub >= 75, "75")
            .when(sub >= 50, "50")
            .when(sub >= 25, "25")
            .otherwise("00")
        )
        return F.concat(F.substring(year, 1, 2), q)

    def half_century_col(year: "Column") -> "Column":
        sub = F.substring(year, 3, 2).cast("int")
        return F.concat(F.substring(year, 1, 2), F.when(sub >= 50, "50").otherwise("00"))

    def century_col(year: "Column") -> "Column":
        return F.concat(F.substring(year, 1, 2), F.lit("00"))
