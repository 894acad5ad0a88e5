"""Row-level validation rules V-1..V-11 (reference ``ValidationUtility.java``).

Every rule produces error messages — documents are never dropped (the single
exception: pages docs with blank text lose the ``text`` field, V-8). The
whole rule set evaluates as ONE expression per document (an array of messages
built with ``array_compact``/``transform``), so validation is a narrow,
shuffle-free, whole-stage-codegen pass even at 10^12 rows.

Message strings replicate the reference exactly (golden-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ValidationUtility.java:31-37
GENRE_LIST = [
    "Bibliography", "Catalog", "Citation", "Collection", "Correspondence",
    "Criticism", "Drama", "Ephemera", "Fiction", "Historiography", "Law",
    "Life Writing", "Liturgy", "Music, Other", "Musical Analysis",
    "Musical Recording", "Musical Score", "Nonfiction", "Paratext",
    "Philosophy", "Photograph", "Poetry", "Religion", "Religion, Other",
    "Reference Works", "Review", "Scripture", "Sermon", "Translation",
    "Travel Writing", "Unspecified", "Visual Art",
]

# ValidationUtility.java:40-44
DISCIPLINE_LIST = [
    "Anthropology", "Archaeology", "Architecture", "Art History",
    "Book History", "Classics and Ancient History", "Film Studies",
    "Theater Studies", "Ethnic Studies", "Gender Studies", "Geography",
    "Philosophy", "History", "Science", "Law", "Literature", "Musicology",
    "Math", "Religious Studies", "Manuscript Studies",
]

# ValidationUtility.java:47-50
TYPE_LIST = [
    "Codex", "Collection", "Drawing", "Illustration", "Interactive Resource",
    "Manuscript", "Map", "Moving Image", "Periodical", "Physical Object",
    "Roll", "Sheet", "Sound", "Still Image", "Typescript",
]

# ValidationUtility.java:53-59 (field, rdf term) pairs
REQUIRED_FIELDS = [
    ("archive", "collex:archive"), ("title", "dc:title"), ("year", "dc:date"),
    ("doc_type", "dc:type"), ("genre", "collex:genre"),
    ("discipline", "collex:discipline"), ("freeculture", "collex:freeculture"),
    ("has_full_text", "collex:full_text"), ("is_ocr", "collex:is_ocr"),
    ("federation", "collex:federation"), ("url", "rdfs:seeAlso"),
]

REQUIRED_PAGE_FIELDS = [
    ("text", "collex:text"), ("page_of", "collex:pageof"),
    ("page_num", "collex:pagenum"),
]

# ValidationUtility.java:64-69 (46 codes; duplicates in the source kept once)
VALID_ROLES = [
    "role_ART", "role_AUT", "role_EDT", "role_PBL", "role_CRE", "role_BRD",
    "role_CNG", "role_CND", "role_DRT", "role_IVR", "role_IVE", "role_OWN",
    "role_FMO", "role_PRF", "role_PRO", "role_PRN", "role_EGR", "role_ETR",
    "role_TRL", "role_ARC", "role_BND", "role_BKD", "role_BKP", "role_CLL",
    "role_CTG", "role_COL", "role_CLR", "role_CWT", "role_COM", "role_CMT",
    "role_DUB", "role_FAC", "role_ILU", "role_ILL", "role_LTG", "role_PRT",
    "role_POP", "role_PRM", "role_RPS", "role_RBR", "role_SCR", "role_SCL",
    "role_TYD", "role_TYG", "role_WDE", "role_WDC",
]

_EMPTY_MSGS = "array<string>"


def _vals(key: str) -> Column:
    return F.element_at(F.col("fields"), F.lit(key))


def _messages_non_pages() -> Column:
    """validateObject for regular archives (ValidationUtility.java:74-80)."""
    m = F.col("fields")
    keys = F.map_keys(m)

    required = F.array_compact(F.array(*[
        F.when(
            _vals(f).isNull(),
            F.lit(f"object must contain the {term} field"),
        )
        for f, term in REQUIRED_FIELDS
    ]))

    archive = _vals("archive")
    exactly_one_archive = F.when(
        archive.isNull() | (F.size(archive) > 1),
        F.array(F.lit("must contain exactly one archive field")),
    ).otherwise(F.array().cast(_EMPTY_MSGS))

    def max_one(field: str) -> Column:
        v = _vals(field)
        joined = F.concat(F.concat_ws(";", v), F.lit(";"))
        return F.when(
            v.isNotNull() & (F.size(v) > 1),
            F.array(F.concat(
                F.lit(f"must not contain more than one {field} field:"), joined
            )),
        ).otherwise(F.array().cast(_EMPTY_MSGS))

    has_role = F.exists(keys, lambda k: k.startswith("role_"))
    role_required = F.when(
        ~has_role,
        F.array(F.lit("object must contain at least one role:XXX field")),
    ).otherwise(F.array().cast(_EMPTY_MSGS))

    def in_list(field: str, allowed: list[str], label: str) -> Column:
        v = F.coalesce(_vals(field), F.array().cast(_EMPTY_MSGS))
        return F.transform(
            F.filter(v, lambda x: ~x.isin(allowed)),
            lambda x: F.concat(x, F.lit(f" {label} not approved by ARC")),
        )

    invalid_roles = F.transform(
        F.filter(keys, lambda k: k.startswith("role_") & ~k.isin(VALID_ROLES)),
        lambda k: F.concat(F.lit("invalid role: "), k),
    )

    return F.concat(
        required, exactly_one_archive,
        max_one("title"), max_one("url"), max_one("thumbnail"),
        role_required,
        invalid_roles,
        in_list("genre", GENRE_LIST, "genre"),
        in_list("discipline", DISCIPLINE_LIST, "discipline"),
        in_list("doc_type", TYPE_LIST, "type"),
        _uri_messages(),
    )


def _uri_messages() -> Column:
    """V-7 (ValidationUtility.java:107-121)."""
    uri = _vals("uri")
    multi = F.when(
        F.size(uri) > 1, F.array(F.lit("must contain exactly one URI field"))
    ).otherwise(F.array().cast(_EMPTY_MSGS))
    bad_base = F.when(
        (F.size(uri) > 0) & F.element_at(uri, 1).startswith("http://foo/"),
        F.array(F.lit("URI field is not created properly")),
    ).otherwise(F.array().cast(_EMPTY_MSGS))
    return F.concat(multi, bad_base)


def _messages_pages() -> Column:
    """V-8 (ValidationUtility.java:139-156)."""
    required = F.array_compact(F.array(*[
        F.when(
            _vals(f).isNull(),
            F.lit(f"object must contain the {term} field"),
        )
        for f, term in REQUIRED_PAGE_FIELDS
    ]))
    text = _vals("text")
    blank = F.when(
        text.isNotNull() & (F.length(F.element_at(text, 1)) == 0),
        F.array(F.lit("Warning - collex:text is blank")),
    ).otherwise(F.array().cast(_EMPTY_MSGS))
    return F.concat(required, blank, _uri_messages())


def validate_documents(
    docs: DataFrame, *, is_pages: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Validate finalized documents → (docs', errors).

    Mutations mirrored from the reference: title/url/thumbnail truncated to
    one value (``ValidationUtility.java:123-134``); blank pages text removed
    (``:148-154``).
    """
    msgs = _messages_pages() if is_pages else _messages_non_pages()
    with_msgs = docs.withColumn("_messages", msgs)

    errors = with_msgs.select(
        "file", "uri", F.explode("_messages").alias("message")
    )

    if is_pages:
        fixed = F.map_filter(
            F.col("fields"),
            lambda k, v: ~((k == "text") & (F.length(F.element_at(v, 1)) == 0)),
        )
    else:
        fixed = F.transform_values(
            F.col("fields"),
            lambda k, v: F.when(
                k.isin("title", "url", "thumbnail") & (F.size(v) > 1),
                F.slice(v, 1, 1),
            ).otherwise(v),
        )
    cleaned = with_msgs.withColumn("fields", fixed).drop("_messages")
    return cleaned, errors


def archive_match_errors(docs: DataFrame, archive_name: str) -> DataFrame:
    """V-10 (RDFIndexer.java:410-421): doc archive must equal the configured
    archive."""
    archive = F.element_at(F.element_at(F.col("fields"), F.lit("archive")), 1)
    return docs.filter(
        archive.isNull() | (archive != F.lit(archive_name))
    ).select(
        "file", "uri",
        F.when(
            archive.isNull(),
            F.lit("Object has no archive field"),
        ).otherwise(
            F.concat(
                F.lit("Wrong archive found: "), archive,
                F.lit(". Expected: "), F.lit(archive_name),
            )
        ).alias("message"),
    )
