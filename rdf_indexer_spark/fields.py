"""Triple stream → multi-valued field documents (SURVEY.md §2.B/C/D).

The reference folds a SAX triple stream into ``uri → {field → [values]}``
maps with a 30-way predicate dispatch (``NinesStatementHandler.java:122-188``)
plus per-field transforms. Here the whole family is ONE declarative pass:

  triples → (route predicates via a when-chain) → field entries
          → (dates explode via the parse_years UDF, D-1..D-5)
          → (clean values, T-1/T-2/T-3)
          → groupBy(file, subject) → map<field, array<value>>   (F-2)
          → finalization (G-1..G-4)

Ordering is carried explicitly in a sort key derived from statement position —
first/last-value semantics (F-9, G-1, G-2) never rely on shuffle order.

Outputs: (documents, errors, links). Documents are
``(file, uri, fields: map<string, array<string>>)``; errors are
``(file, uri, message)`` in the reference's report format
(``IndexerError.java:27-29``); links mirror the LinkCollector sink (A-14,
``LinkCollector.java:40-52``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .analyzer import clean_field_value_col
from .years import (
    century_col, decade_col, half_century_col, parse_years_udf,
    quarter_century_col,
)

COLLEX = "http://www.collex.org/schema#"
NINES = "http://www.nines.org/schema#"
DC = "http://purl.org/dc/elements/1.1/"
DCTERMS = "http://purl.org/dc/terms/"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_VALUE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#value"
ROLE_PREFIX = "http://www.loc.gov/loc.terms/relators/"

# The 16 collex attributes the dispatcher accepts
# (NinesStatementHandler.java:108-120).
COLLEX_ALLOWED = [
    "archive", "freeculture", "source_xml", "source_html", "source_sgml",
    "federation", "ocr", "genre", "thumbnail", "text", "fulltext", "image",
    "pages", "pagenum", "pageof", "discipline", "typewright",
]

FEDERATIONS = ["NINES", "18thConnect", "MESA", "ModNets", "SiRO", "estc", "GLA"]

# Plain predicate → field copies (F-5); each arm cited in SURVEY.md §2.B.
SIMPLE_FIELDS = {
    COLLEX + "federation": "federation",      # gated by FEDERATIONS below
    COLLEX + "person": "person",
    DC + "format": "format",
    DC + "language": "language",
    COLLEX + "geospacial": "geospacial",
    COLLEX + "source_xml": "source_xml",
    COLLEX + "source_html": "source_html",
    COLLEX + "source_sgml": "source_sgml",
    COLLEX + "archive": "archive",
    COLLEX + "pageof": "page_of",
    COLLEX + "pagenum": "page_num",
    DC + "title": "title",
    DC + "provenance": "provenance",
    DC + "type": "doc_type",
    COLLEX + "discipline": "discipline",
    DC + "subject": "subject",
    DCTERMS + "alternative": "alternative",
    COLLEX + "genre": "genre",                # deprecated values filtered (F-8)
    DC + "source": "source",
    COLLEX + "thumbnail": "thumbnail",
    COLLEX + "image": "image",
    RDFS + "seeAlso": "url",
    DCTERMS + "hasPart": "hasPart",
    DCTERMS + "isPartOf": "isPartOf",
}

# Fields whose values are collected with addField (and therefore feed the
# link collector when http-ish, NinesStatementHandler.java:752-755).
_NO_LINK_FIELDS = ("uri", "text", "text_url", "freeculture", "has_pages")

# Sort-key stride: one routed statement can fan out into many entries
# (exploded years and their derived fields) that must order after the
# statement but before the next one.
_STRIDE = 1_000_000


def _http_ish(col: Column) -> Column:
    """F-12: trimmed value starts with http:// and contains no spaces."""
    t = F.trim(col)
    return t.startswith("http://") & ~t.contains(" ")


def _skey(pos: Column, idx: Column | None = None) -> Column:
    base = pos.cast("long") * _STRIDE
    return base if idx is None else base + idx


def route_triples(
    triples: DataFrame,
    *,
    is_pages: bool = False,
    mode: str = "TEST",
    fulltext_df: DataFrame | None = None,
    corrected_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Predicate dispatch: triples → (entries, errors, links).

    ``entries`` is the long-form field stream
    ``(file, subject, field, value, skey, clean, unique, replace)``.
    """
    t = triples
    is_lit = F.col("is_literal")
    pred = F.col("predicate")
    obj = F.col("object")

    # F-1: blank-object filter (blank collex:text allowed in pages archives)
    blank_ok = (F.length(obj) > 0)
    if is_pages:
        blank_ok = blank_ok | (pred == COLLEX + "text")
    t = t.filter(obj.isNotNull() & blank_ok)

    # ---- error streams from the dispatcher ------------------------------
    # F-3: nines:* rejection. Message text matches the current reference
    # implementation (NinesStatementHandler.java:104).
    nines_errors = t.filter(pred.startswith(NINES)).select(
        "file",
        F.col("doc_uri").alias("uri"),
        F.concat(F.lit("NINES is no longer a valid attribute: "), pred).alias("message"),
    )
    collex_attr = F.substring(pred, len(COLLEX) + 1, 10_000)
    collex_errors = t.filter(
        pred.startswith(COLLEX) & ~collex_attr.isin(COLLEX_ALLOWED)
    ).select(
        "file",
        F.col("doc_uri").alias("uri"),
        F.concat(F.lit("Collex does not support this property: "), pred).alias("message"),
    )
    fed_errors = t.filter(
        (pred == COLLEX + "federation") & ~obj.isin(FEDERATIONS)
    ).select(
        "file",
        F.col("doc_uri").alias("uri"),
        F.concat(F.lit("Unknown federation: "), obj).alias("message"),
    )

    # drop rejected predicates from the routing stream
    t = t.filter(
        ~pred.startswith(NINES)
        & ~(pred.startswith(COLLEX) & ~collex_attr.isin(COLLEX_ALLOWED))
    )

    # ---- simple copies (F-5) + whitelists -------------------------------
    field_map = F.create_map(
        *[F.lit(x) for kv in SIMPLE_FIELDS.items() for x in kv]
    )
    simple = (
        t.withColumn("field", F.element_at(field_map, pred))
        .filter(F.col("field").isNotNull())
        # F-6 federation whitelist / F-8 deprecated-genre filter
        .filter(~((F.col("field") == "federation") & ~obj.isin(FEDERATIONS)))
        .filter(~((F.col("field") == "genre") & obj.isin("Primary", "Secondary")))
        .select(
            "file", "subject", "field", obj.alias("value"),
            _skey(F.col("pos")).alias("skey"),
            F.lit(True).alias("clean"), F.lit(False).alias("unique"),
            F.lit(False).alias("replace"),
        )
    )

    # F-9: first title also feeds title_sort
    w_first = F.row_number().over(
        Window.partitionBy("file", "subject").orderBy("skey")
    )
    title_sort = (
        simple.filter(F.col("field") == "title")
        .withColumn("rn", w_first)
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("field", F.lit("title_sort"))
        .withColumn("skey", F.col("skey") + 1)
    )

    # F-7: boolean flag encoders (asymmetric, NinesStatementHandler.java:204-343)
    lower_obj = F.lower(obj)
    ocr = t.filter((pred == COLLEX + "ocr") & (lower_obj == "true")).select(
        "file", "subject", F.lit("is_ocr").alias("field"), F.lit("T").alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )
    typewright = t.filter((pred == COLLEX + "typewright") & (lower_obj == "true")).select(
        "file", "subject", F.lit("typewright").alias("field"), F.lit("T").alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )
    freeculture = t.filter(
        (pred == COLLEX + "freeculture") & lower_obj.isin("true", "false")
    ).select(
        "file", "subject", F.lit("freeculture").alias("field"),
        F.when(lower_obj == "true", "T").otherwise("F").alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(True).alias("replace"),
    )
    has_pages = t.filter(
        (pred == COLLEX + "pages") & lower_obj.isin("true", "false")
    ).select(
        "file", "subject", F.lit("has_pages").alias("field"),
        F.when(lower_obj == "true", "T").otherwise("F").alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(True).alias("replace"),
    )

    # F-10: MARC relator roles → role_XXX + role list
    roles_t = t.filter(pred.startswith(ROLE_PREFIX))
    role_code = F.concat(F.lit("role_"), F.substring(pred, len(ROLE_PREFIX) + 1, 10_000))
    role_vals = roles_t.select(
        "file", "subject", role_code.alias("field"), obj.alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )
    role_list = roles_t.select(
        "file", "subject", F.lit("role").alias("field"), role_code.alias("value"),
        (_skey(F.col("pos")) + 1).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )

    # ---- dates (D-1..D-5); dc:date bnodes already rewritten upstream ----
    date_values = t.filter(
        ((pred == DC + "date") & is_lit) | (pred == "engine:date_value")
    ).select("file", "subject", F.col("doc_uri"), F.trim(obj).alias("raw"), "pos")
    date_label = t.filter(
        ((pred == DC + "date") & is_lit) | (pred == "engine:date_label")
    ).select(
        "file", "subject", F.lit("date_label").alias("field"),
        F.trim(obj).alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )
    parsed = date_values.withColumn("years", parse_years_udf(F.col("raw")))
    date_errors = parsed.filter(F.size("years") == 0).select(
        "file",
        F.col("doc_uri").alias("uri"),
        F.concat(F.lit("Invalid date format: "), F.col("raw")).alias("message"),
    )
    yr = parsed.filter(F.size("years") > 0).select(
        "file", "subject", "pos",
        F.posexplode("years").alias("idx", "year"),
    )
    year_entries = yr.select(
        "file", "subject", F.lit("year").alias("field"), F.col("year").alias("value"),
        _skey(F.col("pos"), F.col("idx") * 5).alias("skey"),
        F.lit(True).alias("clean"), F.lit(True).alias("unique"),
        F.lit(False).alias("replace"),
    )
    valid_year = yr.filter(F.col("year").rlike(r"^\d{4}$"))
    derived = None
    for off, (fname, expr) in enumerate([
        ("decade", decade_col(F.col("year"))),
        ("quarter_century", quarter_century_col(F.col("year"))),
        ("half_century", half_century_col(F.col("year"))),
        ("century", century_col(F.col("year"))),
    ], start=1):
        d = valid_year.select(
            "file", "subject", F.lit(fname).alias("field"), expr.alias("value"),
            _skey(F.col("pos"), F.col("idx") * 5 + off).alias("skey"),
            F.lit(True).alias("clean"), F.lit(True).alias("unique"),
            F.lit(False).alias("replace"),
        )
        derived = d if derived is None else derived.unionByName(d)

    # ---- text routing (F-11) --------------------------------------------
    text_t = t.filter(pred == COLLEX + "text")
    if corrected_df is not None:
        text_t = text_t.join(
            F.broadcast(corrected_df.select(
                F.col("uri").alias("subject"), F.col("text").alias("_corrected")
            )),
            "subject", "left",
        )
    else:
        text_t = text_t.withColumn("_corrected", F.lit(None).cast("string"))
    is_url = _http_ish(obj) & F.col("_corrected").isNull()

    text_url_entries = text_t.filter(is_url).select(
        "file", "subject", F.lit("text_url").alias("field"), obj.alias("value"),
        _skey(F.col("pos")).alias("skey"), F.lit(True).alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )

    ft_errors = None
    if mode == "INDEX":
        if fulltext_df is not None:
            ext = text_t.filter(is_url).join(
                fulltext_df.select(
                    F.col("text_url").alias("_fturl"), F.col("text").alias("_fttext")
                ),
                F.trim(obj) == F.col("_fturl"), "left",
            )
            ft_errors = ext.filter(F.col("_fttext").isNull()).select(
                "file",
                F.trim(obj).alias("uri"),
                F.concat(F.lit("Missing full text file "), escaped_text_name(F.trim(obj))).alias("message"),
            )
            ext_text = ext.withColumn("_text", F.coalesce("_fttext", F.lit("")))
        else:
            ext_text = text_t.filter(is_url).withColumn("_text", F.lit(""))
        corr_text = text_t.filter(F.col("_corrected").isNotNull()).withColumn(
            "_text", F.col("_corrected")
        )
        inline = text_t.filter(~is_url & F.col("_corrected").isNull()).withColumn(
            "_text", obj
        )
        ext_like = ext_text.unionByName(corr_text, allowMissingColumns=True).select(
            "file", "subject", "pos", "_text", F.lit(False).alias("_clean")
        )
        inline = inline.select(
            "file", "subject", "pos", "_text", F.lit(True).alias("_clean")
        )
        all_text = ext_like.unionByName(inline)
    else:
        # TEST mode: external/corrected text is NOT fetched → empty string
        all_text = text_t.select(
            "file", "subject", "pos",
            F.when(is_url | F.col("_corrected").isNotNull(), F.lit("")).otherwise(obj).alias("_text"),
            (~(is_url | F.col("_corrected").isNotNull())).alias("_clean"),
        )
    keep_text = (F.length("_text") > 0) | F.lit(is_pages)
    text_entries = all_text.filter(keep_text).select(
        "file", "subject", F.lit("text").alias("field"), F.col("_text").alias("value"),
        _skey(F.col("pos")).alias("skey"), F.col("_clean").alias("clean"),
        F.lit(False).alias("unique"), F.lit(False).alias("replace"),
    )

    entries = simple
    for part in (title_sort, ocr, typewright, freeculture, has_pages, role_vals,
                 role_list, date_label, year_entries, derived, text_url_entries,
                 text_entries):
        if part is not None:
            entries = entries.unionByName(part)

    errors = nines_errors.unionByName(collex_errors).unionByName(fed_errors) \
        .unionByName(date_errors)
    if ft_errors is not None:
        errors = errors.unionByName(ft_errors)

    # A-14: link collection over addField'ed values
    links = entries.filter(
        ~F.col("field").isin(*_NO_LINK_FIELDS) & _http_ish(F.col("value"))
    ).select(
        F.col("subject").alias("uri"), "file", F.col("value").alias("url")
    )

    return entries, errors, links


def safe_archive(archive: str) -> str:
    """T-10 (RDFIndexerConfig.safeArchive:154-159): ':', ' ' and ',' → '_'
    so the archive name is usable as a core/table name."""
    return archive.replace(":", "_").replace(" ", "_").replace(",", "_")


def safe_archive_col(col: Column) -> Column:
    x = F.replace(col, F.lit(":"), F.lit("_"))
    x = F.replace(x, F.lit(" "), F.lit("_"))
    return F.replace(x, F.lit(","), F.lit("_"))


def archive_core_name(archive: str) -> str:
    """RDFIndexerConfig.coreName:147-152: pages_* archives keep their name,
    everything else gets the ``archive_`` prefix."""
    if archive.startswith("pages_"):
        return safe_archive(archive)
    return "archive_" + safe_archive(archive)


def escaped_text_name(col: Column) -> Column:
    """T-9 URI→filename escaping (NinesStatementHandler.java:626-630)."""
    x = F.replace(col, F.lit("/"), F.lit("SL"))
    x = F.replace(x, F.lit(":"), F.lit("CL"))
    x = F.replace(x, F.lit("?"), F.lit("QU"))
    x = F.replace(x, F.lit("="), F.lit("EQ"))
    return F.replace(x, F.lit("&"), F.lit("AMP"))


def rewrite_date_bnodes(triples: DataFrame) -> DataFrame:
    """D-4: fold ``(doc, dc:date, _:b)`` + ``(_:b, label/value, x)`` into
    doc-rooted pseudo-predicates ``engine:date_label`` / ``engine:date_value``.

    The reference does this statefully (remembering ``dateBNodeId``,
    ``NinesStatementHandler.java:408-474``); here it's a self-join on the
    bnode id within a file.
    """
    links = triples.filter(
        (F.col("predicate") == DC + "date") & ~F.col("is_literal")
    ).select(
        F.col("file").alias("l_file"),
        F.col("subject").alias("doc_subject"),
        F.col("object").alias("bnode"),
    )
    bnode_triples = triples.filter(F.col("subject").startswith("_:"))
    rewritten = bnode_triples.join(
        links,
        (bnode_triples["file"] == F.col("l_file"))
        & (bnode_triples["subject"] == F.col("bnode")),
    ).select(
        bnode_triples["file"],
        F.col("doc_subject").alias("subject"),
        F.when(F.col("predicate") == RDFS + "label", "engine:date_label")
        .when(F.col("predicate") == RDF_VALUE, "engine:date_value")
        .alias("predicate"),
        "object", "is_literal", "pos",
    ).filter(F.col("predicate").isNotNull())

    main = triples.filter(
        ~F.col("subject").startswith("_:")
        & ~((F.col("predicate") == DC + "date") & ~F.col("is_literal"))
    )
    return main.unionByName(rewritten)


def assemble_documents(
    triples: DataFrame,
    *,
    is_pages: bool = False,
    mode: str = "TEST",
    fulltext_df: DataFrame | None = None,
    corrected_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full F-2 pipeline: triples → (documents, errors, links).

    ``triples`` columns: file, subject, predicate, object, is_literal, pos
    (plus optional ``error`` rows from the RDF/XML parser, which pass through
    to the error stream).
    """
    if "error" in triples.columns:
        parse_errors = triples.filter(F.col("error").isNotNull()).select(
            "file", F.lit("").alias("uri"), F.col("error").alias("message")
        )
        triples = triples.filter(F.col("error").isNull()).drop("error")
    else:
        parse_errors = None

    triples = rewrite_date_bnodes(triples)

    # F-2: document roster = rdf:type statements with URI subjects
    type_triples = triples.filter(
        (F.col("predicate") == RDF_TYPE) & ~F.col("subject").startswith("_:")
    )
    roster = type_triples.groupBy("file", "subject").agg(
        F.min("pos").alias("doc_pos"), F.count("*").alias("n_types")
    )
    dup_errors = roster.filter(F.col("n_types") > 1).select(
        "file", F.col("subject").alias("uri"),
        F.explode(F.expr("sequence(2, n_types)")).alias("_i"),
    ).select("file", "uri", F.lit("Duplicate URI").alias("message"))

    # attach the owning doc URI to every triple for error attribution
    triples = triples.withColumn("doc_uri", F.col("subject"))

    entries, route_errors, links = route_triples(
        triples.filter(F.col("predicate") != RDF_TYPE),
        is_pages=is_pages, mode=mode,
        fulltext_df=fulltext_df, corrected_df=corrected_df,
    )

    # value cleaning (the addFieldEntry chain) where the handler cleans.
    # T-2/T-3 fidelity: the chain also emits the reference's per-removal
    # error rows (escape sequences, U+FFFD position+snippet) into the
    # distributed error stream (TextUtils.java:40-64,78-118).
    from .analyzer import clean_field_value_with_errors_col

    entries = entries.withColumn(
        "_cl",
        F.when(F.col("clean"), clean_field_value_with_errors_col(F.col("value")))
        .otherwise(F.struct(
            F.col("value").alias("value"),
            F.array().cast("array<string>").alias("errs"),
        )),
    )
    clean_errors = entries.filter(F.size("_cl.errs") > 0).select(
        "file", F.col("subject").alias("uri"),
        F.explode("_cl.errs").alias("message"),
    )
    entries = entries.withColumn("value", F.col("_cl.value")).drop("_cl")

    # addFieldIfUnique: first occurrence per (doc, field, value) wins
    w_unique = Window.partitionBy("file", "subject", "field", "value").orderBy("skey")
    entries = entries.withColumn(
        "_urn",
        F.when(F.col("unique"), F.row_number().over(w_unique)).otherwise(F.lit(1)),
    ).filter(F.col("_urn") == 1)

    # replace semantics: only the last value survives
    w_last = Window.partitionBy("file", "subject", "field").orderBy(F.desc("skey"))
    entries = entries.withColumn(
        "_lrn",
        F.when(F.col("replace"), F.row_number().over(w_last)).otherwise(F.lit(1)),
    ).filter(F.col("_lrn") == 1)

    per_field = entries.groupBy("file", "subject", "field").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("skey", "value"))),
            lambda s: s["value"],
        ).alias("values")
    )
    per_doc = per_field.groupBy("file", "subject").agg(
        F.map_from_entries(F.collect_list(F.struct("field", "values"))).alias("fields")
    )

    docs = roster.select("file", "subject", "doc_pos").join(
        per_doc, ["file", "subject"], "left"
    ).select(
        "file",
        F.col("subject").alias("uri"),
        "doc_pos",
        F.map_concat(
            F.create_map(F.lit("uri"), F.array(F.col("subject"))),
            F.coalesce(
                "fields", F.create_map().cast("map<string,array<string>>")
            ),
        ).alias("fields"),
    )

    if not is_pages:
        docs = finalize_documents(docs)

    # "No objects in this file." (mirrors the indexer's empty-file check)
    file_names = triples.select("file").distinct()
    if parse_errors is not None:
        file_names = file_names.unionByName(parse_errors.select("file")).distinct()
    empty_files = file_names.join(
        docs.select("file").distinct(), "file", "left_anti"
    ).select(
        "file", F.lit("").alias("uri"),
        F.lit("No objects in this file.").alias("message"),
    )

    errors = route_errors.unionByName(dup_errors).unionByName(empty_files) \
        .unionByName(clean_errors)
    if parse_errors is not None:
        errors = parse_errors.unionByName(errors)

    return docs, errors, links


def finalize_documents(docs: DataFrame) -> DataFrame:
    """G-1..G-4 (NinesStatementHandler.java:831-898 +
    RdfDocumentParser.java:82-97), as pure map expressions."""
    m = F.col("fields")

    def first_of(key: str) -> Column:
        v = F.element_at(F.element_at(m, F.lit(key)), 1)
        return F.when(F.length(v) > 0, v)  # "" → null, like getFirstField+len check

    # G-1: author_sort coalesce. role_PUB / role_TRN are checked even though
    # the role handler emits PBL / TRL codes — faithful reference quirk.
    author_sort = F.coalesce(
        *[first_of(k) for k in (
            "role_AUT", "role_ART", "role_EDT", "role_PUB",
            "role_TRN", "role_CRE", "role_ETR", "role_EGR",
        )]
    )

    years = F.element_at(m, F.lit("year"))
    has_years = years.isNotNull() & (F.size(years) > 0)
    year_first = F.element_at(years, 1)
    year_last = F.element_at(years, -1)

    def opt_entry(key: str, value_arr: Column, cond: Column) -> Column:
        return F.when(cond, F.array(F.struct(
            F.lit(key).alias("field"), value_arr.alias("values")
        ))).otherwise(F.array().cast("array<struct<field:string,values:array<string>>>"))

    has_text = F.element_at(m, F.lit("text")).isNotNull()
    additions = F.map_from_entries(F.concat(
        opt_entry("author_sort", F.array(author_sort), author_sort.isNotNull()),
        opt_entry("year", F.array(F.lit("Uncertain")), ~has_years),
        opt_entry("year_sort",
                  F.when(has_years, F.array(year_first)).otherwise(F.array(F.lit("Uncertain"))),
                  F.lit(True)),
        opt_entry("year_sort_asc",
                  F.when(has_years, F.array(year_first)).otherwise(F.array(F.lit("Uncertain"))),
                  F.lit(True)),
        opt_entry("year_sort_desc",
                  F.when(has_years, F.array(year_last)).otherwise(F.array(F.lit("Uncertain"))),
                  F.lit(True)),
        opt_entry("has_full_text",
                  F.when(has_text, F.array(F.lit("T"))).otherwise(F.array(F.lit("F"))),
                  F.element_at(m, F.lit("has_full_text")).isNull()),
        opt_entry("is_ocr", F.array(F.lit("F")),
                  F.element_at(m, F.lit("is_ocr")).isNull()),
        opt_entry("freeculture", F.array(F.lit("T")),
                  F.element_at(m, F.lit("freeculture")).isNull()),
    ))
    finalized = F.map_concat(m, additions)

    # G-4: tag normalization → <archive>_tag + username (dynamic key)
    tags = F.element_at(finalized, F.lit("tag"))
    archive0 = F.element_at(F.element_at(finalized, F.lit("archive")), 1)
    with_tags = F.map_concat(
        F.map_filter(finalized, lambda k, _: k != "tag"),
        F.map_from_entries(F.array(
            F.struct(F.concat(archive0, F.lit("_tag")).alias("field"),
                     F.transform(tags, lambda t: F.replace(F.lower(t), F.lit(" "), F.lit("-"))).alias("values")),
            F.struct(F.lit("username").alias("field"), F.array(archive0).alias("values")),
        )),
    )
    result = F.when(tags.isNotNull(), with_tags).otherwise(finalized)
    return docs.withColumn("fields", result)
