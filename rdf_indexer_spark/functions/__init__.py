"""Scalar/array function library (SURVEY.md §2.G/§2.C): the clean chain,
tokenizer, year parsing — pure ground truth + native/vectorized forms."""
from ..analyzer import (
    clean_field_value, clean_field_value_col, clean_field_value_errors,
    clean_field_value_with_errors_col, clean_html, clean_raw_text,
    normalize_whitespace, normalize_whitespace_col, strip_escape_sequences,
    strip_unknown_utf8, tokenize, tokenize_col, tokenize_udf,
)
from ..fields import archive_core_name, safe_archive, safe_archive_col
from ..rdfxml import find_invalid_escapes
from ..textops import h60_col
from ..cleaners import REGISTRY, clean_with_registry
from ..years import parse_years, parse_years_udf, derived_date_fields
