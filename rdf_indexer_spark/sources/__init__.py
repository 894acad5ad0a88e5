"""Sources/sinks (SURVEY.md §2.A): RDF/XML parsing (A-3) plus parquet/Iceberg
table loading conventions used throughout (A-1/A-8 analogs)."""
from ..rdfxml import parse_files_df, parse_rdfxml
from ..queries import TABLES, load
