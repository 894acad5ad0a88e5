"""Declarative query plans over the engine's tables (reference query surface
Q-1..Q-9 re-expressed for Catalyst) — see rdf_indexer_spark.queries."""
from .. import queries
