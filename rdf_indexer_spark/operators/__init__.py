"""Operator families (SURVEY.md §2.D/E + pipeline extensions), re-exported:

- document assembly/finalization: rdf_indexer_spark.fields
- compare diffs (J-3..J-8):       rdf_indexer_spark.compare
- reference resolution (J-1/J-2): rdf_indexer_spark.resolve
- validation (V-1..V-11):         rdf_indexer_spark.validation
- dedup / text analysis:          rdf_indexer_spark.textops
- similarity search:              rdf_indexer_spark.similarity
- multimodal plumbing:            rdf_indexer_spark.multimodal
"""
from ..compare import (
    compare_archives, global_order_rank, required_field_errors,
    text_size_stats,
)
from ..fields import assemble_documents, finalize_documents
from ..resolve import resolve_references
from ..textops import (
    dedup_keep_canonical, exact_duplicates, fingerprints, language_id,
    minhash_lsh_candidates, minhash_near_duplicates,
    minhash_near_duplicates_exact, ngram_jaccard, quality_features,
    simhash_near_duplicates,
)
from ..similarity import (
    cosine_topk, cosine_topk_batch, ivf_index, ivf_topk, kmeans_centroids,
    lsh_index, lsh_recall_at_k, lsh_topk, lsh_topk_batch,
)
from ..index.maintain import append_documents, delete_by_query, delete_docs
from ..validation import validate_documents
