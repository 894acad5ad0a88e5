"""The internalized inverted index: the part the reference delegates to
Solr/Lucene (posting lists, compression, BM25 top-k), built Spark-first."""
