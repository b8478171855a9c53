"""Training-data pipeline operators beyond the reference's own surface:
dedup variants (exact, minhash-LSH, simhash, n-gram jaccard, suffix
array, embedding), text analysis (token stats, quality, language-ID,
fingerprints), curation (sampling, mix planning, token-balanced output
shards), similarity search, and multimodal column plumbing.

Each SQL-expressible operator ships BOTH a Spark implementation and a
DuckDB-runnable ANSI-SQL twin with byte-identical semantics (same
tokenizer regex, same stopword lists, integer-exact arithmetic), so the
driver's oracle harness can verify it end-to-end.
"""
