"""identity_matching_spark — a from-scratch PySpark-native record-linkage engine.

Reproduces the query semantics of src-d/identity-matching (reference at
/root/reference, GPL Go + Python research prototype) re-expressed Spark-first:

* signature normalization (clean_name/clean_email, diacritics strip)
* blacklist precision filters (ignored emails/names, popular keys)
* frequency stats (recent/total) and co-occurrence popularity
* exact-key blocking with star-edge emission and popular-key skew handling
* MinHash-LSH blocking over text shingles (generalization per BASELINE.json)
* pairwise scoring (exact + Jaro-Winkler/Levenshtein pandas UDFs)
* iterative-join connected components with per-iteration checkpointing
* cluster build, max-identities cap, primary name/email selection
* aliases/identities parquet sinks matching the reference schemas

Everything is declared with the DataFrame API so Catalyst handles pushdown,
partial aggregation, and AQE skew handling; Python appears only inside
Arrow-vectorized pandas UDFs (diacritics, string similarity, MinHash).
"""

__version__ = "0.1.0"
