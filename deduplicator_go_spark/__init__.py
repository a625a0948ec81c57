"""deduplicator_go_spark — a PySpark-native near-duplicate detection and
clustering engine with the query/data-processing capabilities of the
reference deDuplicator-Go catalog engine, re-expressed Spark-first.

The reference (PortNumber53/deDuplicator-Go) is a single-process Go CLI
over Postgres that catalogs file instances, computes SHA-256 content
hashes, groups duplicates by (hash, size) and elects "keeper" copies by
several policies.  This package keeps those semantics (see SURVEY.md §2
for the operator-by-operator mapping) but is architected for Spark:

- declarative DataFrame plans everywhere (Catalyst does pushdown,
  partial aggregation, broadcast-join selection, AQE skew handling);
- vectorized Arrow/pandas UDFs only where built-ins cannot express the
  semantics (MinHash signatures, suffix-anchor fingerprints);
- checkpointed stage outputs with per-partition lineage rows so a killed
  pipeline resumes mid-run (generalizing the reference's keyset-bookmark
  resume, files/hash.go:202-283);
- explicit skew handling for LSH hot bands (salted chaining).
"""

__version__ = "0.1.0"
