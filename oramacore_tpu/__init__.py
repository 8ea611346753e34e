"""oramacore_tpu — a TPU-native search & AI runtime.

A from-scratch rebuild of OramaCore's capabilities (full-text BM25F search,
vector database, hybrid search, filters/facets/groups/sort, CQRS write/read
sides over a replicated op log, RAG answer engine, hooks, auth, metrics)
designed TPU-first: indexes are dense HBM-resident arrays, scoring is
batched JAX/XLA/Pallas compute, commits are immutable array snapshots, and
multi-chip scale-out shards collections by doc-id with collective top-k
merge over ICI.

Reference behavior studied from oramasearch/oramacore (see SURVEY.md);
architecture is original and TPU-idiomatic, not a port.
"""

__version__ = "0.1.0"
