"""Operators — the engine's compute surface.

Broadway-derived dataflow operators (failure diversion, batching,
partition routing — see SURVEY.md §2) plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal).
Everything is a DataFrame → DataFrame function; no operator collects to
the driver.
"""

from broadway_spark.operators.failure import with_status, split_failures
from broadway_spark.operators.batching import (
    chunk_by_size,
    chunk_by_budget,
    apply_per_batch,
)
from broadway_spark.operators.partitioning import partition_bucket, route_by
from broadway_spark.operators.dedup import (
    exact_dedup_stats,
    fingerprint_dedup,
    minhash_signature,
    minhash_lsh_pairs,
    simhash,
    embedding_near_duplicates,
)
from broadway_spark.operators.similarity import ann_bruteforce_topk

__all__ = [
    "with_status",
    "split_failures",
    "chunk_by_size",
    "chunk_by_budget",
    "apply_per_batch",
    "partition_bucket",
    "route_by",
    "exact_dedup_stats",
    "fingerprint_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_near_duplicates",
    "ann_bruteforce_topk",
]
