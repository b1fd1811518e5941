"""Column-expression builders (all JVM-side, whole-stage-codegen friendly).

No Python UDFs here: every function returns a Catalyst Column built from
``pyspark.sql.functions`` so it runs vectorized inside codegen. Where an
operator needs a hash that a DuckDB oracle can reproduce exactly, we use
md5-derived integers (``hashing.portable_hash``) instead of Spark's
engine-specific ``hash()``/``xxhash64()``.
"""

from broadway_spark.functions.exact import (
    div_trunc,
    ratio_ppm,
)
from broadway_spark.functions.hashing import (
    portable_hash,
    fingerprint,
)
from broadway_spark.functions.text import (
    tokens,
    word_shingles,
    token_count,
    bpe_ish_token_count,
    language_id,
    quality_score,
)
from broadway_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "div_trunc",
    "ratio_ppm",
    "portable_hash",
    "fingerprint",
    "tokens",
    "word_shingles",
    "token_count",
    "bpe_ish_token_count",
    "language_id",
    "quality_score",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
