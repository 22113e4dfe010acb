"""Column-expression helpers: time, text analysis, dedup, similarity.

Everything here is a *function of Columns returning Columns* — it stays in
whole-stage codegen. Python/pandas appears only in multimodal decode stubs.
"""

from proxima_platform_spark.functions.core import (
    epoch_ms,
    from_epoch_ms,
    window_start_ms,
)
from proxima_platform_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from proxima_platform_spark.functions.dedup import (
    exact_dup_key,
    minhash_signature,
    ngram_shingles,
    simhash64,
)
from proxima_platform_spark.functions.similarity import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "doc_fingerprint",
    "dot",
    "epoch_ms",
    "exact_dup_key",
    "from_epoch_ms",
    "l2_norm",
    "language_id",
    "minhash_signature",
    "ngram_shingles",
    "quality_score",
    "simhash64",
    "token_count",
    "window_start_ms",
]
