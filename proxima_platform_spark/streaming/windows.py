"""Windowed aggregation on unbounded input: mapping the reference's per-op
streaming knobs onto Spark's query-level semantics.

Reference: WindowedStream.withEarlyEmitting (itf WindowedStream.java:531 →
BeamWindowedStream.withEarlyEmitting:598, trigger extraction
BeamStream.extractEarlyEmitting:1081-1110) fires a processing-time early
trigger per window; withAllowedLateness (:539 → :612) tolerates late data.

Spark mapping (documented semantic deltas, SURVEY §2.4):
  * allowed lateness → the watermark delay (plays both the lateness and
    out-of-orderness roles; there is no separate per-op bound);
  * early emitting → ``outputMode("update")`` + a processing-time trigger —
    windows emit partial results every trigger instead of once per op-level
    early timer, because Spark triggers are per-query, not per-operator;
  * no early emitting → ``outputMode("append")``: a window emits exactly
    once, when the watermark closes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from proxima_platform_spark.operators.windowed import Windowing


def windowed_streaming_aggregation(
    stream_df: DataFrame,
    windowing: Windowing,
    key: Column | str | None,
    *aggs: Column,
) -> tuple[DataFrame, dict]:
    """Build the streaming windowed aggregation for ``windowing`` and return
    ``(agg_df, writer_kwargs)`` — writer_kwargs carries the outputMode and
    trigger the knobs imply; pass them to ``DataFrame.writeStream`` (the
    trigger may be overridden for tests, e.g. availableNow).
    """
    assert windowing.time_column, "streaming windowed agg needs an event-time column"
    lateness_ms = windowing.allowed_lateness_ms or 0
    wm = stream_df.withWatermark(windowing.time_column, f"{lateness_ms} milliseconds")

    keys = [windowing.window_expr().alias("window")]
    if key is not None:
        from pyspark.sql import functions as F

        keys.append((F.col(key) if isinstance(key, str) else key).alias("key"))
    agg_df = wm.groupBy(*keys).agg(*aggs)

    if windowing.early_emitting_ms:
        writer_kwargs = {
            "outputMode": "update",
            "trigger": {"processingTime": f"{windowing.early_emitting_ms} milliseconds"},
        }
    else:
        writer_kwargs = {"outputMode": "append", "trigger": {"availableNow": True}}
    return agg_df, writer_kwargs
