"""Continuously-maintained per-domain cap ingestion — the streaming twin
of ``functions/urls.domain_cap_sample`` (VERDICT r07 'Next round' #5).

An arriving crawl can't re-rank the whole corpus per micro-batch; this
maintainer keeps per-registered-domain ACCEPTED counts as base+delta
parquet generations (the ``ContinuousDsir`` manifest pattern — state is
O(|domains|) rows, never corpus-sized) and decides each batch online:
**first-arrival-wins under the cap** — earlier batches consume a
domain's quota first; within one batch the deterministic md5 sampling
key breaks ties exactly like the batch operator, so the accepted set is
reproducible replay-for-replay.

The batch-equivalence contract (pinned in
``tests/test_streaming.py::TestContinuousDomainCap``): the union of
accepted rows across batches equals the batch rank
``row_number() OVER (PARTITION BY domain
ORDER BY batch_id, sample_key(url), url) <= cap`` over the union — the
``domain_cap_sample`` quota rule with arrival order as the leading
priority (an online operator cannot revoke an accept when a
smaller-key URL arrives later; making arrival order explicit in the
twin keeps the equality exact instead of approximate).

Replay discipline (the r06-advice ordering, same as
``ContinuousDsir``): decide -> sink -> THEN commit the batch's accepted
counts. foreachBatch is at-least-once; the manifest's max committed
batch_id is the commit point. A crash BEFORE the count commit replays
against unchanged counts, reproduces identical verdicts, and the sink's
own batch_id guard swallows the duplicate; a crash AFTER it makes the
replay a manifest-guard no-op before any decision.

Scale: per batch the maintainer writes <= |batch domains| delta rows
and reads back O(generations × domains) rows (compacted every
``compact_every`` batches); the decision join is one hash equi-join on
the domain key (counts side is domain-cardinality, not corpus-sized)
plus one per-(batch, domain) window — batch-bounded sorts. ``path``
must be a shared POSIX filesystem (manifest and GC are driver-local
file I/O — the ``ContinuousAnnIndex`` contract).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.functions.sampling import sample_key
from proxima_platform_spark.functions.urls import (
    registered_domain,
    url_canonicalize,
    url_host,
)


class ContinuousDomainCap:
    """``update(batch, batch_id)`` is usable directly as a
    ``foreachBatch`` callback. ``sink(verdicts_df, batch_id)`` receives
    (id, url_canon, domain, accepted) for every batch row — it MUST
    materialize the frame and no-op on batch_ids it has already
    committed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        url_col: str = "url",
        id_col: str = "doc_id",
        cap: int = 1000,
        salt: str = "",
        sink: Callable[[DataFrame, int | None], None] | None = None,
        compact_every: int = 4,
    ) -> None:
        if cap < 0:
            raise ValueError(f"cap must be >= 0, got {cap}")
        if "://" in path:
            raise ValueError(
                "ContinuousDomainCap state path must be a POSIX filesystem "
                f"path (manifest/GC are driver-local file I/O), got {path!r}"
            )
        self.spark = spark
        self.path = path
        self.url_col = url_col
        self.id_col = id_col
        self.cap = cap
        self.salt = salt
        self.sink = sink
        self.compact_every = compact_every
        os.makedirs(path, exist_ok=True)

    # -- manifest (the ContinuousDsir pattern) -------------------------------

    def _manifest(self) -> dict:
        p = f"{self.path}/manifest.json"
        if not os.path.exists(p):
            return {"version": 0, "base": None, "deltas": [], "max_batch_id": None}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = f"{self.path}/manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, f"{self.path}/manifest.json")

    # -- accepted-count frames -----------------------------------------------

    def _counts(self, m: dict) -> DataFrame:
        paths = ([m["base"]] if m["base"] else []) + m["deltas"]
        if not paths:
            return self.spark.createDataFrame([], "domain string, n_acc long")
        df = self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])
        return df.groupBy("domain").agg(F.sum("n_acc").alias("n_acc"))

    def accepted_counts(self) -> DataFrame:
        """The CURRENT (domain, n_acc) frame — the quota the next batch
        will be decided against."""
        return self._counts(self._manifest())

    # -- maintenance ---------------------------------------------------------

    def _staged(self, batch: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        staged = batch.withColumn(
            "url_canon", url_canonicalize(F.col(self.url_col))
        ).withColumn("domain", registered_domain(url_host(F.col("url_canon"))))
        # within-batch priority: the batch operator's (md5 key, url) order
        w = Window.partitionBy("domain").orderBy(
            sample_key(F.col(self.url_col), self.salt), F.col(self.url_col)
        )
        return staged.withColumn("__rn", F.row_number().over(w))

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        m = self._manifest()
        # replay of a COMMITTED batch: full no-op before any decision —
        # batch ids are monotonic, so "seen" is exactly "<= max committed"
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        counts = self._counts(m)
        verdicts = (
            self._staged(batch)
            .join(counts, "domain", "left")
            .select(
                self.id_col,
                "url_canon",
                "domain",
                (
                    F.col("__rn")
                    <= F.lit(self.cap) - F.coalesce("n_acc", F.lit(0))
                ).alias("accepted"),
            )
            # staged once: the frame feeds the sink AND the delta count;
            # without it both consumers re-run the canonicalize + window
            .localCheckpoint(eager=False)
        )
        # sink BEFORE the count commit (r06-advice ordering): a crash in
        # between replays against unchanged counts -> identical verdicts ->
        # the sink's batch_id guard absorbs the duplicate delivery
        if self.sink is not None:
            self.sink(verdicts, batch_id)
        v = m["version"] + 1
        delta = f"delta/d{v}"
        # overwrite: a crashed attempt may have left an orphan at this
        # versioned path; the manifest write below is the commit point
        (
            verdicts.where("accepted")
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_acc"))
            .write.mode("overwrite")
            .parquet(f"{self.path}/{delta}")
        )
        m["version"] = v
        m["deltas"] = m["deltas"] + [delta]
        self._write_manifest(m)
        if len(m["deltas"]) >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        m = self._manifest()
        paths = ([m["base"]] if m["base"] else []) + m["deltas"]
        if not paths:
            return
        new_base = f"base/g{m['version']}"
        self._counts(m).write.mode("overwrite").parquet(
            f"{self.path}/{new_base}"
        )
        old = paths
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)
