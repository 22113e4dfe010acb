"""Continuously-maintained ANN index: sign-LSH bucket assignments folded
per micro-batch — approximate nearest-neighbor queries over an unbounded,
growing corpus without rebuilding.

The ``ContinuousRollup``/``ContinuousHeavyHitters`` manifest pattern
applied to the ANN family: each micro-batch's vectors are bucket-assigned
by the SAME integer-exact Arrow stage the batch operators use
(``similarity.sign_lsh_buckets_arrow``), appended as a delta parquet
generation, and compacted every N generations. A query hashes itself with
the identical integer math (mirrored in pure Python — the plane family is
deterministic md5 signs over fixed-point components, so driver and
executors agree bit-for-bit), reads ONLY its buckets (predicate pushed to
the parquet scan), and ranks candidates by exact cosine.

Consistency contract: ids are append-only across the stream (the corpus
ingestion shape); ``update`` is idempotent on replayed micro-batches via
the max-committed-batch_id guard — the standard foreachBatch
at-least-once discipline. State per generation is O(rows·num_tables) —
the index IS the data plus its bucket keys; no driver-side structure.

At 1000 executors: deltas land as ordinary parquet appends, compaction is
one bucket-partitioned fold, and queries touch ~num_tables·n/2^planes
rows — the same candidate-volume math as the batch LSH join.
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from proxima_platform_spark.functions.similarity import (
    LSH_FIXED_SCALE,
    _plane_sign,
    cosine_similarity,
    sign_lsh_buckets_arrow,
)


def _query_buckets(
    vec: list[float], *, num_planes: int, num_tables: int, probes: int = 1
) -> list[list[int]]:
    """Probe buckets of ``vec`` per table — the pure-Python mirror of
    ``sign_lsh_buckets_arrow``'s integer projection (floor(x·scale) int64
    against ±1 planes; exact, so the driver-side query hashes into
    exactly the buckets the executors assigned). With ``probes > 1``,
    each table additionally probes the ``probes − 1`` Hamming-1
    neighbor buckets reached by flipping the smallest-|projection|
    planes (the ``multiprobe_lsh_top_k`` rule — exact integer
    projections, so the flip order is unambiguous)."""
    q = [math.floor(x * LSH_FIXED_SCALE) for x in vec]
    dim = len(q)
    out = []
    for t in range(num_tables):
        projs = []
        bucket = 0
        for p in range(num_planes):
            plane = t * num_planes + p
            proj = sum(q[d] * _plane_sign(plane, d) for d in range(dim))
            projs.append(proj)
            if proj > 0:
                bucket |= 1 << p
        flips = sorted(range(num_planes), key=lambda p: (abs(projs[p]), p))
        out.append(
            [bucket] + [bucket ^ (1 << p) for p in flips[: probes - 1]]
        )
    return out


def semantic_dedup_stream(
    stream_emb: DataFrame,
    index: "ContinuousAnnIndex",
    sink,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Incremental embedding-level dedup ONLINE — the embedding analog of
    the fingerprint ``incremental_dedup`` (new batch vs existing corpus):
    per micro-batch, each vector is checked for a cosine near-dup among
    the ALREADY ACCEPTED corpus via the maintained LSH index (shared
    buckets only, exact cosine on candidates — first arrival wins across
    batches, like ``dropDuplicatesWithinWatermark`` for fingerprints);
    survivors are appended to the index, and ``sink(verdicts, batch_id)``
    receives one row per batch vector: ``(id, kept, nbr, cosine)`` with
    the condemning indexed match (null/−2.0 when kept).

    Within-batch dups are NOT checked here — the batch operators
    (``embedding_near_dup_pairs`` / ``semantic_dedup``) own intra-batch
    semantics; this operator's contract is new-vs-accepted, which is what
    keeps it one bucket equi-join per batch. Delivery is the standard
    at-least-once foreachBatch contract, and the sink MUST no-op on
    replayed batch_ids (≤ max committed). Ordering matters: the sink is
    called BEFORE ``index.update`` — a crash between the two replays the
    batch against an UNCHANGED index, reproducing identical verdicts that
    the sink then dedups on batch_id, and the idempotent update proceeds.
    (The reverse order has a hole: after a crash between update and sink,
    the replayed check would see the batch's own accepted vectors in the
    index, so near-dup batch-mates would condemn each other and the FIRST
    delivery the sink ever received for that batch_id would be wrong.)
    Returns a ``DataStreamWriter`` — caller adds trigger/checkpoint and
    ``start()``."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        ).localCheckpoint()
        dups = index.near_dups_of(
            batch_df.select(
                F.col("vec_id").alias(index.id_col),
                F.col("embedding").alias(index.vec_col),
            ),
            threshold=threshold,
            exclude_self=True,
        ).localCheckpoint()
        verdicts = (
            batch_df.join(
                dups, batch_df["vec_id"] == dups["id"], "left"
            )
            .select(
                "vec_id",
                F.col("id").isNull().alias("kept"),
                "nbr",
                F.round(F.coalesce("cosine", F.lit(-2.0)), 6).alias("cosine"),
            )
        )
        survivors = verdicts.where("kept").select("vec_id").join(
            batch_df, "vec_id"
        )
        # Sink FIRST, then index update (see docstring): a crash between
        # the two replays against an unchanged index → identical verdicts
        # → the sink's batch_id no-op guard holds; the update is
        # batch_id-idempotent either way.
        sink(verdicts, batch_id)
        index.update(
            survivors.select(
                F.col("vec_id").alias(index.id_col),
                F.col("embedding").alias(index.vec_col),
            ),
            batch_id=batch_id,
        )

    return stream_emb.writeStream.foreachBatch(handle)


class ContinuousAnnIndex:
    """``update(batch)`` is usable directly as a ``foreachBatch``
    callback; ``query_df(vec, k)`` returns the top-k bucket mates by
    exact cosine as a DataFrame.

    Storage contract: ``path`` must be a SHARED POSIX filesystem mounted
    identically on the driver and every executor (NFS/Lustre/local in
    single-node mode). The manifest and GC are driver-local ``os``/
    ``json``/``shutil`` operations while executors write the parquet
    generations to the same path — on object stores or HDFS (``s3a://``,
    ``hdfs://`` checkpoint-style locations) the manifest/GC path would
    silently break. Porting to those stores means routing the manifest
    I/O through the Hadoop FileSystem API (``spark._jvm.org.apache.
    hadoop.fs.FileSystem``), which is deliberately out of scope here;
    the constructor rejects non-POSIX URIs loudly instead."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        num_planes: int = 8,
        num_tables: int = 2,
        compact_every: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self.num_planes = num_planes
        self.num_tables = num_tables
        self.compact_every = compact_every
        if "://" in path:
            raise ValueError(
                f"ContinuousAnnIndex path must be a plain shared-POSIX path "
                f"(got {path!r}); manifest/GC use driver-local file I/O — "
                f"see class docstring"
            )
        os.makedirs(path, exist_ok=True)

    # -- manifest (the ContinuousRollup pattern) ----------------------------

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

    # -- maintenance ---------------------------------------------------------

    def _bucketed(self, batch: DataFrame) -> DataFrame:
        staged = sign_lsh_buckets_arrow(
            batch.select(
                F.col(self.id_col).alias("__id"),
                F.col(self.vec_col).cast("array<double>").alias("__v"),
            ),
            vec_col="__v",
            num_planes=self.num_planes,
            num_tables=self.num_tables,
        )
        tb = F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"__b{t}").alias("b"))
            for t in range(self.num_tables)
        ])
        return staged.select("__id", "__v", F.explode(tb).alias("__tb")).select(
            F.col("__id").alias("id"),
            F.col("__v").alias("v"),
            F.col("__tb.t").alias("t"),
            F.col("__tb.b").alias("bucket"),
        )

    def update(self, batch: DataFrame, batch_id: int | None = None) -> None:
        m = self._manifest()
        # foreachBatch is at-least-once: replays carry the same monotonic
        # batch_id — no-op instead of double-inserting the batch's vectors
        if batch_id is not None:
            if m["max_batch_id"] is not None and batch_id <= m["max_batch_id"]:
                return
            m["max_batch_id"] = batch_id
        v = m["version"] + 1
        delta = f"delta/d{v}"
        # overwrite: the manifest is the commit point — a crash between
        # this write and the manifest write leaves an orphan dir the
        # replay must be able to rewrite
        self._bucketed(batch).write.mode("overwrite").parquet(
            f"{self.path}/{delta}"
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
        (
            self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])
            .write.mode("overwrite")
            .parquet(f"{self.path}/{new_base}")
        )
        old = paths
        m["base"], m["deltas"] = new_base, []
        self._write_manifest(m)
        for p in old:
            shutil.rmtree(f"{self.path}/{p}", ignore_errors=True)
        self._gc_unreferenced(m)

    def _gc_unreferenced(self, m: dict) -> None:
        """Remove generation dirs no manifest references — a crash between
        a compaction's parquet writes and its manifest commit leaves an
        orphan base/g{N} the retried stream never revisits (the replayed
        batch no-ops on the batch_id guard). The manifest is the only
        commit point, so after a successful commit anything else on disk
        is garbage; update/_compact run sequentially inside foreachBatch,
        so no write is in flight here."""
        referenced = {p for p in [m["base"], *m["deltas"]] if p}
        for sub in ("base", "delta"):
            d = f"{self.path}/{sub}"
            if not os.path.isdir(d):
                continue
            for g in os.listdir(d):
                if f"{sub}/{g}" not in referenced:
                    shutil.rmtree(f"{d}/{g}", ignore_errors=True)

    # -- reads ---------------------------------------------------------------

    def _frames(self) -> DataFrame:
        m = self._manifest()
        paths = ([m["base"]] if m["base"] else []) + m["deltas"]
        if not paths:
            raise LookupError("continuous ANN index is empty")
        return self.spark.read.parquet(*[f"{self.path}/{p}" for p in paths])

    def near_dups_of(
        self, batch: DataFrame, *, threshold: float, exclude_self: bool = False
    ) -> DataFrame:
        """Ids of ``batch`` vectors whose cosine against some ALREADY
        INDEXED vector exceeds ``threshold`` — candidates restricted to
        shared LSH buckets (the same equi-join shape as the batch
        ``embedding_near_dup_pairs``), exact cosine on candidates.
        Returns ``(id, nbr, cosine)`` with the best (cosine desc, nbr
        asc) indexed match per batch id. Empty result if the index has no
        generations yet. ``exclude_self`` drops matches where the indexed
        id equals the batch id (a replayed batch meeting its own accepted
        copies)."""
        from pyspark.sql import Window

        try:
            idx = self._frames()
        except LookupError:
            b = self._bucketed(batch)
            return b.select(
                F.col("id"), F.col("id").alias("nbr"), F.lit(0.0).alias("cosine")
            ).where(F.lit(False))
        b = self._bucketed(batch).select(
            F.col("id").alias("__qid"), F.col("v").alias("__qv"), "t", "bucket"
        )
        cand = b.join(idx, ["t", "bucket"]).dropDuplicates(["__qid", "id"])
        if exclude_self:
            cand = cand.where(F.col("__qid") != F.col("id"))
        scored = cand.select(
            F.col("__qid").alias("id"),
            F.col("id").alias("nbr"),
            F.round(cosine_similarity(F.col("__qv"), F.col("v")), 6).alias(
                "cosine"
            ),
        ).where(F.col("cosine") > threshold)
        w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nbr"))
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def query_df(
        self, query_vec: list[float], k: int = 10, *, probes: int = 1
    ) -> DataFrame:
        """Top-k bucket mates of ``query_vec`` by exact cosine —
        ``(id, cosine)``, deterministic (cosine desc, id asc) order. The
        (t, bucket) disjunction pushes down to the parquet scan, so the
        read touches candidate buckets only. ``probes > 1`` additionally
        probes each table's Hamming-1 neighbors of the smallest-
        |projection| planes (the multi-probe recall knob — more literal
        (t, bucket) pairs in the SAME pushed-down disjunction, zero
        extra index state; vs raising num_tables, which re-shuffles and
        re-stores the whole index)."""
        if not 1 <= probes <= self.num_planes + 1:
            raise ValueError(
                f"probes must lie in [1, num_planes+1], got {probes}"
            )
        buckets = _query_buckets(
            list(query_vec),
            num_planes=self.num_planes,
            num_tables=self.num_tables,
            probes=probes,
        )
        cond = None
        for t, bs in enumerate(buckets):
            for b in bs:
                c = (F.col("t") == t) & (F.col("bucket") == b)
                cond = c if cond is None else (cond | c)
        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self._frames()
            .where(cond)
            .dropDuplicates(["id"])  # multi-table collisions carry equal vectors
            .select(
                "id",
                F.round(cosine_similarity(F.col("v"), qlit), 6).alias("cosine"),
            )
            .orderBy(F.col("cosine").desc(), F.col("id"))
            .limit(k)
        )
