"""Property-based changelog-semantics tests: the Spark snapshot compaction
must agree with a direct Python model of the reference semantics
(SURVEY §2.10 items 1-3 — compaction key, wildcard tombstones, seq
tiebreak; ref PCollectionTools.java:42-66,
LocalCachedPartitionedView.java:99-121,268-286,
TimeBoundedVersionedCache.java:214) on arbitrary interleavings."""

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from proxima_platform_spark import snapshot, to_changelog


def ts(ms):
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc)


def base_of(attr: str) -> str:
    return attr.split(".", 1)[0] + ".*" if "." in attr else attr


def model_snapshot(elements, at_ms=None):
    """Pure-python reference model of snapshot() semantics."""
    if at_ms is not None:
        elements = [e for e in elements if e["stamp"] <= at_ms]
    winners = {}
    for e in elements:
        k = (e["key"], e["attribute"])
        cur = winners.get(k)
        if cur is None or (e["stamp"], e["seq"]) > (cur["stamp"], cur["seq"]):
            winners[k] = e
    tombs = {}
    for e in elements:
        if e["delete_wildcard"]:
            k = (e["key"], base_of(e["attribute"]))
            tombs[k] = max(tombs.get(k, -1), e["stamp"])
    out = {}
    for (key, attr), w in winners.items():
        if w["delete"] or w["delete_wildcard"]:
            continue
        t = tombs.get((key, base_of(attr)))
        if t is not None and w["stamp"] < t:
            continue
        out[(key, attr)] = (w["stamp"], w["value"])
    return out


# element generator: few keys/attributes so collisions/overwrites are common
KEYS = ["k1", "k2"]
ATTRS = ["status", "device.a", "device.b"]

element_st = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(ATTRS + ["device.*"]),  # device.* rows become tombstones
    st.integers(min_value=0, max_value=5),  # stamp ms — ties are likely
    st.sampled_from(["upsert", "delete"]),
)


def to_elements(raw):
    out = []
    for i, (key, attr, stamp, kind) in enumerate(raw):
        is_tomb = attr == "device.*"
        out.append(
            {
                "key": key,
                "attribute": attr,
                "stamp": stamp,
                "seq": i,  # arrival order = unique tiebreak
                "delete": kind == "delete" or is_tomb,
                "delete_wildcard": is_tomb,
                "value": None if kind == "delete" or is_tomb else f"v{i}",
            }
        )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(element_st, min_size=1, max_size=25))
def test_snapshot_matches_model(spark, raw):
    elements = to_elements(raw)
    df = spark.createDataFrame(
        [
            (
                e["key"], e["attribute"], ts(e["stamp"]), e["seq"],
                e["delete"], e["delete_wildcard"],
                e["value"].encode() if e["value"] else None,
            )
            for e in elements
        ],
        "key string, attr string, stamp timestamp, seq long, "
        "del boolean, delw boolean, val binary",
    )
    clog = to_changelog(
        df, entity="e", key="key", attribute="attr", stamp="stamp",
        seq_id="seq", delete="del", delete_wildcard="delw", value="val",
    )
    got = {
        (r.key, r.attribute): (
            int(r.stamp.timestamp() * 1000),
            bytes(r.value).decode() if r.value is not None else None,
        )
        for r in snapshot(clog).collect()
    }
    assert got == model_snapshot(elements)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    raw=st.lists(element_st, min_size=1, max_size=15),
    at_ms=st.integers(min_value=0, max_value=5),
)
def test_snapshot_time_travel_matches_model(spark, raw, at_ms):
    elements = to_elements(raw)
    df = spark.createDataFrame(
        [
            (
                e["key"], e["attribute"], ts(e["stamp"]), e["seq"],
                e["delete"], e["delete_wildcard"],
                e["value"].encode() if e["value"] else None,
            )
            for e in elements
        ],
        "key string, attr string, stamp timestamp, seq long, "
        "del boolean, delw boolean, val binary",
    )
    clog = to_changelog(
        df, entity="e", key="key", attribute="attr", stamp="stamp",
        seq_id="seq", delete="del", delete_wildcard="delw", value="val",
    )
    got = {
        (r.key, r.attribute): (
            int(r.stamp.timestamp() * 1000),
            bytes(r.value).decode() if r.value is not None else None,
        )
        for r in snapshot(clog, at=F.lit(ts(at_ms))).collect()
    }
    assert got == model_snapshot(elements, at_ms=at_ms)


# --- paragraph dedup vs python model (r04) ---------------------------------

_para_st = st.sampled_from(
    ["alpha beta", "gamma", "delta epsilon zeta", "  padded  ", "", " ", "x"]
)
_doc_st = st.lists(_para_st, min_size=0, max_size=6).map("\n".join)


def model_dedup_paragraphs(docs: dict[int, str]) -> dict[int, tuple]:
    """Pure-python model: space-only trim, drop blanks, corpus-wide first
    occurrence by (doc_id, position), reassemble survivors in order."""
    paras_by_doc = {}
    winner: dict[str, tuple] = {}
    for did in sorted(docs):
        ps = [p.strip(" ") for p in docs[did].split("\n")]
        ps = [p for p in ps if p]
        paras_by_doc[did] = ps
        for pos, p in enumerate(ps):
            if p not in winner or (did, pos) < winner[p]:
                winner[p] = (did, pos)
    return {
        did: (
            len(ps),
            sum(1 for pos, p in enumerate(ps) if winner[p] == (did, pos)),
            "\n".join(p for pos, p in enumerate(ps) if winner[p] == (did, pos)),
        )
        for did, ps in paras_by_doc.items()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc_st, min_size=1, max_size=8))
def test_dedup_paragraphs_matches_model(spark, texts):
    from proxima_platform_spark.functions.dedup import dedup_paragraphs

    docs = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_para, r.n_kept, r.text_dedup)
        for r in dedup_paragraphs(df).collect()
    }
    assert got == model_dedup_paragraphs(docs)


# --- WAV codec round-trip (r04) --------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=200
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_codec_round_trips(samples, rate):
    import numpy as np

    from proxima_platform_spark.functions.multimodal import decode_wav, encode_wav

    arr = np.asarray(samples, dtype=np.int16)
    got, got_rate = decode_wav(encode_wav(arr, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(got, arr)


# ---------------------------------------------------------------------------
# late-r04 primitives: CMS merge algebra, vacuum invariant, Morton bijection
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(0, 59),
)
def test_cms_merge_split_invariant(spark, rows, cut):
    """CMS(A ⊎ B) == merge(CMS(A), CMS(B)) for ANY split point — the
    algebra that makes per-partition / per-micro-batch builds sound."""
    from proxima_platform_spark.functions.sketch import cms_build, cms_merge

    cut = min(cut, len(rows))
    schema = "k long, t string"
    full = spark.createDataFrame(rows, schema)
    a = rows[:cut] or [(99, "pad")]
    b = rows[cut:] or [(99, "pad")]
    pad = [(99, "pad")] if (not rows[:cut] or not rows[cut:]) else []
    whole = spark.createDataFrame(rows + pad, schema)
    m = cms_merge(
        cms_build(spark.createDataFrame(a, schema), ["k", "t"], width=64, depth=3),
        cms_build(spark.createDataFrame(b, schema), ["k", "t"], width=64, depth=3),
    ).collect()[0]
    u = cms_build(whole, ["k", "t"], width=64, depth=3).collect()[0]
    assert dict(m.cells) == dict(u.cells)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=st.lists(element_st, min_size=1, max_size=25), k=st.integers(1, 3))
def test_vacuum_preserves_snapshot(spark, raw, k):
    """snapshot(vacuum_changelog(c, k)) == snapshot(c) for ANY changelog
    and ANY keep_versions ≥ 1 — the retention invariant, property-scale."""
    from proxima_platform_spark.changelog import vacuum_changelog

    elements = to_elements(raw)
    df = spark.createDataFrame(
        [
            (
                e["key"],
                e["attribute"],
                e["seq"],
                ts(e["stamp"]),
                e["value"],
                e["delete"],
                e["delete_wildcard"],
            )
            for e in elements
        ],
        "k string, a string, seq long, t timestamp, v string, d boolean, dw boolean",
    )
    clog = to_changelog(
        df, entity="e", key="k", attribute="a", stamp="t",
        value=F.encode("v", "UTF-8"), seq_id="seq", delete=F.col("d"),
        delete_wildcard=F.col("dw"),
    )
    kept = vacuum_changelog(clog, keep_versions=k)
    a = sorted(
        (r.key, r.attribute, bytes(r.value) if r.value is not None else None)
        for r in snapshot(clog).collect()
    )
    b = sorted(
        (r.key, r.attribute, bytes(r.value) if r.value is not None else None)
        for r in snapshot(kept).collect()
    )
    assert a == b


def test_morton_key_is_a_bijection_on_16bit_pairs():
    """The pure-python mirror of the spread steps inverts uniquely on a
    dense sample — no two (a, b) pairs share a key (driver-side check of
    the spec the Spark expressions implement)."""
    def spread(x):
        x &= 0xFFFF
        for shift, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
            x = (x | (x << shift)) & mask
        return x

    seen = {}
    for a in range(0, 256, 7):
        for b in range(0, 256, 11):
            z = spread(a) | (spread(b) << 1)
            assert z not in seen, (a, b, seen[z])
            seen[z] = (a, b)
