"""Compressed-text columns: the ingestion shape of web-scale corpora.

Extension beyond the reference surface (north star). Crawl-derived corpora
(WARC/WET shards, news dumps) arrive as per-record compressed blobs; a
100 TB pipeline decompresses them as a *narrow* stage feeding the text
operators — never as a driver-side preprocessing pass.

Codec tier (all python-stdlib, no external packages):

* ``gzip`` — zlib with the gzip wrapper (wbits=31), the WARC/WET standard;
* ``zlib`` — raw RFC 1950 stream;
* ``bz2`` / ``lzma`` — stdlib modules (lzma covers .xz).

zstd is the one common corpus codec with no stdlib module; it is gated
behind an import-try and raises a clear error when the package is absent.

Scale shape: both directions are Arrow-batched ``mapInPandas`` stages with
explicit column projection — no shuffle, output inherits input
partitioning, per-task memory bounded by the Arrow batch size. Compression
level trades CPU for shuffle/storage bytes exactly like any columnar
codec choice.
"""

from __future__ import annotations

import bz2
import lzma
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _codec_fns(codec: str, level: int):
    if codec == "gzip":
        # wbits=31: gzip header+trailer on compress AND decompress
        def _gz(b: bytes) -> bytes:
            co = zlib.compressobj(level, zlib.DEFLATED, 31)
            return co.compress(b) + co.flush()

        return _gz, lambda b: zlib.decompress(b, wbits=31)
    if codec == "zlib":
        return lambda b: zlib.compress(b, level), lambda b: zlib.decompress(b)
    if codec == "bz2":
        return lambda b: bz2.compress(b, max(1, level)), bz2.decompress
    if codec == "lzma":
        return lambda b: lzma.compress(b), lzma.decompress
    if codec == "zstd":
        try:
            import zstandard  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "codec 'zstd' requires the zstandard package (not installed); "
                "use gzip/zlib/bz2/lzma or install zstandard"
            ) from e
        c = zstandard.ZstdCompressor(level=level)
        d = zstandard.ZstdDecompressor()
        return c.compress, d.decompress
    raise ValueError(f"unknown codec {codec!r}")


def compress_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "payload",
    codec: str = "gzip",
    level: int = 6,
) -> DataFrame:
    """Compress a text column into per-record binary blobs (UTF-8 →
    ``codec``). Narrow Arrow stage; output = (id, payload)."""
    _codec_fns(codec, level)  # validate codec eagerly, driver-side

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp_, _ = _codec_fns(codec, level)  # per-task: codec objs don't pickle
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [comp_((t or "").encode("utf-8")) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        stage, schema=f"{id_col} long, {out_col} binary"
    )


def decompress_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_col: str = "text",
    codec: str = "gzip",
) -> DataFrame:
    """Decompress per-record binary blobs back to a text column — the
    ingestion stage a WARC/WET-shaped corpus runs before any text operator.
    Narrow Arrow stage; output = (id, text)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _, decomp = _codec_fns(codec, 6)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: [
                        decomp(bytes(p)).decode("utf-8") for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        stage, schema=f"{id_col} long, {out_col} string"
    )
