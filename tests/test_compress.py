"""Compressed-text ingestion (functions/compress.py): real stdlib codecs,
lossless round-trips, honest failure on unavailable codecs."""

from __future__ import annotations

import pytest

from proxima_platform_spark.functions.compress import (
    _codec_fns,
    compress_text,
    decompress_text,
)

TEXTS = [
    (1, "plain ascii text with words"),
    (2, ""),
    (3, "unicode: přístupová data — 多模态 🚀"),
    (4, "x" * 10_000),  # highly compressible
    (5, "line one\nline two\ttabbed\r\nwindows line"),
]


class TestCodecFns:
    @pytest.mark.parametrize("codec", ["gzip", "zlib", "bz2", "lzma"])
    def test_round_trip_bytes(self, codec):
        comp, decomp = _codec_fns(codec, 6)
        for _, t in TEXTS:
            b = t.encode("utf-8")
            assert decomp(comp(b)) == b

    def test_gzip_is_real_gzip(self):
        # interoperability: the blob must open with the stdlib gzip module
        import gzip as gz
        import io

        comp, _ = _codec_fns("gzip", 6)
        blob = comp(b"hello warc world")
        assert blob[:2] == b"\x1f\x8b"  # gzip magic
        assert gz.GzipFile(fileobj=io.BytesIO(blob)).read() == b"hello warc world"

    def test_unknown_and_missing_codecs(self):
        with pytest.raises(ValueError, match="unknown codec"):
            _codec_fns("snappy", 6)
        try:
            import zstandard  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError, match="zstandard package"):
                _codec_fns("zstd", 6)


class TestSparkRoundTrip:
    @pytest.mark.parametrize("codec", ["gzip", "bz2"])
    def test_compress_decompress_identity(self, spark, codec):
        df = spark.createDataFrame(TEXTS, "doc_id long, text string")
        blobs = compress_text(df, codec=codec)
        back = decompress_text(blobs, codec=codec)
        got = {r.doc_id: r.text for r in back.collect()}
        assert got == dict(TEXTS)

    def test_stages_are_narrow(self, spark):
        from proxima_platform_spark.plans import count_exchanges

        df = spark.createDataFrame(TEXTS, "doc_id long, text string")
        out = decompress_text(compress_text(df))
        assert count_exchanges(out) == 0
