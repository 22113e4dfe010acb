"""Multimodal plumbing: binary payload columns through mapInPandas stages
(decode kernels are deterministic fakes — functions/multimodal.py; the
schema/batching/partitioning is the real contract)."""

from pyspark.sql import functions as F

from proxima_platform_spark.functions.multimodal import (
    audio_features,
    frame_sample,
    image_features,
    image_resize,
)


def media_df(spark, n=5, duration_ms=3000):
    rows = [(i, f"payload-{i}".encode() * 4, duration_ms) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, duration_ms long"
    )


class TestImagePipeline:
    def test_features_shape_and_determinism(self, spark):
        df = media_df(spark)
        out = image_features(df).orderBy("doc_id").collect()
        assert len(out) == 5
        assert all(r.width == 4 and r.height == 4 for r in out)
        out2 = image_features(df).orderBy("doc_id").collect()
        assert [r.features for r in out] == [r.features for r in out2]

    def test_resize_output_shape(self, spark):
        df = media_df(spark)
        out = image_resize(df, width=8, height=2).collect()
        assert all(r.width == 8 and r.height == 2 for r in out)
        assert all(len(bytes(r.payload)) == 16 for r in out)


class TestAudioVideo:
    def test_frame_sample_count(self, spark):
        df = media_df(spark, duration_ms=3500)
        out = frame_sample(df, every_ms=1000).groupBy("doc_id").count().collect()
        assert all(r["count"] == 4 for r in out)  # ts 0,1000,2000,3000

    def test_audio_window_energy(self, spark):
        df = media_df(spark, duration_ms=3000)
        out = audio_features(df, window_ms=1000).collect()
        assert all(r.n_windows == 3 and len(r.energy) == 3 for r in out)
