"""Experiment analysis: CUPED variance-reduced treatment-effect means.

Extension beyond the reference surface (north star operators). CUPED
(Controlled-experiment Using Pre-Experiment Data, Deng et al. WSDM'13) is
the standard A/B-testing variance-reduction technique: regress the
experiment-period metric Y on the pre-period covariate X and analyze the
residualized metric

    Y* = Y - θ·(X - mean(X)),   θ = cov(X, Y) / var(X)

which leaves every treatment-effect estimate unbiased (X predates the
assignment) while shrinking variance by the squared X-Y correlation —
often 40-60% for revenue-style metrics, i.e. the same sensitivity from
half the traffic.

Determinism/portability: all sums accumulate as exact DECIMALs (the
``sum_by_key`` convention); θ and the means are then a FIXED sequence of
IEEE double ops (one cast per exact quantity, one division, one multiply,
one subtract), so a SQL oracle replays them bit-for-bit. θ uses the
computational identity n·Σxy − Σx·Σy over n·Σx² − (Σx)², evaluated in
decimals (exact) before the single double division.

Scale shape (100 TB of raw events): one map-side-combined groupBy to the
per-unit frame (units ≪ events), ONE global 1-row moment aggregate
(broadcast), one per-variant aggregate — variant cardinality is 2-ish, so
nothing after the per-unit reduction is larger than the variant count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cuped_adjusted_means(
    units: DataFrame,
    *,
    variant: str = "variant",
    x: str = "x",
    y: str = "y",
    decimals: int = 2,
) -> DataFrame:
    """Per-variant raw and CUPED-adjusted metric means.

    ``units`` has one row per experiment unit: ``variant`` (any groupable
    type), pre-period covariate ``x`` and experiment metric ``y`` (numeric;
    cast to DECIMAL(18, ``decimals``) — pass the native currency/metric
    granularity so the cast is exact). θ is pooled across variants (the
    standard CUPED estimator; X predates assignment so pooling is safe).
    A zero pre-period variance degenerates to θ=0, i.e. no adjustment.

    Returns (variant, n_units, mean_y, mean_y_adj, theta) — theta repeated
    per row for auditability; means rounded to 6 places.
    """
    d = f"decimal(18,{decimals})"
    u = units.select(
        F.col(variant).alias("__v"),
        F.col(x).cast(d).alias("__x"),
        F.col(y).cast(d).alias("__y"),
    )
    # SUMS accumulate as exact decimals (order-independent); the moment
    # ARITHMETIC then runs in IEEE doubles — one cast per exact sum, then
    # a fixed op sequence both engines execute identically. Doing the
    # products in decimal instead would hit the DECIMAL(38) precision cap,
    # whose scale-adjustment rules differ across engines.
    g = u.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        # decimal(38,4): a (24,4) intermediate overflows to NULL (non-ANSI
        # Spark) once |x| exceeds ~1e10 and F.sum would silently skip those
        # rows — (38,4) holds any decimal(18,s)^2 product exactly and both
        # engines agree on the width (r07 ADVICE #3)
        F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,4)")).alias("__sxx"),
        F.sum((F.col("__x") * F.col("__y")).cast("decimal(38,4)")).alias("__sxy"),
    )
    per_v = u.groupBy("__v").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__x").alias("__sxv"),
        F.sum("__y").alias("__syv"),
    )
    nd = F.col("__n").cast("double")
    sxd = F.col("__sx").cast("double")
    syd = F.col("__sy").cast("double")
    num = nd * F.col("__sxy").cast("double") - sxd * syd
    den = nd * F.col("__sxx").cast("double") - sxd * sxd
    theta = F.when(den != 0.0, num / den).otherwise(F.lit(0.0))
    mean_x_all = F.col("__sx").cast("double") / F.col("__n").cast("double")
    mean_y_v = F.col("__syv").cast("double") / F.col("n_units").cast("double")
    mean_x_v = F.col("__sxv").cast("double") / F.col("n_units").cast("double")
    return (
        per_v.crossJoin(F.broadcast(g))
        .select(
            F.col("__v").alias(variant),
            "n_units",
            F.round(mean_y_v, 6).alias("mean_y"),
            F.round(mean_y_v - theta * (mean_x_v - mean_x_all), 6).alias(
                "mean_y_adj"
            ),
            F.round(theta, 6).alias("theta"),
        )
    )
