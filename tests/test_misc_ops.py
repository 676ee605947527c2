"""As-of join, ALS kernel path, distributed generators."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from tslib_spark.datagen.spark_series import harmonics_df, hide_values_df, trend_df
from tslib_spark.kernels import linalg
from tslib_spark.kernels.svd_kernel import ModelConfig, fit_transform
from tslib_spark.operators.asof import asof_join


def test_asof_join_matches_merge_asof(spark):
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 200),
            "lt": rng.integers(0, 1000, 200),
            "lval": rng.normal(size=200),
        }
    ).sort_values("lt").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 50),
            "rt": rng.integers(0, 1000, 50),
            "price": rng.normal(size=50),
        }
    ).sort_values("rt").reset_index(drop=True)
    # dedupe equal (k, rt) pairs — merge_asof picks the last, window picks
    # by arbitrary intra-ts order; identical after dedupe
    right = right.drop_duplicates(["k", "rt"], keep="last")

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "lt",
            "rt",
            ["price"],
        )
        .toPandas()
        .sort_values(["k", "lt", "lval"])
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("lt"),
            right.sort_values("rt"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction="backward",
        )
        .sort_values(["k", "lt", "lval"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got["price"].to_numpy(dtype=float), want["price"].to_numpy(dtype=float), equal_nan=True
    )


def test_als_kernel_path(spark):
    rng = np.random.default_rng(6)
    N, M, k = 10, 30, 2
    latent = np.outer(rng.normal(size=N), rng.normal(size=M)) + np.outer(
        rng.normal(size=N), rng.normal(size=M)
    )
    series = latent.flatten("F")
    hidden = series.copy()
    miss = rng.random(series.size) < 0.2
    hidden[miss] = np.nan

    pdf = pd.DataFrame(
        {
            "group_id": "g",
            "series_key": "t1",
            "bucket_idx": np.arange(series.size, dtype=np.int64),
            "value": hidden,
        }
    )
    cfg = ModelConfig(target_key="t1", N=N, M=M, k=k, method="als", als_seed=7)
    out = fit_transform(spark.createDataFrame(pdf), cfg).toPandas()
    imputed = out[out["kind"] == "imputed"].sort_values("idx")["value"].to_numpy()
    # ALS recovers the low-rank truth on observed AND hidden entries
    assert linalg.rmse(imputed, series) < 0.2
    assert linalg.rmse(imputed[miss], series[miss]) < 0.5
    weights = out[out["kind"] == "weight"]
    assert len(weights) == N - 1


def test_distributed_generators_match_numpy(spark):
    from tslib_spark.datagen.series import generate_harmonics, generate_trend

    T = 2000
    got = (
        harmonics_df(spark, T, [-2.0, 3.0], [26.0, 30.0], [-2.5], [16.0])
        .orderBy("bucket_idx")
        .toPandas()["value"]
        .to_numpy()
    )
    want = generate_harmonics([-2.0, 3.0], [26.0, 30.0], [-2.5], [16.0], T)
    np.testing.assert_allclose(got, want, atol=1e-12)

    got_t = trend_df(spark, T).orderBy("bucket_idx").toPandas()["value"].to_numpy()
    want_t = generate_trend(T)
    np.testing.assert_allclose(got_t, want_t, atol=1e-12)


def test_hide_values_deterministic_and_calibrated(spark):
    df = harmonics_df(spark, 10_000, [1.0], [5.0], [], [])
    hidden = hide_values_df(df, p_observe=0.7)
    n_null = hidden.filter("value is null").count()
    assert abs(n_null / 10_000 - 0.3) < 0.02
    again = hide_values_df(df.repartition(13), p_observe=0.7)
    assert again.filter("value is null").count() == n_null


def test_rmse_hidden_corrected_semantics(spark):
    """rmse_hidden computes RMSE(imputed, truth) over the hidden positions
    only — the corrected form of the reference's rmseMissingData
    (tsUtils.py:87-99, which collects the NaNs themselves and returns NaN)."""
    from tslib_spark.functions.scalar import rmse_hidden

    truth = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    obs = truth.copy()
    obs[[1, 3]] = np.nan
    imputed = np.array([1.0, 2.5, 3.0, 3.0, 5.0])  # errors 0.5 and -1.0 at hidden
    pdf = pd.DataFrame({"obs": obs, "imputed": imputed, "truth": truth})
    got = (
        spark.createDataFrame(pdf)
        .agg(rmse_hidden(F.col("obs"), F.col("imputed"), F.col("truth")).alias("r"))
        .collect()[0]["r"]
    )
    want = np.sqrt((0.5**2 + 1.0**2) / 2)
    assert abs(got - want) < 1e-12

    # nothing hidden -> NULL, never NaN-poisoned
    pdf2 = pd.DataFrame({"obs": truth, "imputed": imputed, "truth": truth})
    got2 = (
        spark.createDataFrame(pdf2)
        .agg(rmse_hidden(F.col("obs"), F.col("imputed"), F.col("truth")).alias("r"))
        .collect()[0]["r"]
    )
    assert got2 is None


def test_asof_join_right_tiebreak(spark):
    """Duplicate (key, ts) right rows resolve to the highest tie-break value."""
    left = spark.createDataFrame([(1, 10)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 5, 300.0), (1, 5, 200.0)], "k long, rt long, payload double"
    )
    out = asof_join(
        left, right, ["k"], "lt", "rt", ["payload"], right_tiebreak=["payload"]
    ).collect()
    assert out[0]["payload"] == 300.0
