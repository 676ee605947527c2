"""The reference's real-data case studies, end-to-end on this engine.

Runs the exact published configurations on the reference's own public
datasets (read-only from /root/reference/tests/testdata):

- Abadie Basque GDP (testScriptSynthControlSVD.py:29-101): drop Spain,
  treat 'Basque Country (Pais Vasco)', train 1955-1970, singvals=1.
- CDC Prop 99 (testScriptSynthControlSVD.py:103-176): cigarette pack
  sales per capita, treat California, train 1970-1988, singvals=3.
- ALS variant (testScriptSynthControlALS.py): same pipeline with the
  weighted-ALS kernel.

The reference scripts print plots, not goldens, so assertions are
(a) exact weight parity vs the driver-side pandas kernel on the same
panel, and (b) the studies' published directional findings: the treated
unit's observed outcome falls below its synthetic control after the
intervention (ETA conflict / Prop 99 tax)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tslib_spark.kernels.svd_kernel import ModelConfig, _fit_group
from tslib_spark.kernels.rsc import control_weights, prepare_panel, rsc_fit, rsc_predict

BASQUE = "/root/reference/tests/testdata/basque.csv"
PROP99 = "/root/reference/tests/testdata/prop99.csv"


def _fit_and_predict(spark, panel_pdf, treated, train_end, test_end, singvals, method="svd"):
    """Shared pipeline: tidy panel pandas → Spark RSC fit → counterfactual."""
    donors = sorted(u for u in panel_pdf["unit"].unique() if u != treated)
    panel = spark.createDataFrame(panel_pdf)
    train = panel.filter(F.col("t") < train_end)
    n_train = panel_pdf.loc[panel_pdf["t"] < train_end, "t"].nunique()
    prepared = prepare_panel(train, "unit", "t", "value")
    fit = rsc_fit(prepared, treated, donors, singvals=singvals, M=n_train, method=method, als_seed=7)
    w = control_weights(fit, donors)
    test = panel.filter((F.col("t") >= train_end) & (F.col("t") < test_end))
    pred = (
        rsc_predict(test, w, "unit", "t", "value")
        .toPandas()
        .sort_values("t")
        .set_index("t")["prediction"]
    )
    actual = (
        panel_pdf[(panel_pdf["unit"] == treated)
                  & (panel_pdf["t"] >= train_end) & (panel_pdf["t"] < test_end)]
        .sort_values("t")
        .set_index("t")["value"]
    )
    weights = w.toPandas().set_index("unit").loc[donors]["weight"].to_numpy()
    return donors, weights, pred, actual


def _oracle_weights(panel_pdf, treated, donors, train_end, singvals):
    """Driver-side pandas kernel on the identical training panel."""
    train = panel_pdf[panel_pdf["t"] < train_end]
    years = sorted(train["t"].unique())
    rank = {y: i for i, y in enumerate(years)}
    tidy = pd.DataFrame(
        {
            "group_id": "panel",
            "series_key": train["unit"],
            "bucket_idx": train["t"].map(rank).astype(np.int64),
            "value": train["value"].astype(np.float64),
        }
    )
    cfg = ModelConfig(
        target_key=treated, N=1, M=len(years), k=singvals,
        donor_keys=tuple(donors), include_past_only=False,
    )
    out = _fit_group(tidy, cfg)
    return out[out["kind"] == "weight"].sort_values("idx")["value"].to_numpy()


@pytest.fixture(scope="module")
def basque_panel():
    df = pd.read_csv(BASQUE)
    df = df[df["regionname"] != "Spain (Espana)"]
    return pd.DataFrame(
        {"unit": df["regionname"], "t": df["year"].astype(int), "value": df["gdpcap"]}
    )


def test_basque_case_study(spark, basque_panel):
    treated = "Basque Country (Pais Vasco)"
    donors, weights, pred, actual = _fit_and_predict(
        spark, basque_panel, treated, train_end=1971, test_end=1998, singvals=1
    )
    want = _oracle_weights(basque_panel, treated, donors, 1971, 1)
    np.testing.assert_allclose(weights, want, atol=1e-8)
    # the published finding: post-1975 the synthetic control exceeds the
    # observed Basque GDP (the conflict's economic cost)
    post = pred.index >= 1975
    assert (pred[post] - actual[post]).mean() > 0.2
    # the gap grows as the effect compounds (divergence already visible
    # 1971-74 — the conflict began ~1970)
    early_gap = (pred[pred.index < 1975] - actual[actual.index < 1975]).mean()
    late_gap = (pred[pred.index >= 1985] - actual[actual.index >= 1985]).mean()
    assert 0 < early_gap < late_gap


def test_prop99_case_study(spark):
    df = pd.read_csv(PROP99)
    df = df[df["SubMeasureDesc"] == "Cigarette Consumption (Pack Sales Per Capita)"]
    panel_pdf = (
        df.groupby(["LocationDesc", "Year"])["Data_Value"].mean().reset_index()
        .rename(columns={"LocationDesc": "unit", "Year": "t", "Data_Value": "value"})
    )
    panel_pdf = panel_pdf[(panel_pdf["t"] >= 1970) & (panel_pdf["t"] < 2015)]
    treated = "California"
    donors, weights, pred, actual = _fit_and_predict(
        spark, panel_pdf, treated, train_end=1989, test_end=2015, singvals=3
    )
    want = _oracle_weights(panel_pdf, treated, donors, 1989, 3)
    np.testing.assert_allclose(weights, want, atol=1e-8)
    # the published finding: observed CA pack sales fall well below the
    # synthetic control after the 1988 tax
    assert (pred - actual).mean() > 5.0
    assert (pred[pred.index >= 2000] - actual[actual.index >= 2000]).mean() > 15.0


def test_basque_als_variant(spark, basque_panel):
    """testScriptSynthControlALS's Basque pipeline (its published config:
    modelType='als', singvals=1, :47/:81). The ALS counterfactual must
    agree with the SVD one in direction and broadly in level."""
    treated = "Basque Country (Pais Vasco)"
    _, _, pred_svd, actual = _fit_and_predict(
        spark, basque_panel, treated, train_end=1971, test_end=1998, singvals=1
    )
    _, _, pred_als, _ = _fit_and_predict(
        spark, basque_panel, treated, train_end=1971, test_end=1998, singvals=1,
        method="als",
    )
    # the ALS script prints plots and asserts nothing; what the algorithm
    # guarantees (and what we assert) is a finite, stable counterfactual in
    # the same ballpark as the SVD one. Under a deterministic seed the
    # ALS-k1 weights differ from SVD-k1 (the reference clips the ALS
    # estimate to observed [min,max], raising its rank, and then takes a
    # FULL pinv where the SVD path takes a k-truncated one — tsALSModel.py
    # :63,:82-83 vs tsSVDModel.py:84-93), so the two counterfactuals agree
    # loosely, not exactly.
    assert np.isfinite(pred_als.to_numpy()).all()
    # ALS counterfactual stays in the realistic GDP band of this panel
    assert pred_als.between(2.0, 14.0).all()
    assert float(np.sqrt(np.mean((pred_als - pred_svd) ** 2))) < 5.0
    # pre-intervention the ALS control tracks the observed series closely
    pre = pred_als.index < 1975
    assert abs((pred_als[pre] - actual[pre]).mean()) < 0.5
