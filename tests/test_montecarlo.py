"""Monte-carlo trials comparison (SURVEY §2.4 'mean over trials' + §5):
mRSC (two metrics, shorter pre-period) vs RSC (one metric), mirroring
testScriptMultiSynthControlSVD.py:290-320 at reduced scale. The trial
RMSEs land in a trials DataFrame aggregated with groupBy().avg — the
reference's monte-carlo reduction as a relational op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tslib_spark.kernels.rsc import control_weights, prepare_panel, rsc_fit


def _trial(spark, seed, n_donors=25, n_times=24, rank=3):
    rng = np.random.default_rng(seed)
    combo = rng.dirichlet(np.ones(n_donors))
    metrics = []
    for _ in range(2):
        rowp, colp = rng.normal(size=(n_donors, rank)), rng.normal(size=(rank, n_times))
        donors_mean = rowp @ colp
        donors = donors_mean + rng.normal(0, 0.5, donors_mean.shape)
        treated_mean = combo @ donors_mean
        treated = treated_mean + rng.normal(0, 0.5, n_times)
        metrics.append((donors, treated, treated_mean))
    pre = n_times // 2
    units = [f"u{d}" for d in range(n_donors)]

    def fit_weights(panel_rows, m_order, m_weights, M):
        pdf = pd.DataFrame(panel_rows, columns=["unit", "t", "metric", "value"])
        prepared = prepare_panel(
            spark.createDataFrame(pdf), "unit", "t", "value",
            metric_col="metric", metric_order=m_order, metric_weights=m_weights, n_times=pre,
        )
        fit = rsc_fit(prepared, "treated", units, singvals=rank, M=M)
        w = control_weights(fit, units).toPandas().set_index("unit").loc[units]["weight"].to_numpy()
        return w

    def rows_for(metric_ids):
        rows = []
        for mi in metric_ids:
            donors, treated, _ = metrics[mi]
            for d, u in enumerate(units):
                rows += [(u, t, f"m{mi}", float(donors[d, t])) for t in range(pre)]
            rows += [("treated", t, f"m{mi}", float(treated[t])) for t in range(pre)]
        return rows

    out = {}
    w_mrsc = fit_weights(rows_for([0, 1]), ["m0", "m1"], [1.0, 1.0], 2 * pre)
    w_rsc = fit_weights(rows_for([0]), ["m0"], [1.0], pre)
    donors, _, treated_mean = metrics[0]
    for name, w in (("mrsc", w_mrsc), ("rsc", w_rsc)):
        pred = w @ donors[:, pre:]
        out[name] = float(np.sqrt(np.mean((pred - treated_mean[pre:]) ** 2)))
    return out


@pytest.mark.slow
def test_mrsc_beats_rsc_on_average(spark):
    trials = []
    for seed in range(6):
        r = _trial(spark, seed=100 + seed)
        trials.append(("mrsc", seed, r["mrsc"]))
        trials.append(("rsc", seed, r["rsc"]))
    tdf = spark.createDataFrame(pd.DataFrame(trials, columns=["method", "trial", "rmse"]))
    means = (
        tdf.groupBy("method").agg(F.avg("rmse").alias("mean_rmse")).toPandas().set_index("method")
    )
    # with the same pre-period per metric, the second metric's donor pool
    # information should not hurt and typically helps (mRSC's claim)
    assert means.loc["mrsc", "mean_rmse"] < means.loc["rsc", "mean_rmse"] * 1.15
    assert means.loc["mrsc", "mean_rmse"] < 1.0
