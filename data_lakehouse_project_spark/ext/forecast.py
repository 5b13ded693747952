"""Per-group time-series smoothing / forecasting.

North-star analytics surface (SURVEY §2.9): the reference stops at
rollups; a warehouse serves "smooth this KPI and project it forward".
Two classical models, both deliberately SEQUENTIAL per series — the
parallelism axis at 100 TB is the GROUP (millions of independent
series), not time, so each series runs in one Arrow batch via
``applyInPandas`` while groups fan out across the cluster:

- **Simple exponential smoothing** (SES): s_t = α·x_t + (1−α)·s_{t−1},
  seeded s_0 = x_0. Exactly reproducible as a recursive CTE, so the
  DuckDB oracle pins it end-to-end (identical double arithmetic in
  identical order).
- **Holt's linear trend**: level/trend recursion plus h-step-ahead
  forecast rows (l_T + h·b_T). Pytest-pinned against an independent
  numpy reference.

Skew note: one series = one task's worth of state (two floats), so a
hot group costs its series LENGTH, not width — pre-aggregate to a
bounded grain (e.g. daily) upstream, as the registry query does.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def ses_smooth(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    val_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Append an SES-smoothed column per group, ordered by ``ts_col``.

    Output: group_cols + (ts_col, val_col, smoothed).
    """
    beta = 1.0 - alpha
    out_fields = ", ".join(
        f"{c} {t}"
        for c, t in df.select(
            *group_cols, ts_col, val_col
        ).dtypes
    )
    schema = f"{out_fields}, smoothed double"

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        s = 0.0
        out = []
        for i, x in enumerate(pdf[val_col]):
            s = float(x) if i == 0 else alpha * float(x) + beta * s
            out.append(s)
        pdf["smoothed"] = out
        return pdf[[*group_cols, ts_col, val_col, "smoothed"]]

    return (
        df.select(*group_cols, ts_col, val_col)
        .groupBy(*group_cols)
        .applyInPandas(_one, schema)
    )


def holt_forecast(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    val_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Holt's linear-trend smoothing + ``horizon`` forecast steps.

    Recursion (seeded l_0 = x_0, b_0 = x_1 − x_0):
        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    Observed rows carry the fitted level; forecast rows (step ≥ 1)
    carry l_T + step·b_T with the ts column null.

    Output: group_cols + (ts_col, step, value, fitted).
    """
    ts_t = dict(df.dtypes)[ts_col]
    g_fields = ", ".join(f"{c} {t}" for c, t in df.select(*group_cols).dtypes)
    schema = f"{g_fields}, {ts_col} {ts_t}, step int, value double, fitted double"

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        xs = [float(v) for v in pdf[val_col]]
        lvl, trd = xs[0], (xs[1] - xs[0]) if len(xs) > 1 else 0.0
        fitted = [lvl]
        for x in xs[1:]:
            prev = lvl
            lvl = alpha * x + (1.0 - alpha) * (lvl + trd)
            trd = beta * (lvl - prev) + (1.0 - beta) * trd
            fitted.append(lvl)
        rows = {
            c: list(pdf[c]) + [pdf[c].iloc[0]] * horizon for c in group_cols
        }
        rows[ts_col] = list(pdf[ts_col]) + [None] * horizon
        rows["step"] = [0] * len(xs) + list(range(1, horizon + 1))
        rows["value"] = xs + [float("nan")] * horizon
        rows["fitted"] = fitted + [lvl + h * trd for h in range(1, horizon + 1)]
        return pd.DataFrame(rows)

    return (
        df.select(*group_cols, ts_col, val_col)
        .groupBy(*group_cols)
        .applyInPandas(_one, schema)
    )


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    val_col: str,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
    baseline_points: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page 1954):

        S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k))
        S⁻_t = max(0, S⁻_{t−1} − (x_t − μ + k))

    alarm when either statistic exceeds h; k = k_sigma·σ (slack),
    h = h_sigma·σ. μ/σ come from the first ``baseline_points`` of the
    series (the in-control reference period, classic monitoring
    posture) or, when None, the whole series (retrospective
    deviation-from-average posture — note a sustained one-sided shift
    then drags μ and charges the OTHER side's statistic in the stable
    regime, so prefer an explicit baseline for prospective alarms).
    Both are floor-rounded at 6 digits BEFORE the recursion so the
    engine's and the oracle's recursions consume bit-identical
    parameters (the max(0,·) hinge would otherwise amplify a 1-ulp μ
    difference into a different alarm set). Sequential per series, one
    Arrow batch per group — same scale posture as ses_smooth.

    Output: group_cols + (ts_col, val_col, s_pos, s_neg, alarm).
    """
    def _r6(x: float) -> float:
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    out_fields = ", ".join(
        f"{c} {t}" for c, t in df.select(*group_cols, ts_col, val_col).dtypes
    )
    schema = (
        f"{out_fields}, s_pos double, s_neg double, alarm boolean"
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        xs = [float(v) for v in pdf[val_col]]
        base = xs[:baseline_points] if baseline_points else xs
        mu = _r6(sum(base) / len(base))
        var = sum((x - mu) ** 2 for x in base) / len(base)
        sd = _r6(var ** 0.5)
        k, h = k_sigma * sd, h_sigma * sd
        sp = sn = 0.0
        pos, neg, alarm = [], [], []
        for x in xs:
            sp = max(0.0, sp + (x - mu - k))
            sn = max(0.0, sn - (x - mu + k))
            pos.append(sp)
            neg.append(sn)
            alarm.append(sp > h or sn > h)
        pdf["s_pos"], pdf["s_neg"], pdf["alarm"] = pos, neg, alarm
        return pdf[[*group_cols, ts_col, val_col, "s_pos", "s_neg", "alarm"]]

    return (
        df.select(*group_cols, ts_col, val_col)
        .groupBy(*group_cols)
        .applyInPandas(_one, schema)
    )
