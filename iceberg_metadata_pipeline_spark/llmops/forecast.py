"""Per-group model fitting via applyInPandas (SURVEY.md §2.B UDF surface:
the reference ships Prophet in the Superset image for BI-side forecasting,
Dockerfile.superset:32-41 — engine-side, the same pattern is a grouped
pandas UDF fitting one model per key).

The kernel here is a closed-form least-squares linear trend per
event_type over hourly buckets (deterministic, no solver) — the seam a
real deployment swaps for Prophet/ARIMA per key. Accuracy vs DuckDB's
regr_slope/regr_intercept is asserted in tests (1e-9), but the query is
rows-only: float summation order across engines differs in ulps.

Scale notes: groupBy().applyInPandas ships each key's rows to one task —
the pattern holds while per-key data fits a task (hours × years is
thousands of points; fine). Millions of tiny models → this exact shape;
one huge key → pre-aggregate (as here, to hourly buckets) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.queries import query
from iceberg_metadata_pipeline_spark.session import load_tables

TREND_SCHEMA = (
    "event_type string, n_points long, slope double, intercept double, "
    "forecast_next double"
)


def fit_linear_trend_per_group(hourly: DataFrame) -> DataFrame:
    """hourly: (event_type, bucket_idx long, y double) → one fitted trend
    row per event_type with the next-bucket forecast."""
    import pandas as pd

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket_idx")
        x = pdf["bucket_idx"].to_numpy(dtype="float64")
        y = pdf["y"].to_numpy(dtype="float64")
        n = len(x)
        mx, my = x.mean(), y.mean()
        varx = ((x - mx) ** 2).sum()
        slope = 0.0 if varx == 0.0 else (((x - mx) * (y - my)).sum() / varx)
        intercept = my - slope * mx
        nxt = slope * (x.max() + 1) + intercept
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_points": [n],
                "slope": [slope],
                "intercept": [intercept],
                "forecast_next": [nxt],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(fit, TREND_SCHEMA)


def hourly_event_values(events: DataFrame) -> DataFrame:
    """Pre-aggregate to hourly buckets (keeps any one key's series small —
    the guard that makes per-key fitting scale)."""
    origin = F.lit("1995-01-01 00:00:00").cast("timestamp")
    return (
        events.groupBy(
            "event_type",
            F.floor(
                (F.unix_timestamp("ts") - F.unix_timestamp(origin)) / 3600
            ).alias("bucket_idx"),
        )
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("y"))
    )


@query("forecast_trend_per_type", None)  # float sum order → rows-only
def forecast_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → hourly series per type → per-group least-squares trend."""
    events = load_tables(spark, sf_dir)["events"]
    trends = fit_linear_trend_per_group(hourly_event_values(events))
    return trends.select(
        "event_type",
        "n_points",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("forecast_next", 6).alias("forecast_next"),
    ).orderBy("event_type")
