"""Round-11 query additions: semantic pins beyond the oracle gate —
a pure-Python Holt-linear reference for the unrolled coupled-state
recurrence (the round's answer to the DuckDB list_reduce
struct-mutation bug that keeps fold-encoded 2-state recurrences
rows-only)."""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _holt_reference(xs: list[float]) -> tuple[float, float]:
    """Textbook Holt linear (alpha=beta=1/2), l1=x1, b1=x2-x1."""
    level, trend = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        prev = level
        level = 0.5 * x + 0.5 * (level + trend)
        trend = 0.5 * (level - prev) + 0.5 * trend
    return level, trend


def test_holt_linear_matches_python_reference(spark):
    import iceberg_metadata_pipeline_spark.llmops.forecast  # noqa: F401
    from iceberg_metadata_pipeline_spark.queries import REGISTRY
    from iceberg_metadata_pipeline_spark.session import load_tables

    got = {
        r["event_type"]: r
        for r in REGISTRY["forecast_holt_linear_daily"]
        .fn(spark, SF)
        .collect()
    }
    events = load_tables(spark, SF)["events"]
    daily = (
        events.selectExpr("event_type", "CAST(ts AS DATE) AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], float(r["count"])))
    assert got, "no event types produced"
    checked = 0
    for et, pairs in series.items():
        xs = [x for _, x in sorted(pairs)][:12]
        if len(xs) < 12:
            continue
        level, trend = _holt_reference(xs)
        row = got[et]
        assert row["level"] == pytest.approx(level, rel=1e-12)
        assert row["trend"] == pytest.approx(trend, rel=1e-12)
        assert row["forecast_next"] == pytest.approx(level + trend, rel=1e-12)
        checked += 1
    assert checked >= 3, f"only {checked} event types had a 12-day horizon"
