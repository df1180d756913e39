"""Tests for the Deequ-model quality layer (quality/checks.py, anomaly.py).

The reference pipeline has no quality layer (its 627 core LoC are
sanitizers + importer + conf); this is a SURVEY §2.G extension. Tests
verify the metric math against hand-computed values on small frames,
the fused-pass plan shape, and the anomaly detectors' trailing-window
semantics (no future leakage)."""

from __future__ import annotations

import json

import pytest

from iceberg_metadata_pipeline_spark.quality import Check, VerificationSuite
from iceberg_metadata_pipeline_spark.quality.anomaly import (
    FileMetricsRepository,
    absolute_bounds_anomalies,
    rate_of_change_anomalies,
    stddev_bounds_anomalies,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "US"),
            (2, "b", 20.0, "US"),
            (3, None, 30.0, "DE"),
            (4, "d", -5.0, "FR"),
            (4, "e", 15.0, "XX"),  # duplicate id, bad country
        ],
        "id int, name string, amount double, country string",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([("US",), ("DE",), ("FR",)], "code string")


def _by_name(results):
    return {r.constraint: r for r in results}


class TestChecks:
    def test_metric_values_exact(self, frame, dim):
        check = (
            Check("t")
            .has_size(lambda v: v == 5.0)
            .has_completeness("name", lambda v: v == 0.8)
            .satisfies("amount > 0", "amount positive", lambda v: v == 0.8)
            .is_contained_in("country", ["US", "DE", "FR"], lambda v: v == 0.8)
            .has_min("amount", lambda v: v == -5.0)
            .has_max("amount", lambda v: v == 30.0)
            .has_mean("amount", lambda v: v == 14.0)
            .has_uniqueness(["id"], lambda v: v == 0.6)  # 3 of 5 rows unique
            .has_distinctness(["id"], lambda v: v == 0.8)  # 4 distinct / 5
            .is_referentially_valid("country", dim, "code", lambda v: v == 0.8)
        )
        res = _by_name(VerificationSuite(frame).run([check]))
        assert all(r.status == "pass" for r in res.values()), {
            k: (v.value, v.status) for k, v in res.items()
        }
        assert res["size"].value == 5.0
        assert res["completeness(name)"].value == 0.8
        assert res["uniqueness(id)"].value == 0.6
        assert res["distinctness(id)"].value == 0.8
        assert res["ref_integrity(country)"].value == 0.8

    def test_failing_constraints_report_fail(self, frame):
        check = Check("t").is_complete("name").is_non_negative("amount").is_unique("id")
        res = _by_name(VerificationSuite(frame).run([check]))
        assert {r.status for r in res.values()} == {"fail"}
        # values still reported on failure
        assert res["completeness(name)"].value == 0.8

    def test_row_metrics_fuse_into_one_aggregate(self, frame):
        """All row-level constraints must share ONE scan: the fused
        df.agg() has every metric as a column of a single Aggregate."""
        check = (
            Check("t")
            .has_size(lambda v: True)
            .has_completeness("name", lambda v: True)
            .satisfies("amount > 0", "p", lambda v: True)
            .has_min("amount", lambda v: True)
            .has_max("amount", lambda v: True)
        )
        aggs = [
            c.metric_col.alias(f"m{i}") for i, c in enumerate(check.constraints)
        ]
        plan = frame.agg(*aggs)._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 1

    def test_empty_frame(self, spark):
        empty = spark.createDataFrame([], "id int, name string")
        check = Check("t").has_size(lambda v: v == 0.0).is_unique("id")
        res = _by_name(VerificationSuite(empty).run([check]))
        assert res["size"].status == "pass"
        # uniqueness over empty data: 0.0, assertion v==1.0 fails cleanly
        assert res["uniqueness(id)"].value == 0.0
        assert res["uniqueness(id)"].status == "fail"

    def test_warning_level_propagates(self, frame):
        res = VerificationSuite(frame).run(
            [Check("w", level="warning").is_complete("name")]
        )
        assert res[0].level == "warning"

    def test_run_as_dataframe_schema(self, spark, frame):
        df = VerificationSuite(frame).run_as_dataframe(
            spark, [Check("t").has_size(lambda v: v > 0)]
        )
        assert df.columns == ["check", "constraint", "value", "status", "level"]
        assert df.count() == 1


class TestAnomaly:
    def _history(self, spark, values):
        return spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(values)], "seq int, v double"
        )

    def test_rate_of_change(self, spark):
        h = self._history(spark, [100, 102, 98, 60, 61])  # 98→60 = -39%
        out = rate_of_change_anomalies(
            h, "seq", "v", max_rate=0.2, bounded_input=True
        ).collect()
        assert [r["seq"] for r in out] == [3]
        assert out[0]["prev_value"] == 98.0

    def test_rate_of_change_first_row_never_anomalous(self, spark):
        h = self._history(spark, [1000, 1001])
        assert rate_of_change_anomalies(
            h, "seq", "v", max_rate=0.0001, bounded_input=True
        ).count() == 1

    def test_stddev_bounds_trailing_only(self, spark):
        # stable history then a spike; the spike is judged against the
        # PRECEDING rows only, so it flags even though including itself
        # would inflate the stddev enough to hide it
        h = self._history(spark, [10, 11, 10, 11, 10, 50])
        out = stddev_bounds_anomalies(
            h, "seq", "v", k=3.0, bounded_input=True
        ).collect()
        assert [r["seq"] for r in out] == [5]

    def test_stddev_bounds_min_history(self, spark):
        h = self._history(spark, [10, 500])  # only 1 preceding row
        assert stddev_bounds_anomalies(
            h, "seq", "v", k=1.0, min_history=3, bounded_input=True
        ).count() == 0

    def test_absolute_bounds(self, spark):
        h = self._history(spark, [5, 50, 500])
        out = absolute_bounds_anomalies(h, "v", lo=10, hi=100).collect()
        assert sorted(r["v"] for r in out) == [5.0, 500.0]

    def test_partitioned_rate_of_change(self, spark):
        h = spark.createDataFrame(
            [("a", 0, 100.0), ("a", 1, 100.0), ("b", 0, 10.0), ("b", 1, 90.0)],
            "grp string, seq int, v double",
        )
        out = rate_of_change_anomalies(
            h, "seq", "v", max_rate=0.5, partition_cols=["grp"]
        ).collect()
        assert [(r["grp"], r["seq"]) for r in out] == [("b", 1)]

    def test_repository_roundtrip(self, spark, frame, tmp_path):
        repo = FileMetricsRepository(str(tmp_path / "metrics.jsonl"))
        results = VerificationSuite(frame).run(
            [Check("t").has_size(lambda v: v > 0).is_complete("name")]
        )
        repo.save(results, tags={"table": "t"}, ts=1000)
        repo.save(results, tags={"table": "t"}, ts=2000)
        hist = repo.load(spark)
        assert hist.count() == 4
        row = hist.where("constraint = 'size' AND ts = 1000").collect()[0]
        assert row["value"] == 5.0
        # file is plain newline-JSON (greppable, appendable)
        lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
        assert all(json.loads(ln)["tags"]["table"] == "t" for ln in lines)

    def test_end_to_end_repo_then_detector(self, spark, tmp_path):
        """The Deequ loop: verify daily, persist the metric, judge today
        against history."""
        repo = FileMetricsRepository(str(tmp_path / "m.jsonl"))
        for day, n in enumerate([100, 104, 99, 102, 55]):
            df = spark.range(n)
            results = VerificationSuite(df).run(
                [Check("feed").has_size(lambda v: v > 0)]
            )
            repo.save(results, ts=day)
        hist = repo.load(spark).where("constraint = 'size'")
        out = rate_of_change_anomalies(
            hist, "ts", "value", max_rate=0.2, bounded_input=True
        ).collect()
        assert [r["ts"] for r in out] == [4]

    def test_unpartitioned_undeclared_refuses(self, spark):
        """r10 VERDICT #3: the API no longer silently compiles an
        unpartitioned global-sort window — callers partition or declare
        the input bounded."""
        h = self._history(spark, [1, 2, 3])
        with pytest.raises(ValueError, match="bounded"):
            rate_of_change_anomalies(h, "seq", "v", max_rate=0.2)
        with pytest.raises(ValueError, match="bounded"):
            stddev_bounds_anomalies(h, "seq", "v", k=3.0)
