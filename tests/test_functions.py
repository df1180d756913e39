"""Salted-join equivalence: salting must never change join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_metadata_pipeline_spark.functions.skew import (
    salted_join,
    salted_join_hot_keys,
)


def _skewed_pair(spark):
    left = spark.range(20_000).select(
        F.when(F.col("id") % 4 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(200).select(
        (F.col("id") % 100).alias("k"), (F.col("id") * 10).alias("r_val")
    )
    return left, right


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("payload").alias("sp"),
        F.sum("r_val").alias("sr"),
    ).collect()[0]


def test_salted_inner_join_equals_plain(spark):
    left, right = _skewed_pair(spark)
    plain = _fingerprint(left.join(right, ["k"]))
    salted = _fingerprint(salted_join(left, right, ["k"], n_salts=8))
    assert tuple(plain) == tuple(salted)


def test_salted_left_join_equals_plain(spark):
    left, right = _skewed_pair(spark)
    # make some left keys unmatched
    right = right.filter(F.col("k") < 50)
    plain = _fingerprint(left.join(right, ["k"], "left"))
    salted = _fingerprint(salted_join(left, right, ["k"], n_salts=8, how="left"))
    assert tuple(plain) == tuple(salted)


def test_hot_key_salting_equals_plain(spark):
    left, right = _skewed_pair(spark)
    hot = spark.createDataFrame([(7,)], "k long")
    plain = _fingerprint(left.join(right, ["k"]))
    salted = _fingerprint(salted_join_hot_keys(left, right, ["k"], hot, n_salts=16))
    assert tuple(plain) == tuple(salted)


# -- as-of join property test (random data vs pure-python reference) ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=50),   # ts (seconds)
            st.booleans(),                            # is_click
        ),
        min_size=1,
        max_size=30,
    )
)
def test_asof_join_matches_python_reference(spark, rows):
    from pyspark.sql import functions as F

    from iceberg_metadata_pipeline_spark.queries.asof import asof_join

    # unique event ids; ts made unique per (user, side) to avoid ambiguous
    # ties between two right rows at the same instant (either is a valid
    # as-of answer; the contract tested here is the deterministic case)
    seen = set()
    events = []
    for i, (u, ts, is_click) in enumerate(rows):
        key = (u, ts, is_click)
        if key in seen:
            continue
        seen.add(key)
        events.append((i, u, ts, "click" if is_click else "view", float(i)))
    df = spark.createDataFrame(
        events, "event_id long, user_id long, tsec long, event_type string, value double"
    ).withColumn("ts", F.timestamp_seconds("tsec"))

    clicks = df.filter(F.col("event_type") == "click")
    views = df.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    got = {
        r["event_id"]: r["value_right"]
        for r in asof_join(
            clicks, views, ts="ts", by=["user_id"], value_cols=["value"]
        ).collect()
    }

    # python reference: latest view at-or-before each click, same user
    views_by_user = {}
    for eid, u, ts, et, val in events:
        if et == "view":
            views_by_user.setdefault(u, []).append((ts, val))
    want = {}
    for eid, u, ts, et, val in events:
        if et != "click":
            continue
        cands = [(t, v) for t, v in views_by_user.get(u, []) if t <= ts]
        want[eid] = max(cands)[1] if cands else None
    assert got == want


def test_native_corr_covar_regr_match_moments(spark, tables, sf_dir):
    """The declared agg_corr_covar_regr query computes stats from decimal
    moments (for cross-engine hash parity); Spark's NATIVE corr/covar/
    regr_* aggregates must agree with it to float tolerance — this is the
    operator-coverage proof for the native surface."""
    li = tables["lineitem"]
    native = (
        li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("corr_n"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("covs_n"),
            F.covar_pop("l_quantity", "l_extendedprice").alias("covp_n"),
            F.expr("regr_slope(l_extendedprice, l_quantity)").alias("slope_n"),
            F.expr("regr_intercept(l_extendedprice, l_quantity)").alias("icept_n"),
        )
        .collect()
    )
    from iceberg_metadata_pipeline_spark.queries import all_queries

    moments = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_corr_covar_regr"](spark, sf_dir).collect()
    }
    assert len(native) == len(moments) > 0
    for r in native:
        m = moments[r["l_returnflag"]]
        assert abs(r["corr_n"] - m["corr_qty_price"]) < 1e-6
        assert abs(r["covs_n"] - m["covar_samp"]) < 1e-3 * max(1, abs(m["covar_samp"]))
        assert abs(r["covp_n"] - m["covar_pop"]) < 1e-3 * max(1, abs(m["covar_pop"]))
        assert abs(r["slope_n"] - m["regr_slope"]) < 1e-6 * max(1, abs(m["regr_slope"]))
        assert abs(r["icept_n"] - m["regr_intercept"]) < 1e-3 * max(1, abs(m["regr_intercept"]))


def test_binned_range_join_matches_naive_on_random_bands(spark):
    """binned_range_join vs the naive theta join on random interval sets,
    including bands wider than the bin, zero-width bands, and values on
    bin boundaries."""
    import random

    from iceberg_metadata_pipeline_spark.functions.skew import binned_range_join

    rng = random.Random(11)
    facts = [(i, float(rng.randint(0, 200)) / 2.0) for i in range(500)]
    bands = []
    for b in range(40):
        lo = float(rng.randint(0, 180)) / 2.0
        width = rng.choice([0.0, 1.0, 4.0, 9.0, 25.0])
        bands.append((b, lo, lo + width))
    f = spark.createDataFrame(facts, "fid long, v double")
    d = spark.createDataFrame(bands, "band_id long, lo double, hi double")

    got = {
        (r["fid"], r["band_id"])
        for r in binned_range_join(f, d, "v", "lo", "hi", bin_width=5.0).collect()
    }
    want = {
        (fid, b)
        for fid, v in facts
        for b, lo, hi in bands
        if lo <= v <= hi
    }
    assert got == want


def test_asof_join_directions_and_tolerance(spark):
    """backward / forward / nearest / within against hand-computed
    merge_asof semantics: exact match always wins, nearest breaks
    distance ties backward, tolerance nulls far matches."""
    from iceberg_metadata_pipeline_spark.queries.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"), (2, "2024-01-01 10:30:00")],
        "k long, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 9.0),
            (1, "2024-01-01 10:00:00", 10.0),
            (1, "2024-01-01 12:00:00", 12.0),
            (2, "2024-01-01 11:00:00", 11.0),
        ],
        "k long, ts string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts", "v")

    def run(**kw):
        rows = asof_join(
            left, right, ts="ts", by=["k"], value_cols=["v"], **kw
        ).orderBy("k", "ts").collect()
        return [(r["k"], str(r["ts"])[11:16], r["v_right"]) for r in rows]

    assert run(direction="backward") == [
        (1, "10:00", 10.0),  # exact
        (1, "11:00", 10.0),  # latest at-or-before
        (2, "10:30", None),  # nothing before
    ]
    assert run(direction="forward") == [
        (1, "10:00", 10.0),  # exact still wins forward
        (1, "11:00", 12.0),  # earliest at-or-after
        (2, "10:30", 11.0),
    ]
    assert run(direction="nearest") == [
        (1, "10:00", 10.0),
        (1, "11:00", 10.0),  # 1h back vs 1h fwd: tie → backward
        (2, "10:30", 11.0),  # only a forward candidate
    ]
    assert run(direction="nearest", within="45 MINUTES") == [
        (1, "10:00", 10.0),
        (1, "11:00", None),  # both sides 1h away > 45m tolerance
        (2, "10:30", 11.0),  # 30m away: inside tolerance
    ]


def test_asof_join_randomized_vs_pandas_merge_asof(spark):
    """Randomized equivalence against pandas.merge_asof — the reference
    implementation for as-of semantics — across all three directions and
    a tolerance, with duplicate timestamps and unmatched keys. Seeded."""
    import random

    import pandas as pd

    from iceberg_metadata_pipeline_spark.queries.asof import asof_join

    rng = random.Random(47)
    base = pd.Timestamp("2024-01-01")
    left_rows = [
        (k, base + pd.Timedelta(minutes=rng.randint(0, 500)))
        for k in range(4)
        for _ in range(25)
    ]
    right_rows = [
        (k, base + pd.Timedelta(minutes=rng.randint(0, 500)), float(i))
        for i, k in enumerate(k for k in range(5) for _ in range(20))
    ]
    lpdf = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts").reset_index(drop=True)
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts").reset_index(drop=True)
    # merge_asof requires unique (k, ts) on the right for deterministic
    # comparison; drop right-side duplicates keeping the LAST (what a
    # running last-ignorenulls picks at equal ts)
    rpdf = rpdf.drop_duplicates(subset=["k", "ts"], keep="last").sort_values("ts")

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    for direction, within in [
        ("backward", None),
        ("forward", None),
        ("nearest", None),
        ("backward", "30 MINUTES"),
        ("nearest", "15 MINUTES"),
    ]:
        got = (
            asof_join(
                ldf, rdf, ts="ts", by=["k"], value_cols=["v"],
                direction=direction, within=within,
            )
            .orderBy("k", "ts")
            .collect()
        )
        exp = pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf,
            on="ts",
            by="k",
            direction=direction,
            tolerance=pd.Timedelta(within.replace(" MINUTES", "min")) if within else None,
        ).sort_values(["k", "ts"], kind="stable")
        got_vals = [(r["k"], str(r["ts"]), r["v_right"]) for r in got]
        exp_vals = [
            (int(r.k), str(r.ts), None if pd.isna(r.v) else float(r.v))
            for r in exp.itertuples()
        ]
        assert sorted(got_vals) == sorted(exp_vals), f"{direction}/{within}"


def test_observation_metrics_single_pass(spark, tables):
    """df.observe(): pipeline quality metrics (row count, revenue sum,
    null count) collected as a side effect of the SAME action — no second
    scan. The 100 TB discipline: every extra .count() for monitoring is
    another full pass; observed metrics are free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("quality")
    df = tables["orders"].observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("revenue"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_keys"),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == tables["orders"].count()
    assert got["null_keys"] == 0
    assert float(got["revenue"]) > 0
