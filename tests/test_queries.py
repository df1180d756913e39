

def test_skyline_matches_naive_on_random_data(spark):
    """Two-phase distributed skyline == naive O(n²) dominance filter, on
    seeded random 3-dim data (two minimized, one maximized) including
    duplicate points (kept: nothing strictly dominates its twin)."""
    import random

    from iceberg_metadata_pipeline_spark.queries.skyline import skyline

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(0, 50), rng.randrange(0, 50), rng.randrange(0, 50))
        for i in range(400)
    ]
    rows += [(1000, 5, 5, 45), (1001, 5, 5, 45)]  # exact duplicates
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = {
        r["id"]
        for r in skyline(df, minimize=["x", "y"], maximize=["z"]).collect()
    }

    def dominated(a, b):  # b dominates a
        return (
            b[1] <= a[1] and b[2] <= a[2] and b[3] >= a[3]
            and (b[1] < a[1] or b[2] < a[2] or b[3] > a[3])
        )

    want = {a[0] for a in rows if not any(dominated(a, b) for b in rows)}
    assert got == want
    assert 1000 in got and 1001 in got  # duplicate frontier points both kept


def test_skyline_int64_beyond_float53(spark):
    """Dominance uses native int64 comparisons: values differing only
    past float64's 2^53 integer precision still order correctly."""
    from iceberg_metadata_pipeline_spark.queries.skyline import skyline

    big = 2**53
    df = spark.createDataFrame(
        [(1, big, 10), (2, big + 1, 10)], "id long, cost long, perf long"
    )
    got = {r["id"] for r in skyline(df, minimize=["cost"], maximize=["perf"]).collect()}
    assert got == {1}  # row 2 costs strictly more at equal perf
