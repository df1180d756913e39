"""Oracle hygiene: every oracle_sql() entry must parse and plan in DuckDB
over the fixture views (catches dialect drift without spinning up Spark),
and the registry must be internally consistent."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def registry(spark):
    # pandas UDF registration parses DDL types and needs an active session
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_oracle_has_a_query(registry):
    queries, oracles = registry
    assert set(oracles) <= set(queries)
    # the DuckDB-checkable share should stay high; rows-only is the exception
    assert len(oracles) / len(queries) > 0.85


def test_all_oracles_plan_in_duckdb(registry, duck):
    _, oracles = registry
    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            duck.execute(f"EXPLAIN {sql}")
        except Exception as e:
            failures.append(f"{name}: {str(e).splitlines()[0]}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_are_documented_exceptions(registry):
    queries, oracles = registry
    rows_only = set(queries) - set(oracles)
    allowed_prefixes = (
        "dedup_minhash",      # hash-family not SQL-portable
        "dedup_simhash",
        "dedup_near_clusters",  # built on minhash-LSH pairs (same rationale)
        "pipeline_incremental_dedup_index",  # minhash family (same rationale)
        "sim_cosine_topk_pandas",  # BLAS vs fold summation order
        "multimodal_decode",  # python kernels
        "multimodal_frame",
        "multimodal_resize",
        "multimodal_probe",   # python header parsers (PNG/JPEG/GIF walks)
        "multimodal_png",     # stdlib-zlib PNG decode kernel (no SQL decode)
        "embed_kmeans",       # ML-trained quantizer (same rationale as IVF)
        "dedup_semantic",     # SemDeDup: k-means clustering (same rationale)
        "catalog_metadata",   # catalog metadata invisible to DuckDB
        "catalog_introspection",
        "agg_approx",         # engine-specific sketches
        "agg_percentile_approx",
        "sample_bernoulli",   # engine-specific RNG
        "forecast_",          # float summation order in per-group fits
        "udf_pandas",         # python black-box aggregates
        "source_binaryfile",  # raw file bytes aren't a DuckDB-visible table
        "text_bpe",           # python BPE merge loop has no SQL equivalent
    )
    undocumented = [n for n in rows_only if not n.startswith(allowed_prefixes)]
    assert not undocumented, f"rows-only without a rationale: {undocumented}"


def test_every_query_has_a_measured_cost(registry):
    """The driver walks queries cheapest-first under a budget; a query
    missing from measured_costs.json lands mid-pack on a guess. Keep the
    file complete — refresh with
    `python tools/check_correctness.py --timings-out ...`."""
    import json
    import os

    queries, _ = registry
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "iceberg_metadata_pipeline_spark",
        "queries",
        "measured_costs.json",
    )
    with open(path) as fh:
        costs = json.load(fh)
    missing = sorted(set(queries) - set(costs))
    assert not missing, f"queries without a measured cost: {missing}"
