from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from iceberg_metadata_pipeline_spark.session import get_spark

    return get_spark("pytest")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from iceberg_metadata_pipeline_spark.session import load_tables

    return load_tables(spark, sf_dir)


@pytest.fixture()
def counters_dir(tmp_path):
    """FIXTURES.md table 11: the sanitize-rule fixture the star schema can't
    express — raw UINT64 telemetry as the reference ingests it
    (System_Interface_Counters, README.md:21-23). Three files in one folder
    to exercise multi-file ingest."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    folder = tmp_path / "System_Interface_Counters"
    folder.mkdir()
    base_us = 1_700_000_000_000_000  # epoch µs
    for i in range(3):
        n = 340 if i < 2 else 320
        ts = base_us + rng.integers(0, 10**9, n, dtype=np.uint64) + i * 10**9
        rx = rng.integers(0, 2**40, n, dtype=np.uint64)
        rx[0] = 2**63 + 5  # > int64 max: proves DECIMAL(20,0), not long
        table = pa.table(
            {
                "timestamp": pa.array(ts, pa.uint64()),
                "iface": pa.array([f"eth{j % 4}" for j in range(n)]),
                "rx_bytes": pa.array(rx, pa.uint64()),
                "tx_bytes": pa.array(rng.integers(0, 2**40, n, dtype=np.uint64), pa.uint64()),
                "status": pa.array(["up" if j % 7 else "down" for j in range(n)]),
                "ts_named_other": pa.array(ts + 1, pa.uint64()),
            }
        )
        pq.write_table(table, folder / f"part-{i}.parquet")
    return str(tmp_path)
