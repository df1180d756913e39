"""Cross-format differential fuzz (round-8 brief item 6): one random
DML sequence drives a metacat table, and after EVERY step the snapshot
round-trips through BOTH the Iceberg and the Delta exporter; the three
engines' row sets must agree exactly.

The per-format fuzzers (test_iceberg_fuzz, Delta checkpoint fuzz, Hudi
MOR seeds) validate each READER against its spec; this harness is aimed
at the EXPORT path — a commit that lists the wrong file set (missed
remove, stale add, wrong partition value) reproduces identical rows in
the source but diverges in the mirrors, which no per-format fuzzer can
see. Export verification reads the mirrored metadata with the
pure-Python readers and materializes rows with pyarrow, so each step
costs one Spark job (the source scan), keeping 20 seeds comfortably
under the minute budget."""

from __future__ import annotations

import os
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from iceberg_metadata_pipeline_spark.catalog.delta_format import (
    export_delta_table,
    read_delta_table,
)
from iceberg_metadata_pipeline_spark.catalog.iceberg_format import (
    export_iceberg_table,
    read_iceberg_table,
)
from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("cat", T.StringType(), True),
        T.StructField("val", T.DoubleType(), True),
    ]
)
COLS = ["id", "cat", "val"]


def _rows_of_files(paths) -> list[tuple]:
    out = []
    for p in paths:
        tb = pq.read_table(p, columns=COLS)
        out.extend(zip(*(tb.column(c).to_pylist() for c in COLS)))
    return sorted(out)


def _iceberg_rows(dest: str) -> list[tuple]:
    info = read_iceberg_table(dest, decode_dvs=False)
    assert not info.delete_files, "exports must fold deletes first"
    return _rows_of_files(f.path for f in info.files)


def _delta_rows(dest: str) -> list[tuple]:
    state = read_delta_table(dest)
    assert not any(a.get("deletionVector") for a in state.files.values())
    return _rows_of_files(
        p if os.path.isabs(p) else os.path.join(dest, p) for p in state.files
    )


def _mk_rows(spark, rng: random.Random, lo: int, n: int):
    data = [
        (lo + i, f"c{rng.randrange(3)}", round(rng.uniform(-5, 5), 2))
        for i in range(n)
    ]
    return spark.createDataFrame(data, SCHEMA)


@pytest.mark.parametrize("seed", range(20))
def test_crossformat_differential(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    t = catalog.create_table("xf", f"t{seed}", SCHEMA).refresh()
    ice_dest = str(tmp_path / "ice")
    delta_dest = str(tmp_path / "delta")
    t.append_dataframe(_mk_rows(spark, rng, 0, rng.randrange(5, 25)))
    t = t.refresh()
    next_id = 1000

    def _step_check():
        export_iceberg_table(t, ice_dest)
        export_delta_table(t, delta_dest)
        truth = sorted(tuple(r) for r in t.scan().select(*COLS).collect())
        assert _iceberg_rows(ice_dest) == truth, "iceberg mirror diverged"
        assert _delta_rows(delta_dest) == truth, "delta mirror diverged"
        return truth

    _step_check()
    for _ in range(rng.randrange(2, 4)):
        op = rng.choice(["append", "delete", "overwrite", "rewrite", "mor_fold"])
        if op == "append":
            t.append_dataframe(_mk_rows(spark, rng, next_id, rng.randrange(3, 12)))
            next_id += 1000
        elif op == "delete":
            t.delete_where(f"val < {round(rng.uniform(-3, 3), 2)}")
        elif op == "overwrite":
            t.overwrite_dataframe(t.scan().where(f"cat <> 'c{rng.randrange(3)}'"))
        elif op == "rewrite":
            t.rewrite_data_files()
        else:
            # MOR delete entry folded before export (both exporters refuse
            # pending row-level deletes by contract)
            t.delete_where_mor(f"cat = 'c{rng.randrange(3)}'")
            t = t.refresh()
            t.rewrite_data_files()
        t = t.refresh()
        truth = _step_check()

    # round-9 extension: the pyice WRITER (direct manifest-append commit)
    # appends on top of whatever export history the fuzz produced — the
    # mirror must show exactly truth + the appended rows, proving the
    # direct commit stacks with arbitrary exporter-written metadata
    from iceberg_metadata_pipeline_spark.ingest.pyice_source import register

    register(spark)
    extra = [(900000 + seed, "w", 1.25), (900001 + seed, None, None)]
    spark.createDataFrame(extra, SCHEMA).write.format("pyice").mode(
        "append"
    ).save(ice_dest)
    assert _iceberg_rows(ice_dest) == sorted(truth + extra), (
        "pyice writer append diverged from exporter history"
    )
