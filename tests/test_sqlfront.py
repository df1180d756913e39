"""SQL front-end (catalog/sqlfront.py): statement rewriting for time
travel, metadata tables, and plain catalog references."""

from __future__ import annotations

import pytest

from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql
from iceberg_metadata_pipeline_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-sqlfront")


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def versioned_table(spark, catalog):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    t = catalog.create_table("nyc", "vt", df1.schema)
    s1 = t.append_dataframe(df1)
    s2 = t.append_dataframe(spark.createDataFrame([(3, "c")], "id long, s string"))
    return t, s1, s2


def test_plain_reference_reads_current_snapshot(catalog, versioned_table):
    _t, _s1, _s2 = versioned_table
    rows = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").collect()
    assert rows[0]["n"] == 3


def test_version_as_of(catalog, versioned_table):
    _t, s1, _s2 = versioned_table
    got = catalog_sql(
        catalog, f"SELECT id FROM nyc.vt VERSION AS OF {s1} ORDER BY id"
    ).collect()
    assert [r["id"] for r in got] == [1, 2]
    # Iceberg's FOR VERSION AS OF spelling too
    got = catalog_sql(
        catalog, f"SELECT COUNT(*) AS n FROM nyc.vt FOR VERSION AS OF {s1}"
    ).collect()
    assert got[0]["n"] == 2


def test_timestamp_as_of(catalog, versioned_table):
    t, s1, _s2 = versioned_table
    snap1 = next(s for s in t.meta["snapshots"] if s["snapshot_id"] == s1)
    import datetime as dt

    ts = dt.datetime.fromtimestamp(
        snap1["timestamp_ms"] / 1000, tz=dt.timezone.utc
    ).isoformat()
    got = catalog_sql(
        catalog, f"SELECT COUNT(*) AS n FROM nyc.vt TIMESTAMP AS OF '{ts}'"
    ).collect()
    assert got[0]["n"] == 2


def test_two_pins_in_one_statement(catalog, versioned_table):
    """Self-join across two points in time — each pin gets its own view."""
    _t, s1, _s2 = versioned_table
    got = catalog_sql(
        catalog,
        f"""
        SELECT cur.n - old.n AS added
        FROM (SELECT COUNT(*) AS n FROM nyc.vt) cur
        CROSS JOIN (SELECT COUNT(*) AS n FROM nyc.vt VERSION AS OF {s1}) old
        """,
    ).collect()
    assert got[0]["added"] == 1


def test_metadata_tables_via_sql(catalog, versioned_table):
    _t, _s1, _s2 = versioned_table
    snaps = catalog_sql(
        catalog, "SELECT operation FROM nyc.vt.snapshots ORDER BY snapshot_id"
    ).collect()
    assert [r["operation"] for r in snaps] == ["append", "append"]
    files = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt.files").collect()
    assert files[0]["n"] >= 1
    hist = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt.history").collect()
    assert hist[0]["n"] == 2


def test_alias_column_refs_pass_through(catalog, versioned_table):
    """a.b identifier pairs that are NOT catalog tables (alias.column)
    must survive the rewrite untouched."""
    _t, _s1, _s2 = versioned_table
    got = catalog_sql(
        catalog,
        "SELECT v.id, v.s FROM nyc.vt v WHERE v.id > 1 ORDER BY v.id",
    ).collect()
    assert [r["id"] for r in got] == [2, 3]


def test_mor_deletes_visible_through_sql(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    t.delete_where_mor("id = 2")
    got = catalog_sql(catalog, "SELECT id FROM nyc.vt ORDER BY id").collect()
    assert [r["id"] for r in got] == [1, 3]


def test_version_as_of_ref_name(catalog, versioned_table):
    t, s1, _s2 = versioned_table
    t.create_tag("v1", s1)
    got = catalog_sql(
        catalog, "SELECT COUNT(*) AS n FROM nyc.vt VERSION AS OF 'v1'"
    ).collect()
    assert got[0]["n"] == 2
    with pytest.raises(ValueError, match="no ref"):
        catalog_sql(catalog, "SELECT * FROM nyc.vt VERSION AS OF 'nope'")


def test_call_rollback_and_fast_forward(catalog, spark, versioned_table):
    t, s1, s2 = versioned_table
    out = catalog_sql(
        catalog, f"CALL system.rollback_to_snapshot('nyc.vt', {s1})"
    ).collect()
    assert out[0]["previous_snapshot_id"] == s2
    assert out[0]["current_snapshot_id"] == s1
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 2
    # stage on a branch, then publish via CALL fast_forward
    t.refresh()
    t.append_dataframe(
        spark.createDataFrame([(9, "z")], "id long, s string"), branch="audit"
    )
    out = catalog_sql(
        catalog, "CALL system.fast_forward(table => 'nyc.vt', branch => 'audit')"
    ).collect()
    assert out[0]["previous_snapshot_id"] == s1
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 3


def test_call_rewrite_and_expire(catalog, spark, versioned_table):
    _t, _s1, _s2 = versioned_table
    out = catalog_sql(
        catalog, "CALL system.rewrite_data_files(table => 'nyc.vt', target_num_files => 1)"
    ).collect()
    assert out[0]["added_data_files_count"] == 1
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 3
    out = catalog_sql(
        catalog, "CALL system.expire_snapshots(table => 'nyc.vt', keep_last => 1)"
    ).collect()
    assert out[0]["remaining_snapshots"] == 1
    # expired data files are now orphans; dry_run lists without deleting
    orphans = catalog_sql(
        catalog, "CALL system.remove_orphan_files(table => 'nyc.vt', dry_run => true)"
    ).count()
    assert orphans >= 1


def test_new_metadata_tables_via_sql(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    t.create_tag("rel1")
    refs = catalog_sql(catalog, "SELECT name, type FROM nyc.vt.refs").collect()
    assert ("rel1", "tag") in [(r["name"], r["type"]) for r in refs]
    mani = catalog_sql(
        catalog, "SELECT COUNT(*) AS n FROM nyc.vt.manifests"
    ).first()["n"]
    assert mani == 2
    parts = catalog_sql(catalog, "SELECT * FROM nyc.vt.partitions").collect()
    assert sum(r["record_count"] for r in parts) == 3


def test_call_rejects_unknown_procedure(catalog, versioned_table):
    with pytest.raises(ValueError, match="unknown procedure"):
        catalog_sql(catalog, "CALL system.vacuum_everything('nyc.vt')")


def test_call_rewrite_manifests_and_binpack(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    t.append_dataframe(spark.createDataFrame([(9, "z")], t.schema))
    out = catalog_sql(
        catalog, "CALL system.rewrite_manifests(table => 'nyc.vt')"
    ).collect()
    assert out[0]["rewritten_manifests_count"] >= 2
    n = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"]
    out = catalog_sql(
        catalog,
        "CALL system.rewrite_data_files(table => 'nyc.vt', strategy => 'binpack')",
    ).collect()
    assert out[0]["rewritten_data_files_count"] >= 2
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == n


def test_call_rewrite_sort_order_and_zorder(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    n = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"]
    catalog_sql(
        catalog,
        "CALL system.rewrite_data_files(table => 'nyc.vt', "
        "target_num_files => 2, sort_order => 'id')",
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == n
    catalog_sql(
        catalog,
        "CALL system.rewrite_data_files(table => 'nyc.vt', "
        "target_num_files => 2, sort_order => 'zorder(id)')",
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == n


def test_sql_dml_delete_and_update(catalog, spark):
    df = spark.createDataFrame(
        [(i, float(i), "x" if i % 2 == 0 else "y") for i in range(20)],
        "id long, val double, tag string",
    )
    t = catalog.create_table("nyc", "dml", df.schema)
    t.append_dataframe(df)
    out = catalog_sql(catalog, "DELETE FROM nyc.dml WHERE tag = 'y' AND id < 10").collect()
    assert out[0]["operation"] == "delete"
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.dml").first()["n"] == 15
    out = catalog_sql(
        catalog,
        "UPDATE nyc.dml SET val = val + 100, tag = concat(tag, '!') WHERE id >= 18",
    ).collect()
    assert out[0]["operation"] == "update"
    got = {
        r["id"]: (r["val"], r["tag"])
        for r in catalog_sql(catalog, "SELECT * FROM nyc.dml WHERE id >= 18").collect()
    }
    assert got == {18: (118.0, "x!"), 19: (119.0, "y!")}


def test_views_create_query_introspect(catalog, spark):
    df = spark.createDataFrame(
        [(i, float(i), "x" if i % 2 == 0 else "y") for i in range(20)],
        "id long, val double, tag string",
    )
    t = catalog.create_table("nyc", "base", df.schema)
    t.append_dataframe(df)
    catalog_sql(
        catalog,
        "CREATE VIEW nyc.evens AS SELECT id, val FROM nyc.base WHERE tag = 'x'",
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.evens").first()["n"] == 10
    # view of a view
    catalog_sql(
        catalog, "CREATE VIEW nyc.bigevens AS SELECT * FROM nyc.evens WHERE id >= 10"
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.bigevens").first()["n"] == 5
    # views always reflect current table state
    t.append_dataframe(spark.createDataFrame([(100, 1.0, "x")], df.schema))
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.evens").first()["n"] == 11

    rows = catalog_sql(catalog, "SHOW VIEWS IN nyc").collect()
    assert {(r["namespace"], r["viewName"]) for r in rows} == {
        ("nyc", "evens"),
        ("nyc", "bigevens"),
    }
    ddl = catalog_sql(catalog, "SHOW CREATE VIEW nyc.evens").first()["createtab_stmt"]
    assert ddl.startswith("CREATE VIEW nyc.evens AS")
    # the reference's dialect rewrite: SHOW CREATE TABLE on a view works,
    # and SHOW CREATE VIEW on a table falls back to table DDL
    assert (
        catalog_sql(catalog, "SHOW CREATE TABLE nyc.evens").first()["createtab_stmt"] == ddl
    )
    tddl = catalog_sql(catalog, "SHOW CREATE VIEW nyc.base").first()["createtab_stmt"]
    assert tddl.startswith("CREATE TABLE nyc.base")

    # OR REPLACE + drop
    catalog_sql(
        catalog, "CREATE OR REPLACE VIEW nyc.evens AS SELECT id FROM nyc.base"
    )
    assert catalog.drop_view("nyc", "bigevens")
    assert catalog.list_views("nyc") == ["evens"]


def test_call_rewrite_position_delete_files(catalog, spark):
    df = spark.createDataFrame([(i,) for i in range(40)], "id long")
    t = catalog.create_table("nyc", "pdf", df.schema)
    t.append_dataframe(df)
    t.delete_where_mor("id >= 30")
    t.rewrite_small_files() or t.rewrite_data_files()
    out = catalog_sql(
        catalog, "CALL system.rewrite_position_delete_files(table => 'nyc.pdf')"
    ).collect()
    assert out[0]["removed_delete_files_count"] >= 0
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.pdf").first()["n"] == 30


def test_call_add_files_metadata_only(catalog, spark, sf_dir, tmp_path):
    import os

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    t = catalog.create_table("nyc", "addf", nation.schema)
    out = catalog_sql(
        catalog,
        f"CALL system.add_files(table => 'nyc.addf', source_dir => '{sf_dir}/nation.parquet')",
    ).collect()
    assert out[0]["added_files_count"] == 1
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.addf").first()["n"] == nation.count()
    # idempotent: re-adding the same path registers nothing new
    out = catalog_sql(
        catalog,
        f"CALL system.add_files(table => 'nyc.addf', source_dir => '{sf_dir}/nation.parquet')",
    ).collect()
    assert out[0]["added_files_count"] == 0


def test_alter_table_refs_and_properties_sql(catalog, spark, versioned_table):
    t, s1, _s2 = versioned_table
    out = catalog_sql(
        catalog, f"ALTER TABLE nyc.vt CREATE TAG rel1 AS OF VERSION {s1}"
    ).collect()
    assert out[0]["op"] == "create"
    # tag readable through SQL time travel by name
    n = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt VERSION AS OF 'rel1'").first()["n"]
    assert n == catalog.load_table("nyc", "vt").scan(snapshot_id=s1).count()
    catalog_sql(catalog, "ALTER TABLE nyc.vt CREATE BRANCH audit")
    refs = {r["name"] for r in catalog_sql(catalog, "SELECT name FROM nyc.vt.refs").collect()}
    assert {"rel1", "audit"} <= refs
    catalog_sql(catalog, "ALTER TABLE nyc.vt DROP TAG rel1")
    refs = {r["name"] for r in catalog_sql(catalog, "SELECT name FROM nyc.vt.refs").collect()}
    assert "rel1" not in refs and "audit" in refs

    catalog_sql(
        catalog,
        "ALTER TABLE nyc.vt SET TBLPROPERTIES('write.target-size'='512m', 'owner'='etl')",
    )
    props = {
        r["key"]: r["value"]
        for r in catalog_sql(catalog, "SHOW TBLPROPERTIES nyc.vt").collect()
    }
    assert props["write.target-size"] == "512m" and props["owner"] == "etl"
    # persisted: a fresh handle sees them
    assert catalog.load_table("nyc", "vt").properties["owner"] == "etl"


def test_call_rollback_to_timestamp_and_expire_older_than(catalog, spark):
    import datetime as dt
    import time as _time

    df = spark.createDataFrame([(1,)], "id long")
    t = catalog.create_table("nyc", "rbts", df.schema)
    t.append_dataframe(df)
    _time.sleep(0.01)
    cutoff = dt.datetime.now(dt.timezone.utc).isoformat()
    _time.sleep(0.01)
    t.append_dataframe(df)
    out = catalog_sql(
        catalog,
        f"CALL system.rollback_to_timestamp(table => 'nyc.rbts', timestamp => '{cutoff}')",
    ).collect()
    assert out[0]["current_snapshot_id"] != out[0]["previous_snapshot_id"]
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.rbts").first()["n"] == 1
    out = catalog_sql(
        catalog,
        f"CALL system.expire_snapshots(table => 'nyc.rbts', keep_last => 1, older_than => '{cutoff}')",
    ).collect()
    assert out[0]["remaining_snapshots"] >= 1


def test_all_files_and_metadata_log_tables(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    # rewrite creates new files; all_files remembers the replaced ones too
    t.rewrite_data_files(target_num_files=1)
    live = {r["file_path"] for r in catalog_sql(catalog, "SELECT file_path FROM nyc.vt.files").collect()}
    allf = {r["file_path"] for r in catalog_sql(catalog, "SELECT file_path FROM nyc.vt.all_files").collect()}
    assert live < allf  # strictly more historical files than live ones
    log = catalog_sql(
        catalog, "SELECT version, latest_snapshot_id FROM nyc.vt.metadata_log_entries"
    ).collect()
    versions = [r["version"] for r in log]
    assert versions == sorted(versions) and len(versions) >= 3


def test_describe_rename_and_system_version_spellings(catalog, spark, versioned_table):
    t, s1, _s2 = versioned_table
    cols = {
        r["col_name"]: r["data_type"]
        for r in catalog_sql(catalog, "DESCRIBE TABLE nyc.vt").collect()
    }
    assert cols  # schema surfaced
    # SYSTEM_VERSION / SYSTEM_TIME spellings resolve like VERSION/TIMESTAMP
    n1 = catalog_sql(
        catalog, f"SELECT COUNT(*) AS n FROM nyc.vt FOR SYSTEM_VERSION AS OF {s1}"
    ).first()["n"]
    assert n1 == catalog.load_table("nyc", "vt").scan(snapshot_id=s1).count()

    n_total = catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"]
    catalog_sql(catalog, "ALTER TABLE nyc.vt RENAME TO nyc.vt_renamed")
    assert catalog_sql(
        catalog, "SELECT COUNT(*) AS n FROM nyc.vt_renamed"
    ).first()["n"] == n_total
    assert "vt_renamed" in catalog.list_tables("nyc")
    assert "vt" not in catalog.list_tables("nyc")
    with pytest.raises(FileNotFoundError, match="renamed"):
        catalog.load_table("nyc", "vt")
    # rename back so the module-scoped fixture stays usable
    catalog_sql(catalog, "ALTER TABLE nyc.vt_renamed RENAME TO nyc.vt")
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == n_total


def test_sql_insert_into_and_overwrite(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    out = catalog_sql(catalog, "INSERT INTO nyc.vt VALUES (10, 'x'), (11, 'y')").collect()
    assert out[0]["operation"] == "append"
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 5
    # INSERT ... SELECT through the same front-end (self-referential source)
    catalog_sql(
        catalog, "INSERT INTO nyc.vt SELECT id + 100, s FROM nyc.vt WHERE id >= 10"
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 7
    pre_overwrite = t.refresh().current_snapshot["snapshot_id"]
    out = catalog_sql(
        catalog, "INSERT OVERWRITE nyc.vt SELECT id, s FROM nyc.vt WHERE id < 3"
    ).collect()
    assert out[0]["operation"] == "overwrite"
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 2
    # previous contents still time-travelable
    n_old = catalog_sql(
        catalog, f"SELECT COUNT(*) AS n FROM nyc.vt VERSION AS OF {pre_overwrite}"
    ).first()["n"]
    assert n_old == 7
    with pytest.raises(ValueError, match="column count"):
        catalog_sql(catalog, "INSERT INTO nyc.vt VALUES (1, 'a', 99)")


def test_create_table_as_select(catalog, spark, versioned_table):
    _t, _s1, _s2 = versioned_table
    out = catalog_sql(
        catalog, "CREATE TABLE nyc.big AS SELECT id, s FROM nyc.vt WHERE id >= 2"
    ).collect()
    assert out[0]["table"] == "nyc.big"
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.big").first()["n"] == 2
    with pytest.raises(FileExistsError):
        catalog_sql(catalog, "CREATE TABLE nyc.big AS SELECT * FROM nyc.vt")
    catalog_sql(catalog, "CREATE OR REPLACE TABLE nyc.big AS SELECT * FROM nyc.vt")
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.big").first()["n"] == 3


def test_truncate_table_sql(catalog, spark, versioned_table):
    t, _s1, s2 = versioned_table
    out = catalog_sql(catalog, "TRUNCATE TABLE nyc.vt").collect()
    assert out[0]["operation"] == "truncate"
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 0
    # pre-truncate snapshot still readable
    n = catalog_sql(
        catalog, f"SELECT COUNT(*) AS n FROM nyc.vt VERSION AS OF {s2}"
    ).first()["n"]
    assert n == 3


def test_alter_table_column_ddl(catalog, spark, versioned_table):
    _t, _s1, _s2 = versioned_table
    catalog_sql(catalog, "ALTER TABLE nyc.vt ADD COLUMN score double")
    cols = {r["col_name"] for r in catalog_sql(catalog, "DESCRIBE nyc.vt").collect()}
    assert "score" in cols
    # old rows read NULL for the new column, metadata-only
    assert (
        catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt WHERE score IS NULL").first()["n"] == 3
    )
    catalog_sql(catalog, "ALTER TABLE nyc.vt RENAME COLUMN s TO label")
    assert catalog_sql(
        catalog, "SELECT COUNT(DISTINCT label) AS n FROM nyc.vt"
    ).first()["n"] == 3
    catalog_sql(catalog, "ALTER TABLE nyc.vt ADD COLUMN rank int")
    catalog_sql(catalog, "ALTER TABLE nyc.vt ALTER COLUMN rank TYPE bigint")
    dt = {
        r["col_name"]: r["data_type"]
        for r in catalog_sql(catalog, "DESCRIBE nyc.vt").collect()
    }
    assert dt["rank"] == "bigint"
    catalog_sql(catalog, "ALTER TABLE nyc.vt DROP COLUMN score")
    cols = {r["col_name"] for r in catalog_sql(catalog, "DESCRIBE nyc.vt").collect()}
    assert "score" not in cols


def test_merge_into_sql(catalog, spark, versioned_table):
    _t, _s1, _s2 = versioned_table
    # vt holds (1,a),(2,b),(3,c); source updates 1, inserts 9
    out = catalog_sql(
        catalog,
        """
        MERGE INTO nyc.vt AS t
        USING (SELECT * FROM VALUES (1, 'A'), (9, 'Z') AS v(id, s)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET s = s.s
        WHEN NOT MATCHED THEN INSERT *
        """,
    ).collect()
    assert out[0]["operation"] == "merge"
    rows = {
        r["id"]: r["s"]
        for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()
    }
    assert rows == {1: "A", 2: "b", 3: "c", 9: "Z"}

    # sync-to-source: delete rows not matched by source
    catalog_sql(
        catalog,
        """
        MERGE INTO nyc.vt AS t
        USING (SELECT * FROM VALUES (1, 'AA') AS v(id, s)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET s = s.s
        WHEN NOT MATCHED BY SOURCE THEN DELETE
        """,
    )
    rows = {
        r["id"]: r["s"]
        for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()
    }
    assert rows == {1: "AA"}

    with pytest.raises(ValueError, match="equi-key"):
        catalog_sql(
            catalog,
            "MERGE INTO nyc.vt AS t USING (SELECT 1 AS id) s ON 1 = 1 "
            "WHEN MATCHED THEN UPDATE SET s = 'x'",
        )


def test_create_table_with_partition_transforms_and_drop(catalog, spark):
    catalog_sql(
        catalog,
        "CREATE TABLE nyc.evts (id BIGINT, ts TIMESTAMP, user_id BIGINT, val DOUBLE) "
        "USING iceberg PARTITIONED BY (days(ts), bucket(4, user_id))",
    )
    t = catalog.load_table("nyc", "evts")
    spec = t.default_spec
    assert [(f.source, f.transform) for f in spec] == [
        ("ts", "day"),
        ("user_id", "bucket[4]"),
    ]
    catalog_sql(
        catalog,
        "INSERT INTO nyc.evts VALUES "
        "(1, TIMESTAMP '2024-01-01 10:00:00', 7, 1.0), "
        "(2, TIMESTAMP '2024-01-02 10:00:00', 8, 2.0)",
    )
    # hidden partitioning recorded per file
    t = catalog.load_table("nyc", "evts")
    assert all(f.partition for f in t.snapshot_files())
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.evts").first()["n"] == 2

    catalog_sql(catalog, "DROP TABLE nyc.evts PURGE")
    assert not catalog.table_exists("nyc", "evts")
    out = catalog_sql(catalog, "DROP TABLE IF EXISTS nyc.evts").collect()
    assert out[0]["dropped"] is False
    with pytest.raises(FileNotFoundError):
        catalog_sql(catalog, "DROP TABLE nyc.evts")


def test_sql_dml_random_sequence_matches_model(catalog, spark):
    """Random INSERT/DELETE/UPDATE/TRUNCATE statement sequences vs an
    in-memory model — guards the statement parsing + execution paths the
    way the MOR model test guards the commit algebra. Seeded."""
    import random

    rng = random.Random(13)
    t = catalog.create_table(
        "nyc", "fuzz", spark.createDataFrame([(0, 0.0)], "id long, val double").schema
    )
    model: dict[int, float] = {}
    next_id = 0
    for step in range(14):
        op = rng.choice(
            ["insert", "delete", "update", "insert", "update", "merge", "merge"]
        )
        if op == "insert":
            rows = [(next_id + i, float(rng.randint(0, 50))) for i in range(5)]
            next_id += 5
            vals = ", ".join(f"({i}, {v})" for i, v in rows)
            catalog_sql(catalog, f"INSERT INTO nyc.fuzz VALUES {vals}")
            model.update({i: v for i, v in rows})
        elif op == "delete" and model:
            lim = rng.randint(0, 50)
            catalog_sql(catalog, f"DELETE FROM nyc.fuzz WHERE val <= {lim}")
            model = {i: v for i, v in model.items() if not v <= lim}
        elif op == "update" and model:
            lim = rng.randint(0, 50)
            catalog_sql(
                catalog, f"UPDATE nyc.fuzz SET val = val + 100 WHERE val >= {lim}"
            )
            model = {i: (v + 100 if v >= lim else v) for i, v in model.items()}
        elif op == "merge":
            # general form: renamed key column, conditional DELETE before
            # the unconditional UPDATE (first match wins), explicit
            # INSERT column list, conditional insert
            src = [
                (rng.choice(list(model)) if model and rng.random() < 0.6 else next_id + i,
                 float(rng.randint(0, 60)))
                for i in range(4)
            ]
            src = list({k: v for k, v in src}.items())  # unique keys
            next_id += 4
            lim = rng.randint(10, 40)
            vals = ", ".join(f"({k}, {v})" for k, v in src)
            catalog_sql(
                catalog,
                f"""
                MERGE INTO nyc.fuzz AS t
                USING (SELECT * FROM VALUES {vals} AS v(kk, amt)) s
                ON t.id = s.kk
                WHEN MATCHED AND t.val > {lim} THEN DELETE
                WHEN MATCHED THEN UPDATE SET val = t.val + s.amt
                WHEN NOT MATCHED AND s.amt >= 5 THEN INSERT (id, val) VALUES (s.kk, s.amt)
                """,
            )
            for k, v in src:
                if k in model:
                    if model[k] > lim:
                        del model[k]
                    else:
                        model[k] = model[k] + v
                elif v >= 5:
                    model[k] = v
        got = {
            (r["id"], r["val"])
            for r in catalog_sql(catalog, "SELECT id, val FROM nyc.fuzz").collect()
        }
        assert got == set(model.items()), f"diverged at step {step} ({op})"
    catalog_sql(catalog, "TRUNCATE TABLE nyc.fuzz")
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.fuzz").first()["n"] == 0


def test_merge_sql_general_forms(catalog, spark):
    """The widened MERGE front-end: differently-named join columns
    (ON t.k = s.kk), multiple conditional WHEN clauses with
    first-match-wins ordering, WHEN MATCHED DELETE, explicit INSERT
    column lists (absent columns → NULL), conditional INSERT, and
    WHEN NOT MATCHED BY SOURCE UPDATE."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, s string, bal double",
    )
    t = catalog.create_table("nyc", "gm", df.schema)
    t.append_dataframe(df)
    catalog_sql(
        catalog,
        """
        MERGE INTO nyc.gm AS t
        USING (SELECT * FROM VALUES (1, 100.0), (2, 200.0), (8, 800.0),
               (9, 5.0) AS v(key_src, amt)) s
        ON t.id = s.key_src
        WHEN MATCHED AND t.bal < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET bal = t.bal + s.amt
        WHEN NOT MATCHED AND s.amt > 100 THEN INSERT (id, bal) VALUES (s.key_src, s.amt)
        """,
    )
    rows = {
        r["id"]: (r["s"], r["bal"])
        for r in catalog_sql(catalog, "SELECT * FROM nyc.gm").collect()
    }
    assert rows == {
        1: ("a", 110.0),  # matched, bal >= 0 → second clause updates
        # 2 deleted: matched with bal < 0 → FIRST clause wins
        3: ("c", 30.0),  # untouched
        4: ("d", 40.0),  # untouched
        8: (None, 800.0),  # conditional insert; s column absent → NULL
        # 9 dropped: unmatched and amt <= 100 → no insert clause applies
    }

    # WHEN NOT MATCHED BY SOURCE UPDATE (flag stale rows, don't delete)
    catalog_sql(
        catalog,
        """
        MERGE INTO nyc.gm AS t
        USING (SELECT * FROM VALUES (1) AS v(key_src)) s
        ON t.id = s.key_src
        WHEN MATCHED THEN UPDATE SET s = 'fresh'
        WHEN NOT MATCHED BY SOURCE AND t.bal < 500 THEN UPDATE SET s = 'stale'
        """,
    )
    rows = {
        r["id"]: r["s"] for r in catalog_sql(catalog, "SELECT * FROM nyc.gm").collect()
    }
    assert rows == {1: "fresh", 3: "stale", 4: "stale", 8: None}  # 800 ≥ 500


def test_merge_sql_strict_clause_parsing(catalog, spark):
    """Malformed WHEN clauses must raise, never be silently skipped —
    a dropped clause would silently change the merge's result."""
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    t = catalog.create_table("nyc", "strictm", df.schema)
    t.append_dataframe(df)
    with pytest.raises(ValueError, match="unparseable MERGE"):
        catalog_sql(
            catalog,
            """
            MERGE INTO nyc.strictm AS t
            USING (SELECT 1 AS id) s
            ON t.id = s.id
            WHEN MATCHED THEN FROBNICATE
            """,
        )
    with pytest.raises(ValueError, match="INSERT column list"):
        catalog_sql(
            catalog,
            """
            MERGE INTO nyc.strictm AS t
            USING (SELECT 1 AS id) s
            ON t.id = s.id
            WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id)
            """,
        )


def test_call_snapshot_zero_copy_clone(catalog, spark, versioned_table):
    t, _s1, _s2 = versioned_table
    out = catalog_sql(
        catalog,
        "CALL system.snapshot(source_table => 'nyc.vt', table => 'nyc.vt_clone')",
    ).collect()
    assert out[0]["imported_files_count"] >= 1
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt_clone").first()["n"] == 3
    # the clone shares data files (zero copy) ...
    src_files = {f.path for f in t.refresh().snapshot_files()}
    clone = catalog.load_table("nyc", "vt_clone")
    assert {f.path for f in clone.snapshot_files()} == src_files
    # ... but evolves independently: a clone delete leaves the source intact
    clone.delete_where("id = 1")
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt_clone").first()["n"] == 2
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 3


def test_call_snapshot_clone_preserves_mor_deletes(catalog, spark):
    """Cloning a table with UNFOLDED merge-on-read deletes must not
    resurrect the deleted rows, and registering the source's entries in
    the clone must not corrupt the source handle's cached sequence
    numbers (clone commits stamp seq on what they register)."""
    df = spark.createDataFrame([(i, f"r{i}") for i in range(100)], "id long, s string")
    t = catalog.create_table("nyc", "morsrc", df.schema)
    t.append_dataframe(df)
    t.delete_where_mor("id < 30")  # pending MOR delete, not folded
    assert t.scan().count() == 70
    catalog_sql(
        catalog,
        "CALL system.snapshot(source_table => 'nyc.morsrc', table => 'nyc.morclone')",
    ).collect()
    # clone sees the source's VISIBLE contents (deletes applied)
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.morclone").first()["n"] == 70
    # the SOURCE handle still scans correctly in the same session —
    # the clone's commit must not have re-stamped the source's cached
    # entries' sequence numbers
    assert t.scan().count() == 70
    assert catalog.load_table("nyc", "morsrc").scan().count() == 70
    # appends to the clone are immune to the inherited delete
    clone = catalog.load_table("nyc", "morclone")
    clone.append_dataframe(
        spark.createDataFrame([(5, "fresh")], "id long, s string")
    )
    assert clone.scan().count() == 71  # id=5 survives despite 'id < 30' delete
    # and the source never sees clone activity
    assert t.refresh().scan().count() == 70


def test_call_compute_table_stats(catalog, spark, versioned_table):
    _t, _s1, _s2 = versioned_table
    out = catalog_sql(
        catalog,
        "CALL system.compute_table_stats(table => 'nyc.vt', columns => 's')",
    ).collect()
    assert out[0]["statistics_columns"] == 1
    t = catalog.load_table("nyc", "vt")
    assert all(f.stats.get("bloom_s") for f in t.snapshot_files())
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").first()["n"] == 3


def test_identifier_fields_ddl_and_default_merge_keys(spark, catalog):
    """SET IDENTIFIER FIELDS declares row identity once on the table;
    merge_into / merge_into_mor with on=None then use it. DROP clears it,
    unknown columns are rejected, and merging with no keys anywhere is a
    hard error (never a silent cartesian)."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    t = catalog.create_table(
        "nyc",
        "idtbl",
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
    )
    t.append_dataframe(spark.createDataFrame([(1, "a"), (2, "b")], t.schema))
    t.refresh()

    with _pytest.raises(ValueError, match="no merge keys"):
        t.merge_into(spark.createDataFrame([(1, "A")], t.schema))

    catalog_sql(catalog, "ALTER TABLE nyc.idtbl SET IDENTIFIER FIELDS k")
    t.refresh()
    assert t.identifier_fields == ["k"]

    t.merge_into(
        spark.createDataFrame([(1, "A"), (3, "c")], t.schema),
        when_matched_set={"v": "src_v"},
    )
    t.refresh()
    got = {(r["k"], r["v"]) for r in t.scan().collect()}
    assert got == {(1, "A"), (2, "b"), (3, "c")}

    # MOR path uses the same default
    t.merge_into_mor(
        spark.createDataFrame([(2, "B")], t.schema), when_matched_set={"v": "src_v"}
    )
    t.refresh()
    got = {(r["k"], r["v"]) for r in t.scan().collect()}
    assert got == {(1, "A"), (2, "B"), (3, "c")}

    with _pytest.raises(ValueError, match="not in schema"):
        catalog_sql(catalog, "ALTER TABLE nyc.idtbl SET IDENTIFIER FIELDS nope")

    catalog_sql(catalog, "ALTER TABLE nyc.idtbl DROP IDENTIFIER FIELDS")
    t.refresh()
    assert t.identifier_fields == []


def test_analyze_table_ndv_and_provenance(spark, catalog):
    """NDV lands within HLL tolerance of the exact distinct count, stats
    carry snapshot provenance, and re-ANALYZE after a write refreshes
    them; unknown columns fail loudly."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    t = catalog.create_table(
        "nyc",
        "antbl",
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
    )
    t.append_dataframe(
        spark.createDataFrame(
            [(i, f"g{i % 7}" if i % 5 else None) for i in range(200)], t.schema
        )
    )
    t.refresh()
    res = t.analyze()
    assert res["row_count"] == 200
    assert res["columns"]["v"]["null_count"] == 40
    assert abs(res["columns"]["k"]["ndv"] - 200) <= 10  # HLL ±~2%
    assert abs(res["columns"]["v"]["ndv"] - 7) <= 1
    assert int(t.properties["stats-snapshot-id"]) == t.current_snapshot["snapshot_id"]

    with _pytest.raises(ValueError, match="not in schema"):
        t.analyze(["nope"])

    # stale stats refresh on re-analyze after new writes
    t.append_dataframe(spark.createDataFrame([(1000, "new")], t.schema))
    t.refresh()
    out = catalog_sql(catalog, "ANALYZE TABLE nyc.antbl COMPUTE STATISTICS").collect()
    assert {r["column_name"] for r in out} == {"k", "v"}
    assert all(r["row_count"] == 201 for r in out)


def test_write_ordered_by_and_changelog_view(spark, catalog):
    """WRITE ORDERED BY declares a task-local write sort (tight per-file
    min/max → better skipping) and UNORDERED clears it; CALL
    create_changelog_view registers the queryable change feed."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    t = catalog.create_table(
        "nyc",
        "ordered",
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
        ),
    )
    catalog_sql(catalog, "ALTER TABLE nyc.ordered WRITE ORDERED BY id DESC")
    t.refresh()
    assert t.properties["write.sort-order"] == "id DESC"

    # sorted write: within every file, ids are non-increasing
    import pyarrow.parquet as pq

    t.append_dataframe(
        spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(4)
    )
    t.refresh()
    for f in t.snapshot_files():
        ids = pq.read_table(f.path, columns=["id"])["id"].to_pylist()
        assert ids == sorted(ids, reverse=True), f.path

    with _pytest.raises(ValueError, match="unknown columns"):
        catalog_sql(catalog, "ALTER TABLE nyc.ordered WRITE ORDERED BY nope")

    catalog_sql(catalog, "ALTER TABLE nyc.ordered WRITE UNORDERED")
    t.refresh()
    assert "write.sort-order" not in t.properties

    # changelog view procedure
    snap1 = t.current_snapshot["snapshot_id"]
    t.update_set("id < 10", {"v": "v + 1"})
    out = catalog_sql(
        catalog,
        f"CALL system.create_changelog_view(table => 'nyc.ordered', "
        f"start_snapshot_id => {snap1}, changelog_view => 'ordered_cdc')",
    ).collect()
    assert out[0]["changelog_view"] == "ordered_cdc"
    counts = {
        r["_change_type"]: r["n"]
        for r in spark.sql(
            "SELECT _change_type, COUNT(*) AS n FROM ordered_cdc GROUP BY 1"
        ).collect()
    }
    assert counts == {"insert": 10, "delete": 10}


def test_insert_column_list_and_dynamic_partition_overwrite(spark, catalog):
    """INSERT INTO t (cols) VALUES maps by NAME — unmentioned columns get
    their declared default else NULL; INSERT OVERWRITE on a partitioned
    table replaces ONLY the touched partitions (Iceberg dynamic mode),
    carrying untouched partitions as metadata."""
    import pytest as _pytest

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(
        catalog,
        "CREATE TABLE nyc.dynov (id BIGINT, region STRING, v BIGINT) "
        "PARTITIONED BY (region)",
    )
    t = catalog.load_table("nyc", "dynov")
    t.add_column("note", "string", default="'n/a'")
    t.refresh()

    catalog_sql(
        catalog,
        "INSERT INTO nyc.dynov (v, id, region) VALUES (10, 1, 'eu'), (20, 2, 'us')",
    )
    t.refresh()
    got = {(r["id"], r["region"], r["v"], r["note"]) for r in t.scan().collect()}
    assert got == {(1, "eu", 10, "n/a"), (2, "us", 20, "n/a")}

    with _pytest.raises(ValueError, match="not in schema"):
        catalog_sql(catalog, "INSERT INTO nyc.dynov (nope) VALUES (1)")
    with _pytest.raises(ValueError, match="values for"):
        catalog_sql(catalog, "INSERT INTO nyc.dynov (id, v) VALUES (1)")

    # dynamic overwrite: restate ONLY the 'eu' partition
    files_before = {f.path for f in t.snapshot_files()}
    catalog_sql(
        catalog,
        "INSERT OVERWRITE nyc.dynov (id, region, v) VALUES (7, 'eu', 70)",
    )
    t.refresh()
    got = {(r["id"], r["region"], r["v"]) for r in t.scan().collect()}
    assert got == {(7, "eu", 70), (2, "us", 20)}  # us partition untouched
    us_files = {
        f.path for f in t.snapshot_files() if f.partition.get("region") == "us"
    }
    assert us_files and us_files <= files_before  # carried over, not rewritten


def test_explain_passthrough(spark, catalog):
    """EXPLAIN [FORMATTED] resolves catalog refs like any query and
    returns the plan text — pushed filters and all."""
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    t = catalog.create_table(
        "nyc", "exp", T.StructType([T.StructField("id", T.LongType())])
    )
    t.append_dataframe(spark.range(100).selectExpr("id"))
    plan = catalog_sql(
        catalog, "EXPLAIN FORMATTED SELECT id FROM nyc.exp WHERE id > 5"
    ).collect()[0]["plan"]
    assert "Scan parquet" in plan and "PushedFilters" in plan
    simple = catalog_sql(catalog, "EXPLAIN SELECT COUNT(*) AS n FROM nyc.exp")
    assert "Physical Plan" in simple.collect()[0]["plan"]


def test_show_tables_and_show_partitions(spark, catalog):
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(
        catalog,
        "CREATE TABLE nyc.showme (id BIGINT, region STRING) PARTITIONED BY (region)",
    )
    t = catalog.load_table("nyc", "showme")
    t.append_dataframe(
        spark.createDataFrame(
            [(1, "eu"), (2, "us"), (3, "eu")], "id long, region string"
        )
    )
    tabs = catalog_sql(catalog, "SHOW TABLES IN nyc").collect()
    assert ("nyc", "showme") in {(r["namespace"], r["tableName"]) for r in tabs}
    parts = catalog_sql(catalog, "SHOW PARTITIONS nyc.showme").collect()
    got = {(r["partition"], r["record_count"]) for r in parts}
    assert got == {('{"region": "eu"}', 2), ('{"region": "us"}', 1)}


def test_describe_extended(spark, catalog):
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(
        catalog,
        "CREATE TABLE nyc.dext (id BIGINT, region STRING) PARTITIONED BY (region)",
    )
    t = catalog.load_table("nyc", "dext")
    t.set_identifier_fields(["id"])
    t.set_properties({"write.sort-order": "id"})
    rows = catalog_sql(catalog, "DESCRIBE EXTENDED nyc.dext").collect()
    kv = {r["col_name"]: r["data_type"] for r in rows}
    assert kv["id"] == "bigint" and kv["region"] == "string"
    assert kv["Partition Spec"] == "identity(region)"
    assert kv["Identifier Fields"] == "id"
    assert kv["Write Sort Order"] == "id"
    assert kv["Snapshots"] == "0" and kv["Current Snapshot"] == "(none)"
    # plain DESCRIBE stays columns-only
    plain = catalog_sql(catalog, "DESCRIBE nyc.dext").collect()
    assert {r["col_name"] for r in plain} == {"id", "region"}


def test_explain_refuses_dml(spark, catalog):
    """EXPLAIN over DML must not execute the side effect (running the
    body through the front-end would COMMIT it)."""
    import pytest as _pytest

    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(catalog, "CREATE TABLE nyc.expdml (id BIGINT)")
    catalog_sql(catalog, "INSERT INTO nyc.expdml VALUES (1), (2)")
    with _pytest.raises(ValueError, match="queries only"):
        catalog_sql(catalog, "EXPLAIN DELETE FROM nyc.expdml WHERE id = 1")
    t = catalog.load_table("nyc", "expdml")
    assert t.scan().count() == 2  # nothing executed


def test_merge_sql_mixed_case_columns(spark, catalog):
    """SQL identifiers are case-insensitive, but merge_into's set/values
    dicts are case-sensitive lookups — the front-end must canonicalize
    to the target schema's spelling or updates silently vanish."""
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "Id long, Total double")
    t = catalog.create_table("nyc", "mcase", df.schema)
    t.append_dataframe(df)
    catalog_sql(
        catalog,
        """
        MERGE INTO nyc.mcase AS t
        USING (SELECT * FROM VALUES (1, 5.0), (3, 30.0) AS v(Id, amt)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET total = t.total + s.amt
        WHEN NOT MATCHED THEN INSERT (id, TOTAL) VALUES (s.id, s.amt)
        """,
    )
    t.refresh()
    got = {(r["Id"], r["Total"]) for r in t.scan().collect()}
    assert got == {(1, 15.0), (2, 20.0), (3, 30.0)}


def test_snapshot_clone_carries_read_semantics(spark, catalog):
    """CALL system.snapshot must carry rename maps and column defaults —
    without them the clone scans the same files WRONG (NULLs where the
    source shows renamed/defaulted values)."""
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    t = catalog.create_table("nyc", "srcsem", df.schema)
    t.append_dataframe(df)
    t.rename_column("name", "label")
    t.add_column("region", "string", default="'emea'")
    t.refresh()
    catalog_sql(catalog, "CALL system.snapshot('nyc.srcsem', 'nyc.dstsem')")
    dst = catalog.load_table("nyc", "dstsem")
    got = {(r["id"], r["label"], r["region"]) for r in dst.scan().collect()}
    assert got == {(1, "a", "emea"), (2, "b", "emea")}


def test_show_and_create_namespaces(spark, catalog):
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(catalog, "CREATE NAMESPACE analytics")
    catalog_sql(catalog, "CREATE SCHEMA IF NOT EXISTS analytics")  # idempotent
    got = {r["namespace"] for r in catalog_sql(catalog, "SHOW NAMESPACES").collect()}
    assert "analytics" in got
    catalog_sql(catalog, "CREATE TABLE analytics.t1 (id BIGINT)")
    tabs = catalog_sql(catalog, "SHOW TABLES IN analytics").collect()
    assert [r["tableName"] for r in tabs] == ["t1"]


def test_metadata_columns_resolve_on_demand_in_sql(spark, catalog):
    """Referencing a hidden metadata column by name (Iceberg's SELECT
    _file/_row_id surface) resolves it; plain statements — including
    SELECT * — keep the clean schema."""
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog_sql(catalog, "CREATE TABLE nyc.mcols (id BIGINT, v DOUBLE)")
    catalog_sql(catalog, "INSERT INTO nyc.mcols VALUES (1, 1.5), (2, 2.5)")
    rows = catalog_sql(
        catalog, "SELECT id, _row_id, _file, _pos FROM nyc.mcols ORDER BY id"
    ).collect()
    assert sorted(r["_row_id"] for r in rows) == [0, 1]
    assert all(r["_file"].endswith(".parquet") for r in rows)
    plain = catalog_sql(catalog, "SELECT * FROM nyc.mcols").columns
    assert plain == ["id", "v"]
    # a user column containing an underscore does not trigger resolution
    catalog_sql(catalog, "CREATE TABLE nyc.underscores (o_partition BIGINT)")
    assert catalog_sql(
        catalog, "SELECT o_partition FROM nyc.underscores"
    ).columns == ["o_partition"]


def test_wap_branch_session_routing(catalog, spark, versioned_table):
    """Iceberg's spark.wap.branch write-audit-publish loop, entirely in
    session conf: with the conf set, INSERT/UPDATE/DELETE/MERGE commit to
    the branch (created at the main head on first write) and plain reads
    resolve through it; main stays untouched until CALL fast_forward
    publishes; unsetting the conf restores main-head reads."""
    _t, _s1, _s2 = versioned_table
    try:
        catalog_sql(catalog, "SET spark.wap.branch = audit")
        # write lands on the branch, visible to this session's reads
        catalog_sql(catalog, "INSERT INTO nyc.vt VALUES (4, 'd')")
        assert (
            catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").collect()[0]["n"]
            == 4
        )
        # row-level ops also land on the branch
        catalog_sql(catalog, "UPDATE nyc.vt SET s = 'dd' WHERE id = 4")
        catalog_sql(catalog, "DELETE FROM nyc.vt WHERE id = 1")
        got = {
            r["id"]: r["s"]
            for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()
        }
        assert got == {2: "b", 3: "c", 4: "dd"}
        # metadata-column scans see the SAME branch state as plain reads
        n_meta = catalog_sql(
            catalog, "SELECT COUNT(_file) AS n FROM nyc.vt"
        ).collect()[0]["n"]
        assert n_meta == 3
        # INSERT OVERWRITE under WAP is refused, not silently misrouted
        import pytest as _pytest

        with _pytest.raises(ValueError, match="WAP|OVERWRITE"):
            catalog_sql(catalog, "INSERT OVERWRITE nyc.vt VALUES (9, 'z')")
        # main head is untouched while the branch holds the audit state
        spark.conf.unset("spark.wap.branch")
        assert (
            catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").collect()[0]["n"]
            == 3
        )
        # publish: fast-forward main to the audited branch
        catalog_sql(
            catalog, "CALL system.fast_forward(table => 'nyc.vt', branch => 'audit')"
        )
        got = {
            r["id"]: r["s"]
            for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()
        }
        assert got == {2: "b", 3: "c", 4: "dd"}
    finally:
        try:
            spark.conf.unset("spark.wap.branch")
        except Exception:
            pass


def test_delete_in_subquery_equality_file(catalog, spark, versioned_table):
    """DELETE ... WHERE col IN (SELECT ...) routes through a merge-on-read
    equality-delete file: the subquery's key set is materialized (target
    names/types, deduplicated) and scans anti-join it — the table is
    never rewritten. Tuple keys and WAP-branch routing compose."""
    t, _s1, _s2 = versioned_table
    n_files_before = len(t.snapshot_files())
    catalog_sql(
        catalog,
        "DELETE FROM nyc.vt WHERE id IN (SELECT id FROM nyc.vt WHERE s >= 'b')",
    )
    t.refresh()
    got = {r["id"] for r in catalog_sql(catalog, "SELECT id FROM nyc.vt").collect()}
    assert got == {1}
    # merge-on-read: no data file was rewritten, a delete entry was added
    assert len(t.snapshot_files()) == n_files_before
    assert any(
        d["kind"] == "equality" for d in t._resolve_deletes(t.current_snapshot)
    )
    # tuple-key spelling parses and deletes the remaining row
    catalog_sql(
        catalog,
        "DELETE FROM nyc.vt WHERE (id, s) IN (SELECT 1, 'a')",
    )
    assert catalog_sql(catalog, "SELECT COUNT(*) AS n FROM nyc.vt").collect()[0]["n"] == 0


def test_alter_partition_field_ddl(catalog, spark):
    """Iceberg's ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD: spec
    evolution is metadata-only (files written under the old spec keep
    their spec_id), new writes lay out under the evolved spec, and the
    evolved transform prunes partitions on scan."""
    catalog_sql(
        catalog,
        "CREATE TABLE nyc.pf (id BIGINT, ts TIMESTAMP, region STRING) "
        "PARTITIONED BY (region)",
    )
    t = catalog.load_table("nyc", "pf")
    assert [f.name for f in t.default_spec] == ["region"]

    out = catalog_sql(catalog, "ALTER TABLE nyc.pf ADD PARTITION FIELD days(ts)")
    assert out.collect()[0]["n_partition_fields"] == 2
    t.refresh()
    assert [f.transform for f in t.default_spec] == ["identity", "day"]

    catalog_sql(
        catalog,
        "ALTER TABLE nyc.pf REPLACE PARTITION FIELD days(ts) WITH bucket(4, id)",
    )
    t.refresh()
    assert [f.transform for f in t.default_spec] == ["identity", "bucket[4]"]

    catalog_sql(catalog, "ALTER TABLE nyc.pf DROP PARTITION FIELD bucket(4, id)")
    t.refresh()
    assert [f.name for f in t.default_spec] == ["region"]

    # unknown field is an error, not a silent no-op
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in spec"):
        catalog_sql(catalog, "ALTER TABLE nyc.pf DROP PARTITION FIELD days(ts)")


def test_update_in_subquery_via_merge(catalog, spark, versioned_table):
    """UPDATE ... WHERE k IN (SELECT ...) rewrites to a MERGE on the
    materialized key set — a shuffle join, not a per-row subquery; rows
    outside the key set are untouched."""
    _t, _s1, _s2 = versioned_table
    catalog_sql(
        catalog,
        "UPDATE nyc.vt SET s = 'hit' WHERE id IN (SELECT id FROM nyc.vt WHERE id >= 2)",
    )
    got = {r["id"]: r["s"] for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()}
    assert got == {1: "a", 2: "hit", 3: "hit"}


def test_insert_by_name(catalog, spark, versioned_table):
    """INSERT INTO ... BY NAME (Spark 4): source columns align by name
    regardless of order; unmentioned columns get NULL."""
    _t, _s1, _s2 = versioned_table
    catalog_sql(catalog, "INSERT INTO nyc.vt BY NAME SELECT 'z' AS s, 9 AS id")
    got = {r["id"]: r["s"] for r in catalog_sql(catalog, "SELECT id, s FROM nyc.vt").collect()}
    assert got[9] == "z"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="BY NAME"):
        catalog_sql(catalog, "INSERT INTO nyc.vt BY NAME SELECT 1 AS nope")


def test_unset_tblproperties(catalog, spark, versioned_table):
    """ALTER TABLE UNSET TBLPROPERTIES removes keys (version bump);
    missing keys report removed=false rather than erroring."""
    t, _s1, _s2 = versioned_table
    catalog_sql(catalog, "ALTER TABLE nyc.vt SET TBLPROPERTIES('a'='1','b'='2')")
    out = catalog_sql(catalog, "ALTER TABLE nyc.vt UNSET TBLPROPERTIES ('a', 'nope')")
    got = {r["key"]: r["removed"] for r in out.collect()}
    assert got == {"a": True, "nope": False}
    t.refresh()
    assert "a" not in t.properties and t.properties["b"] == "2"


def test_in_subquery_compound_predicate_rejected(catalog, spark, versioned_table):
    """A compound WHERE mixing an IN-subquery with other predicates is
    rejected with a clear message (the alternative was a mangled
    greedy-regex parse), and column list + BY NAME is contradictory."""
    import pytest as _pytest

    _t, _s1, _s2 = versioned_table
    with _pytest.raises(ValueError, match="compound"):
        catalog_sql(
            catalog,
            "DELETE FROM nyc.vt WHERE id IN (SELECT id FROM nyc.vt WHERE id >= 2) AND s IN (SELECT 'a')",
        )
    with _pytest.raises(ValueError, match="BY NAME"):
        catalog_sql(catalog, "INSERT INTO nyc.vt (id) BY NAME SELECT 9 AS id")


def test_call_format_interop_procedures(spark, tmp_path):
    """CALL system.export_iceberg / import_delta etc. — the format
    layers reachable from plain SQL (round-trip through BOTH formats
    via four CALL statements)."""
    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.catalog.sqlfront import catalog_sql

    catalog = Catalog(spark, str(tmp_path / "wh-proc"))
    t = catalog.create_table(
        "nyc", "proc_src", spark.range(12).selectExpr("id").schema
    ).refresh()
    t.append_dataframe(spark.range(12).selectExpr("id"))

    ice = str(tmp_path / "ice-out")
    row = catalog_sql(
        catalog, f"CALL system.export_iceberg('nyc.proc_src', '{ice}')"
    ).collect()[0]
    assert row["metadata_path"].endswith(".metadata.json")

    catalog_sql(
        catalog, f"CALL system.import_iceberg('{ice}', 'nyc.proc_ice')"
    ).collect()
    assert catalog.load_table("nyc", "proc_ice").scan().count() == 12

    delta = str(tmp_path / "delta-out")
    row = catalog_sql(
        catalog, f"CALL system.export_delta('nyc.proc_ice', '{delta}')"
    ).collect()[0]
    assert row["version"] == 0

    catalog_sql(
        catalog, f"CALL system.import_delta('{delta}', 'nyc.proc_dl')"
    ).collect()
    assert sorted(
        r["id"] for r in catalog.load_table("nyc", "proc_dl").scan().collect()
    ) == list(range(12))

    # third format: the Delta import round-trips onward through Hudi
    hudi = str(tmp_path / "hudi-out")
    row = catalog_sql(
        catalog, f"CALL system.export_hudi('nyc.proc_dl', '{hudi}')"
    ).collect()[0]
    assert len(row["instant"]) == 17 and row["instant"].isdigit()

    catalog_sql(
        catalog, f"CALL system.import_hudi('{hudi}', 'nyc.proc_hd')"
    ).collect()
    assert sorted(
        r["id"] for r in catalog.load_table("nyc", "proc_hd").scan().collect()
    ) == list(range(12))


def test_call_format_maintenance_procedures(catalog, spark, tmp_path):
    """The round-7 maintenance verbs through CALL system.*: export a
    table to Delta and Hudi-MOR locations, then optimize / restore /
    clone (Delta) and compact / savepoint / restore (Hudi) and
    expire_iceberg_metadata — each returns its small Iceberg-style
    result row."""
    from pyspark.sql import types as T

    from iceberg_metadata_pipeline_spark.catalog.delta_format import (
        attach_file_dvs,
        read_delta_table,
    )
    from iceberg_metadata_pipeline_spark.catalog.hudi_format import (
        bulk_insert_mor,
        create_mor_table,
        read_hudi_table,
        upsert_mor,
    )

    st = T.StructType([T.StructField("id", T.LongType(), False)])
    t = catalog.create_table("nyc", "fm", st).refresh()
    t.append_dataframe(spark.range(20).selectExpr("id").repartition(4))
    t = t.refresh()

    # --- delta ---
    ddir = str(tmp_path / "d")
    catalog_sql(
        catalog, f"CALL system.export_delta(table => 'nyc.fm', location => '{ddir}')"
    )
    f = sorted(read_delta_table(ddir).files)[0]
    attach_file_dvs(ddir, {f: [0]}, prefix="q")
    out = catalog_sql(
        catalog,
        f"CALL system.optimize_delta(location => '{ddir}', target_file_rows => 1000)",
    ).collect()
    assert out[0]["version"] == 2
    assert not any(
        a.get("deletionVector") for a in read_delta_table(ddir).files.values()
    )
    out = catalog_sql(
        catalog, f"CALL system.restore_delta(location => '{ddir}', version => 1)"
    ).collect()
    assert out[0]["commit_version"] == 3
    cdir = str(tmp_path / "dc")
    catalog_sql(
        catalog,
        f"CALL system.clone_delta(location => '{ddir}', dest => '{cdir}')",
    )
    assert read_delta_table(cdir).files

    # --- hudi MOR ---
    hdir = str(tmp_path / "h")
    create_mor_table(hdir, "fm_mor", [], "id", st)
    bulk_insert_mor(hdir, [{"id": i} for i in range(10)], n_file_groups=1)
    upsert_mor(hdir, [{"id": 3}])
    sp = catalog_sql(
        catalog, f"CALL system.savepoint_hudi(location => '{hdir}')"
    ).collect()[0]["savepoint"]
    out = catalog_sql(
        catalog, f"CALL system.compact_hudi(location => '{hdir}')"
    ).collect()
    assert out[0]["instant"]
    assert not read_hudi_table(hdir).has_live_logs()
    catalog_sql(
        catalog,
        f"CALL system.restore_hudi(location => '{hdir}', savepoint => '{sp}')",
    )
    assert read_hudi_table(hdir).has_live_logs()  # compaction rolled back

    # --- iceberg metadata expiry ---
    idir = str(tmp_path / "i")
    catalog_sql(
        catalog, f"CALL system.export_iceberg(table => 'nyc.fm', location => '{idir}')"
    )
    t.append_dataframe(spark.createDataFrame([(99,)], st))
    t.refresh()
    catalog_sql(
        catalog, f"CALL system.export_iceberg(table => 'nyc.fm', location => '{idir}')"
    )
    out = catalog_sql(
        catalog,
        f"CALL system.expire_iceberg_metadata(location => '{idir}', keep_last => 1)",
    ).collect()
    assert out[0]["files_removed"] > 0
