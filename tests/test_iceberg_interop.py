"""Real-Iceberg interop — gated on the runtime jar's presence.

The metacat warehouse reimplements Iceberg's semantics (snapshots,
sequence numbers, refs, MOR deletes) over JSON metadata; a real
`iceberg-spark-runtime` (the reference pins 1.9.2, pom.xml:18) cannot
read that JSON — a SANCTIONED degrade (SURVEY.md: no jar offline).
This module pins the interop we CAN promise the day a jar appears:

- an Iceberg-written table's data files are ingestible through the
  registration path, and the scan matches Iceberg's own;
- the reverse direction (Iceberg reading metacat tables) stays a
  documented limitation, not silently assumed.

Without the jar every test here SKIPS — visibly, not silently.
"""

from __future__ import annotations

import glob
import os

import pytest


def _find_iceberg_jar() -> str | None:
    """Look anywhere a jar could plausibly be provisioned: pyspark's own
    jar dir, $SPARK_CLASSPATH entries, and /opt/jars."""
    import pyspark

    candidates = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    candidates += os.environ.get("SPARK_CLASSPATH", "").split(os.pathsep)
    candidates += ["/opt/jars", "/opt/spark/jars"]
    for d in candidates:
        if not d or not os.path.isdir(d):
            continue
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


ICEBERG_JAR = _find_iceberg_jar()


@pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason="iceberg-spark-runtime jar not on any known classpath "
    "(sanctioned offline degrade — see module docstring)",
)
def test_ingest_real_iceberg_table(tmp_path):
    """Round-trip: real Iceberg writes → metacat registers the data files
    → scans agree row-for-row. Pins the parquet-level format assumptions
    (file layout, types) that the registration path depends on."""
    from pyspark.sql import SparkSession

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.ingest.register import import_data_root

    wh = str(tmp_path / "ice_wh")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-interop")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", wh)
        .getOrCreate()
    )
    try:
        spark.sql("CREATE TABLE ice.db.t (id BIGINT, name STRING) USING iceberg")
        spark.sql("INSERT INTO ice.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        spark.sql("DELETE FROM ice.db.t WHERE id = 2")
        expected = {(r["id"], r["name"]) for r in spark.sql("SELECT * FROM ice.db.t").collect()}

        # Iceberg's live data files (post-delete) via its files metadata table
        live = [
            r["file_path"]
            for r in spark.sql("SELECT file_path FROM ice.db.t.files").collect()
        ]
        root = tmp_path / "staged" / "t"
        root.mkdir(parents=True)
        for i, p in enumerate(live):
            os.symlink(p.removeprefix("file:"), root / f"part-{i}.parquet")

        catalog = Catalog(spark, str(tmp_path / "metacat_wh"))
        report = import_data_root(spark, catalog, str(root.parent))
        assert not report.failed, report.failed
        got = {
            (r["id"], r["name"])
            for r in catalog.load_table("nyc", "t").scan().collect()
        }
        assert got == expected
    finally:
        spark.stop()


def test_reverse_direction_is_documented():
    """Iceberg-reads-metacat is served by an EXPLICIT export
    (catalog/iceberg_format.py: export_iceberg_table writes a spec-v2
    mirror — metadata JSON + avro manifests — at a separate location;
    tests/test_iceberg_format.py proves compliance). Metacat's OWN
    metadata dir must still contain no files a real Iceberg would mistake
    for its own (no .avro manifests, no metadata.json claiming
    format-version compliance) — the two formats share file NAMES
    (v{N}.metadata.json), so in-place mixing would corrupt both."""
    import json
    import tempfile

    from iceberg_metadata_pipeline_spark.catalog.metacat import Catalog
    from iceberg_metadata_pipeline_spark.session import get_spark
    from pyspark.sql import types as T

    spark = get_spark()
    wh = tempfile.mkdtemp(prefix="wh-interop-")
    catalog = Catalog(spark, wh)
    t = catalog.create_table(
        "nyc", "doc_check", T.StructType([T.StructField("id", T.LongType())])
    )
    t.append_dataframe(spark.range(3).selectExpr("id"))
    meta_files = glob.glob(os.path.join(wh, "**", "metadata", "*"), recursive=True)
    assert meta_files, "expected metadata files"
    assert not any(f.endswith(".avro") for f in meta_files)
    for f in meta_files:
        if f.endswith(".metadata.json"):
            doc = json.load(open(f))
            # Iceberg's TableMetadataParser requires "format-version"
            # (hyphenated) and per-field integer "id" + "required" keys;
            # ours is Spark's StructType JSON under "format_version".
            # A real parser therefore fails fast instead of misreading —
            # pinned here so a future format drift is loud.
            assert "format-version" not in doc and "format_version" in doc
            for fld in doc["schema"]["fields"]:
                assert "id" not in fld and "nullable" in fld
