"""Audit declared-query output types for driver-harness compatibility.

The driver canonicalizes results with pandas and hashes values
type-sensitively, so two failure families must never reach it:
  1. array/map/struct output columns (``TypeError: unhashable type``
     inside pandas' factorize), and
  2. numeric result-type divergence between engines — DuckDB's
     ``SUM(int)`` is HUGEINT/DECIMAL while Spark's is BIGINT, which
     value-hashes differently even when the numbers agree.

This audit builds every query plan at sf0.001 (schemas only, no
execution) and every oracle as a DuckDB LIMIT-0 relation, then flags
both families. Run in CI-fashion before each round's registry freeze:

    python tools/audit_output_types.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.001"

# engine-type → comparison family; differing families hash differently
_FAMILY = {
    # spark simpleString prefixes
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "decimal": "decimal",
    "string": "str", "boolean": "bool", "date": "date", "timestamp": "ts",
    "timestamp_ntz": "ts", "binary": "bytes",
    # duckdb DESCRIBE names
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "decimal", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "decimal",
    "DECIMAL": "decimal", "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "bytes",
}


def _family(type_str: str) -> str:
    t = type_str.split("(")[0].strip()
    return _FAMILY.get(t, f"other:{t}")


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from iceberg_metadata_pipeline_spark.session import get_spark

    spark = get_spark("type-audit")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_flag = 0
    for name, fn in qs.items():
        flags = []
        try:
            sdf = fn(spark, SF_DIR)
            s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"FLAG {name}: spark plan failed: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        for col, st in s_types.items():
            if st.startswith(("array", "map", "struct")):
                flags.append(f"unhashable output column {col}: {st}")
            if st.startswith("decimal") and name in oracles:
                # Spark toPandas → Decimal objects; DuckDB df() → float64.
                # Same values, different hashes. Cast to DOUBLE/STRING instead.
                flags.append(f"decimal output column {col}: {st} (pandas-divergent)")
            if st == "boolean" and name in oracles:
                # r3 driver lesson (agg_bool_count_if): identical boolean
                # values hash differently through the driver's canonicalizer
                # (numpy.bool_ vs Python bool vs object dtype). CAST boolean
                # outputs to INT in BOTH dialects.
                flags.append(f"boolean output column {col} (driver-hash-divergent)")
        if name in oracles:
            try:
                rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
                d_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
            except Exception as e:  # noqa: BLE001
                flags.append(f"oracle plan failed: {type(e).__name__}: {e}")
                d_types = {}
            for col, st in s_types.items():
                if col not in d_types:
                    continue  # name mismatch → driver schema check catches it
                sf, df_ = _family(st), _family(d_types[col])
                if sf != df_:
                    flags.append(
                        f"type family mismatch {col}: spark {st} ({sf}) vs duckdb {d_types[col]} ({df_})"
                    )
        if flags:
            n_flag += 1
            print(f"FLAG {name}:")
            for f in flags:
                print(f"     {f}")
    print(f"\n{n_flag} flagged / {len(qs)} queries")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
