"""Set-operation surface (SURVEY.md §2.B set ops): UNION [ALL],
INTERSECT [ALL], EXCEPT [ALL] — shared ANSI SQL, identical in DuckDB.

Scale note: INTERSECT/EXCEPT compile to aggregate+join on all columns —
at 100 TB prefer key-based semi/anti joins (declared in joins.py) when a
key exists; these remain for full-row semantics.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

sql_query(
    "setop_union_all",
    """
SELECT c_nationkey AS nationkey FROM customer
UNION ALL
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)

sql_query(
    "setop_union_distinct",
    """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)

sql_query(
    "setop_intersect",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)

sql_query(
    "setop_except",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)

sql_query(
    "setop_intersect_all",
    """
SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'O'
ORDER BY prio
""",
)

sql_query(
    "setop_except_all",
    """
SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'P'
ORDER BY prio
""",
)
