"""Recursive CTED shapes + SQL scripting (Spark 4 procedural SQL).

The reference deploys "all of Spark SQL" through its Thrift server
(SURVEY.md §2.B, entrypoint-spark.sh:73), which on a Spark 4 engine
includes WITH RECURSIVE (SPARK-24497) and SQL scripting
(BEGIN..END / DECLARE / SET / WHILE / IF, SPARK-48338).  The linear
recursive walk is declared in modern_sql.py (subquery_recursive_cte);
this module adds the three recursive shapes users actually reach for —
hierarchy roll-up, calendar spine, bounded transitive closure — plus
the scripting control-flow surface.

Scale notes.  A recursive CTE executes as an iterated UNION: each level
is one Catalyst plan (join against the previous level) and the engine
materializes level frontiers, so *depth* is the coordination factor
while each level's join distributes normally — the same discipline as
the hand-built loops in queries/graph.py, now expressed declaratively.
Depth here is data-logarithmic (DIV-10 hierarchy: 5 levels at 100× the
keys) or constant (90-day spine, 5-hop closure), so the shapes hold at
100 TB: the per-level joins are key-partitioned shuffles over frontier
rows, never all-pairs.  SQL scripting is driver-side control flow ONLY:
variables fold into the final plan as literals (the heavy SELECT still
gets pushdown/pruning), and each loop iteration costs one tiny Catalyst
round, not a cluster job, as long as the loop body stays scalar.

Oracle strategy: DuckDB speaks WITH RECURSIVE natively (integer DIV
spelled ``//``); scripting oracles state the closed-form query with the
script's variable values inlined.
"""

from __future__ import annotations

from iceberg_metadata_pipeline_spark.queries import sql_query

# --- recursive hierarchy roll-up -------------------------------------
# Synthetic N-ary tree over customers: parent(key) = key DIV 10 (keys
# 0..9 are roots).  Depth is log10 of the key space — 4 levels at
# sf0.01, 5 at sf0.1 — and each level's join is an equi-join on the
# parent key over frontier rows only.  path_bal accumulates exactly in
# DECIMAL(38,6) along the root→node path (deterministic order), so the
# per-depth sums are bit-stable across engines.
sql_query(
    "sql_recursive_hierarchy_rollup",
    """
WITH RECURSIVE tree(key, depth, path_bal) AS (
  SELECT c_custkey, 0, CAST(c_acctbal AS DECIMAL(38,6))
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, t.depth + 1,
         t.path_bal + CAST(c.c_acctbal AS DECIMAL(38,6))
  FROM tree t JOIN customer c
    ON c.c_custkey DIV 10 = t.key AND c.c_custkey >= 10
)
SELECT depth, COUNT(*) AS n_nodes,
       CAST(SUM(path_bal) AS DOUBLE) AS sum_path_bal,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM tree
GROUP BY depth
ORDER BY depth
""",
    oracle="""
WITH RECURSIVE tree(key, depth, path_bal) AS (
  SELECT c_custkey, 0, CAST(c_acctbal AS DECIMAL(38,6))
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, t.depth + 1,
         t.path_bal + CAST(c.c_acctbal AS DECIMAL(38,6))
  FROM tree t JOIN customer c
    ON c.c_custkey // 10 = t.key AND c.c_custkey >= 10
)
SELECT depth, COUNT(*) AS n_nodes,
       CAST(SUM(path_bal) AS DOUBLE) AS sum_path_bal,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM tree
GROUP BY depth
ORDER BY depth
""",
)

# --- recursive calendar spine ----------------------------------------
# The classic date-dimension generator: recursion depth = spine length
# (constant 90), independent of fact-table size; the LEFT JOIN
# distributes on the date key.  The non-recursive spelling
# (events_gap_fill_resample's sequence()+explode) is the bulk tool;
# this proves the portable-SQL spelling runs too.
sql_query(
    "sql_recursive_date_spine",
    """
WITH RECURSIVE spine(d) AS (
  SELECT DATE'1995-01-01'
  UNION ALL
  SELECT date_add(d, 1) FROM spine WHERE d < DATE'1995-03-30'
)
SELECT s.d, COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.d
GROUP BY s.d
ORDER BY s.d
""",
    oracle="""
WITH RECURSIVE spine(d) AS (
  SELECT DATE'1995-01-01'
  UNION ALL
  SELECT d + 1 FROM spine WHERE d < DATE'1995-03-30'
)
SELECT s.d, COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM spine s LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = s.d
GROUP BY s.d
ORDER BY s.d
""",
)

# --- bounded transitive closure --------------------------------------
# Derived functional graph on the 25 nations (two out-edges per node,
# pure integer arithmetic so both engines build the identical edge
# set).  The hop bound caps the UNION ALL frontier — the standard guard
# for closure over a cyclic graph — and the outer query collapses
# duplicate paths to per-(src,dst) min hops before aggregating.  At
# scale this is the SQL spelling of graph_bfs_reachability's iterative
# plan: frontier joins only, never all-pairs.
sql_query(
    "sql_recursive_transitive_closure",
    """
WITH RECURSIVE
edges AS (
  SELECT n_nationkey AS src, (2 * n_nationkey + 1) % 25 AS dst FROM nation
  UNION ALL
  SELECT n_nationkey AS src, (3 * n_nationkey + 2) % 25 AS dst FROM nation
),
closure(src, dst, hop) AS (
  SELECT src, dst, 1 FROM edges
  UNION ALL
  SELECT c.src, e.dst, c.hop + 1
  FROM closure c JOIN edges e ON e.src = c.dst
  WHERE c.hop < 5
)
SELECT src, COUNT(*) AS n_reachable,
  CAST(SUM(min_hop) AS BIGINT) AS sum_min_hops
FROM (
  SELECT src, dst, MIN(hop) AS min_hop
  FROM closure GROUP BY src, dst
) m
GROUP BY src
ORDER BY src
""",
    oracle="same",
)

# --- SQL scripting: WHILE loop ---------------------------------------
# Control flow runs on the driver; the loop computes a scalar threshold
# (5 rounds of integer arithmetic — zero cluster jobs), which folds
# into the final SELECT as a literal, so the orders scan still gets its
# filter pushed down.  threshold = 1000*(1+2+3+4+5) = 15000.
sql_query(
    "sql_script_control_flow",
    """
BEGIN
  DECLARE threshold DOUBLE DEFAULT 0;
  DECLARE i INT DEFAULT 0;
  WHILE i < 5 DO
    SET i = i + 1;
    SET threshold = threshold + i * 1000;
  END WHILE;
  SELECT o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
           AS revenue
  FROM orders
  WHERE o_totalprice > threshold
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority;
END
""",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM orders
WHERE o_totalprice > 15000
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)

# --- SQL scripting: branching + REPEAT/LEAVE -------------------------
# IF branches on a data-dependent scalar (COUNT(*) > 0 — stable at
# every SF, so the oracle states the taken branch); the labelled REPEAT
# exercises LEAVE.  The branch sets a multiplier the final SELECT uses;
# again everything folds to literals before the one real scan.
sql_query(
    "sql_script_branching",
    """
BEGIN
  DECLARE mult INT DEFAULT 0;
  DECLARE spins INT DEFAULT 0;
  IF (SELECT COUNT(*) FROM orders) > 0 THEN
    SET mult = 3;
  ELSE
    SET mult = 99;
  END IF;
  loop_label: REPEAT
    SET spins = spins + 1;
    IF spins >= 4 THEN
      LEAVE loop_label;
    END IF;
  UNTIL spins > 100 END REPEAT;
  SELECT o_orderstatus, COUNT(*) * mult AS weighted_n,
         spins AS loop_spins
  FROM orders
  GROUP BY o_orderstatus
  ORDER BY o_orderstatus;
END
""",
    oracle="""
SELECT o_orderstatus, COUNT(*) * 3 AS weighted_n, 4 AS loop_spins
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
