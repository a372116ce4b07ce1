"""Entity resolution over the `part` name domain.

The classic ER pipeline — candidate blocking → pairwise edit-distance
matching → transitive clustering → canonical representative — done
Spark-first: blocking turns the O(n²) match step into per-block
self-joins (a hash-partitioned equi-join on the block key), and the
cluster step is the engine's generic min-label-propagation components
(`operators/graph.min_label_components`). The DuckDB oracle rebuilds
the same clusters with a recursive CTE (the dedup_lsh_components
precedent).

At 100 TB: the name-distinct step collapses the fact table to the
entity-name domain (vocabulary-sized), blocks bound the pair blowup,
and levenshtein runs JVM-side per candidate pair only. Skewed blocks
(one noun dominating) would salt the block key or cap block size
before the self-join — the dedup family's df-cap lesson.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import min_label_components
from ..tables import load_tables
from .registry import register

_MAX_EDIT = 2

_ER_ORACLE = f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
),
blocked AS (
  SELECT name, string_split(name, ' ')[-1] AS block FROM names
),
adj AS (
  SELECT a.name AS src, b.name AS dst
  FROM blocked a JOIN blocked b
    ON a.block = b.block AND a.name < b.name
   AND levenshtein(a.name, b.name) <= {_MAX_EDIT}
),
sym AS (
  SELECT src, dst FROM adj UNION SELECT dst, src FROM adj
),
reach AS (
  SELECT name AS node, name AS label FROM names
  UNION
  SELECT s.dst, r.label FROM sym s JOIN reach r ON r.node = s.src
),
comp AS (
  SELECT node AS name, MIN(label) AS entity_id FROM reach GROUP BY node
)
SELECT name, entity_id,
       CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT) AS cluster_size
FROM comp
"""


@register("er_entity_clusters", oracle=_ER_ORACLE,
          description="entity resolution: block, edit-distance match, transitive cluster")
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve part-name variants into entities.

    Block key = last token (the product noun), match = levenshtein ≤ 2
    within a block, cluster = connected components, entity id = the
    minimum member name. Unmatched names stay as singleton entities
    (the components operator seeds every node).
    """
    t = load_tables(spark, sf_dir)
    names = (
        t["part"].where(F.col("p_name").isNotNull())
        .select(F.col("p_name").alias("name")).distinct()
    )
    blocked = names.withColumn("block", F.element_at(F.split("name", " "), -1))
    a = blocked.alias("a")
    b = blocked.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name"))
            & (F.levenshtein(F.col("a.name"), F.col("b.name")) <= _MAX_EDIT),
        )
        .select(F.col("a.name").alias("src"), F.col("b.name").alias("dst"))
    )
    comp = min_label_components(names, edges, node_col="name")
    from pyspark.sql.window import Window

    return comp.select(
        "name",
        F.col("component_rep").alias("entity_id"),
        F.count("*").over(Window.partitionBy("component_rep")).cast("long")
        .alias("cluster_size"),
    )
