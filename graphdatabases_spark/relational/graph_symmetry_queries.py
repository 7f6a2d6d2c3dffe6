"""Symmetry-breaking graph kernels, continued (SURVEY §2.2 graph
analytics).

New module (round 12): graph_queries.py sits near the 2k bar after the
MIS/matching additions; this is the growth home for the
symmetry-breaking family (coloring now; b-matching and the incremental
matching/MIS repairs are round-13 queue candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.relational.catalog import register
from graphdatabases_spark.relational.graph_queries import (
    ENTITY_EDGES_SQL,
    _mis_side,
    entity_edges,
)

_GC_COLORS = 20  # oracle unroll: measured 5/6/16 colors at the 3 sfs
_GC_ROUNDS = 8   # per-extraction MIS rounds (measured max 6 at sf0.1)


def _gc_mis_sql(c: int) -> str:
    """One full MIS extraction (unrolled parallel rounds) over the
    color-c residual vertex set r{c-1}, emitting mis{c} and the next
    residual r{c}."""
    rounds = []
    for k in range(1, _GC_ROUNDS + 1):
        rounds.append(f"""
    cw{c}_{k} AS MATERIALIZED (
      SELECT u.id, u.h FROM cu{c}_{k - 1} u
      WHERE NOT EXISTS (
        SELECT 1 FROM sym s JOIN cu{c}_{k - 1} n ON n.id = s.dst
        WHERE s.src = u.id
          AND (n.h < u.h OR (n.h = u.h AND n.id < u.id))
      )
    ),
    cu{c}_{k} AS MATERIALIZED (
      SELECT u.id, u.h FROM cu{c}_{k - 1} u
      WHERE NOT EXISTS (SELECT 1 FROM cw{c}_{k} w WHERE w.id = u.id)
        AND NOT EXISTS (
          SELECT 1 FROM sym s JOIN cw{c}_{k} w ON w.id = s.dst
          WHERE s.src = u.id
        )
    )""")
    mis_union = " UNION ALL ".join(
        f"SELECT id FROM cw{c}_{k}" for k in range(1, _GC_ROUNDS + 1)
    )
    return f"""
    cu{c}_0 AS MATERIALIZED (SELECT id, h FROM r{c - 1}),
    {",".join(rounds)},
    mis{c} AS MATERIALIZED ({mis_union}),
    r{c} AS MATERIALIZED (
      SELECT v.id, v.h FROM r{c - 1} v
      WHERE NOT EXISTS (SELECT 1 FROM mis{c} m WHERE m.id = v.id)
    )"""


@register(
    "graph_coloring_mis",
    oracle=f"""
    WITH {ENTITY_EDGES_SQL},
    symfull AS MATERIALIZED (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    verts AS MATERIALIZED (
      SELECT DISTINCT src AS id,
        ('0x' || substr(md5('mis' || src), 1, 12))::BIGINT AS h
      FROM symfull
    ),
    -- residual-restricted adjacency is expressed per extraction by
    -- joining against the residual vertex set; the shared sym is the
    -- full relation (the per-round NOT EXISTS already intersects with
    -- the round's undecided set, which is residual-bounded)
    sym AS MATERIALIZED (SELECT src, dst FROM symfull),
    r0 AS MATERIALIZED (SELECT id, h FROM verts),
    {",".join(_gc_mis_sql(c) for c in range(1, _GC_COLORS + 1))},
    colored AS MATERIALIZED (
      {" UNION ALL ".join(
        f"SELECT id, {c} AS color FROM mis{c}"
        for c in range(1, _GC_COLORS + 1)
      )}
    ),
    improper AS (
      SELECT CAST(count(*) AS BIGINT) AS viol
      FROM symfull s
      JOIN colored a ON a.id = s.src
      JOIN colored b ON b.id = s.dst AND b.color = a.color
    )
    SELECT CAST(color AS INT) AS color,
      CAST(count(*) AS BIGINT) AS n_vertices,
      CAST(sum(id) AS BIGINT) AS sum_ids,
      (SELECT CAST(max(color) AS BIGINT) FROM colored) AS n_colors,
      (SELECT viol FROM improper) = 0 AS proper,
      (SELECT count(*) FROM r{_GC_COLORS}) = 0 AS converged
    FROM colored GROUP BY color
    ORDER BY color
    """,
    doc="GREEDY GRAPH COLORING VIA ITERATED MIS — the classic "
    "distributed coloring construction (Luby): extract the "
    "deterministic fixed-priority MIS of the residual graph, assign "
    "it color c, remove it, repeat until no vertex remains. Reuses "
    "graph_mis_luby's kernel verbatim per extraction (same md5 "
    "priorities, same strict-local-min rounds), so every color class "
    "is the unique lexicographically-first MIS of its residual and "
    "the whole coloring is a pure function of the graph — "
    "engine-exact under any schedule. Color count is NOT minimized "
    "(proper coloring, greedy bound): measured 5/6/16 colors at "
    f"sf0.001/0.01/0.1 — hub neighborhoods force a long tail of tiny "
    f"classes on the entity graph; the {_GC_COLORS}-"
    f"extraction x {_GC_ROUNDS}-round oracle unroll carries a "
    "converged guard (empty final residual) that fails the "
    "differential loudly if a bigger fixture needs more. The output "
    "carries the PROPERNESS proof computed independently on both "
    "engines (no edge joins two same-colored vertices) plus per-class "
    "sizes and membership checksums — the serving shape of a "
    "conflict-free scheduling layer (color = wave number in which a "
    "vertex's job may run). Scale shape: per extraction the MIS "
    "rounds exchange only the geometrically-shrinking undecided set "
    "against the once-partitioned symmetric edges; residuals shrink "
    "per color, so total exchanged rows are a small multiple of |E|.",
)
def graph_coloring_mis(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T

    edges = entity_edges(spark, sf, dedup=True)
    sym = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition("dst")
        .localCheckpoint(eager=True)
    )
    rem = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn(
            "h",
            T.portable_hash64(F.concat(F.lit("mis"), F.col("id").cast("string"))),
        )
        .localCheckpoint(eager=True)
    )
    colored = None
    color = 0
    n_rem = rem.count()
    while n_rem > 0:
        color += 1
        und = rem
        n_und = n_rem
        mis = None
        while n_und > 0:
            # strict (h, id) local min over UNDECIDED neighbors —
            # neighbors outside the residual never constrain because
            # und only ever contains residual vertices
            nbr_min = (
                sym.join(
                    _mis_side(
                        und.select(
                            F.col("id").alias("nid"), F.col("h").alias("nh")
                        ),
                        n_und,
                    ),
                    sym.dst == F.col("nid"),
                )
                .groupBy("src")
                .agg(F.min(F.struct(F.col("nh"), F.col("nid"))).alias("mn"))
            )
            win = (
                und.join(nbr_min, und.id == nbr_min.src, "left")
                .filter(
                    F.col("mn").isNull()
                    | (F.struct(F.col("h"), F.col("id")) < F.col("mn"))
                )
                .select("id")
                .localCheckpoint(eager=True)
            )
            mis = win if mis is None else mis.unionByName(win)
            knocked = (
                sym.join(_mis_side(win, win.count()), sym.src == win.id)
                .select(F.col("dst").alias("id"))
                .unionByName(win.select("id"))
            )
            und = und.join(knocked, "id", "left_anti").localCheckpoint(
                eager=True
            )
            n_und = und.count()
        mis = mis.localCheckpoint(eager=True)
        part = mis.withColumn("color", F.lit(color))
        colored = part if colored is None else colored.unionByName(part)
        rem = rem.join(mis, "id", "left_anti").localCheckpoint(eager=True)
        n_rem = rem.count()
    colored = colored.localCheckpoint(eager=True)
    ca = colored.select(F.col("id").alias("aid"), F.col("color").alias("acol"))
    cb = colored.select(F.col("id").alias("bid"), F.col("color").alias("bcol"))
    improper = (
        sym.join(ca, sym.src == F.col("aid"))
        .join(cb, (sym.dst == F.col("bid")) & (F.col("acol") == F.col("bcol")))
        .count()
    )
    return (
        colored.groupBy("color")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.sum("id").cast("long").alias("sum_ids"),
        )
        .select(
            F.col("color").cast("int"),
            "n_vertices",
            "sum_ids",
            F.lit(color).cast("long").alias("n_colors"),
            F.lit(improper == 0).alias("proper"),
            F.lit(True).alias("converged"),
        )
        .orderBy("color")
    )
