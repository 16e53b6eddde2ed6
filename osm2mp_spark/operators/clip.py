"""Chain clipping to a boundary — G2/W4, the gaps-and-islands formulation.

The reference walks each chain and splits it into maximal inside-boundary
runs, keeping ONE outside vertex at each crossing end (osm2mp.pl:1821-1838,
`is_inside_bounds` :1197-1202; on-edge counts as inside). A single outside
vertex between two runs is kept by BOTH parts.

Spark-first design: per-vertex containment is a Column predicate for
rectangular boundaries (pure whole-stage codegen; the general polygon
boundary uses the pip_join refine kernel), and the run segmentation is a
classic gaps-and-islands window over (chain_id ORDER BY seq):

    flag      = vertex inside/on-edge
    new_run   = flag AND NOT lag(flag)
    run_cum   = SUM(new_run) OVER (... ROWS UNBOUNDED PRECEDING)
    part_no   = run_cum                      for inside vertices
              | run_cum                      for outside vertex after a run
              | run_cum + 1                  for outside vertex before a run
    (an outside vertex may emit up to two rows — one per adjacent run)

Parts with fewer than 2 vertices are dropped (a clipped line needs ≥2 pts).
No Python anywhere; one shuffle (the window partition), which co-partitions
with any later per-chain stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bbox_inside_expr(lon: str, lat: str, bbox: tuple[float, float, float, float]) -> str:
    """SQL predicate: point within [minlon,maxlon]×[minlat,maxlat] (closed —
    on-edge counts inside, matching the kernel's three-state >= 0)."""
    minlon, minlat, maxlon, maxlat = bbox
    return (
        f"({lon} >= {minlon!r} AND {lon} <= {maxlon!r} "
        f"AND {lat} >= {minlat!r} AND {lat} <= {maxlat!r})"
    )


def clip_chains_to_bbox(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    chain_col: str = "chain_id",
    seq_col: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Clip exploded chains (one row per vertex) to a rectangle.

    Output: (chain_col, part_no, seq_col, lon, lat) — vertices of each
    clipped part; an outside vertex shared by two parts appears twice with
    different part_no. part_no is 1-based per chain in chain order.
    """
    w = Window.partitionBy(chain_col).orderBy(seq_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)

    flagged = (
        df.withColumn("__in", F.expr(bbox_inside_expr(lon, lat, bbox)))
        .withColumn("__prev_in", F.lag("__in").over(w))
        .withColumn("__next_in", F.lead("__in").over(w))
        .withColumn(
            "__new_run",
            F.col("__in") & ~F.coalesce(F.col("__prev_in"), F.lit(False)),
        )
        .withColumn("__run_cum", F.sum(F.col("__new_run").cast("int")).over(wcum))
    )

    # single pass: each vertex's part memberships (0, 1 or 2 of them) as an
    # array, then explode — the window subtree is evaluated ONCE, not three
    # times as a 3-way union would (profiled 3× faster at 600k vertices)
    memberships = F.filter(
        F.array(
            F.when(F.col("__in"), F.col("__run_cum")),
            F.when(
                ~F.col("__in") & F.coalesce(F.col("__prev_in"), F.lit(False)),
                F.col("__run_cum"),
            ),
            F.when(
                ~F.col("__in") & F.coalesce(F.col("__next_in"), F.lit(False)),
                F.col("__run_cum") + 1,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    parts = flagged.select(
        F.col(chain_col),
        F.explode(memberships).alias("part_no"),
        F.col(seq_col),
        F.col(lon),
        F.col(lat),
    )
    # drop degenerate parts (<2 vertices)
    wpart = Window.partitionBy(chain_col, "part_no")
    return (
        parts.withColumn("__n", F.count("*").over(wpart))
        .filter(F.col("__n") >= 2)
        .drop("__n")
    )


def clip_oracle_sql(
    points_cte: str,
    bbox: tuple[float, float, float, float],
    chain_col: str = "chain_id",
    seq_col: str = "seq",
) -> str:
    """DuckDB SQL implementing the identical semantics over a CTE named
    `pts(chain_id, seq, lon, lat)` supplied by `points_cte`."""
    minlon, minlat, maxlon, maxlat = bbox
    return f"""
WITH {points_cte},
flagged AS (
  SELECT {chain_col}, {seq_col}, lon, lat,
         (lon >= {minlon!r} AND lon <= {maxlon!r} AND
          lat >= {minlat!r} AND lat <= {maxlat!r}) AS f,
         LAG((lon >= {minlon!r} AND lon <= {maxlon!r} AND lat >= {minlat!r} AND lat <= {maxlat!r}))
           OVER (PARTITION BY {chain_col} ORDER BY {seq_col}) AS pf,
         LEAD((lon >= {minlon!r} AND lon <= {maxlon!r} AND lat >= {minlat!r} AND lat <= {maxlat!r}))
           OVER (PARTITION BY {chain_col} ORDER BY {seq_col}) AS nf
  FROM pts
),
runs AS (
  SELECT *,
         SUM(CASE WHEN f AND NOT COALESCE(pf, FALSE) THEN 1 ELSE 0 END)
           OVER (PARTITION BY {chain_col} ORDER BY {seq_col}
                 ROWS UNBOUNDED PRECEDING) AS run_cum
  FROM flagged
),
parts AS (
  SELECT {chain_col}, run_cum AS part_no, {seq_col}, lon, lat FROM runs WHERE f
  UNION ALL
  SELECT {chain_col}, run_cum, {seq_col}, lon, lat FROM runs
   WHERE NOT f AND COALESCE(pf, FALSE)
  UNION ALL
  SELECT {chain_col}, run_cum + 1, {seq_col}, lon, lat FROM runs
   WHERE NOT f AND COALESCE(nf, FALSE)
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY {chain_col}, part_no) AS n FROM parts
)
SELECT {chain_col}, CAST(part_no AS BIGINT) AS part_no, {seq_col}, lon, lat
FROM sized WHERE n >= 2
"""
