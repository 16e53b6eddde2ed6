"""G1: multipolygon ring assembly on Spark.

Relations are dimension-scale (millions at planet scale, but each with a
handful of member ways), so the Spark shape is groupBy(rel_id) +
applyInPandas: each group stitches its member chains with the same
pure-Python kernel the oracle uses — per-group data is tiny, the fan-out
across relations is where Spark parallelism pays. Broken relations are
dropped (lib/OSM.pm:186 semantics).

Input schema:  (rel_id string, way_id string, role string, seq int,
                chain array<struct<lon:double, lat:double>>)
Output schema: (rel_id string, ring_no int, is_inner boolean,
                pts array<struct<lon:double, lat:double>>)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..oracle.reference import stitch_rings_oracle

RING_SCHEMA = (
    "rel_id string, ring_no int, is_inner boolean, "
    "pts array<struct<lon:double, lat:double>>"
)


def assemble_rings(members: DataFrame) -> DataFrame:
    """Stitch member ways into closed outer/inner rings per relation.

    Executes via grouped_map_in_pandas — one Python transition per Arrow
    batch instead of per relation (relations are tiny, there are millions)."""
    from .grouped import grouped_map_in_pandas

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        mems = [
            (row.role, [(p["lon"], p["lat"]) for p in row.chain])
            for row in pdf.itertuples()
        ]
        res = stitch_rings_oracle(mems)
        rows = []
        if res is not None:
            rel = pdf["rel_id"].iloc[0]
            n = 0
            for ring in res["outers"]:
                rows.append(
                    (rel, n, False, [{"lon": x, "lat": y} for x, y in ring])
                )
                n += 1
            for ring in res["inners"]:
                rows.append((rel, n, True, [{"lon": x, "lat": y} for x, y in ring]))
                n += 1
        return pd.DataFrame(rows, columns=["rel_id", "ring_no", "is_inner", "pts"])

    return grouped_map_in_pandas(
        members, "rel_id", stitch, schema=RING_SCHEMA, order="seq"
    )


def nest_contours(
    contours,
    rel_col: str = "rel_id",
    no_col: str = "contour_no",
    ring_col: str = "ring",
):
    """G6 (osm2mp.pl:1752-1764) on Spark: per-relation contour grouping via
    grouped_map_in_pandas (contour sets are tiny; relations distribute).
    Input rows: (rel_col, no_col, ring_col array<struct<lon,lat>>).
    Output: (rel_col, contour_no, polygon_no, is_inner)."""
    import pandas as pd

    from ..oracle.reference import nest_contours_oracle
    from .grouped import grouped_map_in_pandas

    schema = f"{rel_col} bigint, contour_no int, polygon_no int, is_inner boolean"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(no_col)
        rings = [
            [(p["lon"], p["lat"]) for p in ring] for ring in pdf[ring_col]
        ]
        nos = pdf[no_col].to_numpy()
        rel = pdf[rel_col].iloc[0]
        rows = [
            (rel, int(nos[idx]), pno, inner)
            for idx, pno, inner in nest_contours_oracle(rings)
        ]
        return pd.DataFrame(
            rows, columns=[rel_col, "contour_no", "polygon_no", "is_inner"]
        )

    return grouped_map_in_pandas(contours, rel_col, kernel, schema=schema)
