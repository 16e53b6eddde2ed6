"""Sinks (SURVEY §2.1 S7-S11): per-tile partitioned writes and the
Polish-format text renderer.

- S8/S11 (multiout / per-tile re-emit): `write_per_tile` — the native Spark
  shape is `df.write.partitionBy('tile_id')`; every tile becomes a
  directory, writable in one pass regardless of tile count (the reference
  needed RAM-bounded multipass batches, _old/splitter.pl:314-334).
- S9 (shapefile layers): `write_layers` — one partitioned parquet dataset
  per layer with the fixed per-layer schema, the columnar stand-in for the
  5 DBF schemas of WriterMPC.pm:28-89.
- S7 (MP text): `render_mp_points` — golden-text rendering of point
  sections ([POI] blocks, cfg/output-polish.yml semantics) used by tests;
  production output stays columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_per_tile(df: DataFrame, out_dir: str, tile_col: str = "tile_id",
                   fmt: str = "parquet") -> None:
    """S8/S11 — route each record to its tile's output in one pass."""
    df.write.mode("overwrite").partitionBy(tile_col).format(fmt).save(out_dir)


def write_layers(layers: dict[str, DataFrame], out_dir: str) -> None:
    """S9 — one dataset per layer (points/lines/areas/roads/...)."""
    for name, df in layers.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")


def render_mp_points(rows, default_level: int = 0) -> str:
    """S7 — Polish-format [POI] sections from (type_code, label, lon, lat)
    rows. Data(level)=(lat,lon) per the MP spec; deterministic row order is
    the caller's job (sort by natural key)."""
    out = []
    for type_code, label, lon, lat in rows:
        out.append(
            "[POI]\n"
            f"Type=0x{type_code:x}\n"
            f"Label={label}\n"
            f"Data{default_level}=({lat:.5f},{lon:.5f})\n"
            "[END]\n"
        )
    return "\n".join(out)
