"""Deterministic derived positions — the engine's `(lon, lat) = G(id)` rule.

SURVEY §1.4: every fact row (image / any keyed row) carries a deterministic
position derived from its integer key. The derivation uses ONLY exact integer
arithmetic followed by one correctly-rounded IEEE division, so Spark (JVM),
DuckDB (C++), and numpy produce bit-identical doubles — which the driver's
value-hash correctness gate requires.

    lon = -180 + ((key mod 3600000) * 2654435761 mod 3600000) / 10000
    lat =  -85 + ((key mod 1700000) * 40503      mod 1700000) / 10000

(2654435761 = Knuth's multiplicative-hash constant; 40503 another odd
multiplier. Both coprime to the moduli → good scatter. Reducing the key
mod m BEFORE multiplying leaves the result unchanged — (a mod m)·b mod m
= a·b mod m — while keeping the product < 2^63 for any bigint key, so
Spark's ANSI overflow check never fires and numpy never wraps.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

LON_MULT = 2654435761
LON_MOD = 3_600_000
LAT_MULT = 40503
LAT_MOD = 1_700_000


def derived_lon_sql(key_expr: str) -> str:
    """ANSI-SQL expression (valid in both Spark SQL and DuckDB)."""
    # NB: the divisor is written 1e4, not 10000.0 — Spark parses a x.y
    # literal as DECIMAL and would do exact decimal division on a bigint
    # numerator; 1e4 is a double literal in both Spark and DuckDB.
    return (
        f"(-180.0 + (CAST({key_expr} AS BIGINT) % {LON_MOD} * {LON_MULT}"
        f" % {LON_MOD}) / 1e4)"
    )


def derived_lat_sql(key_expr: str) -> str:
    return (
        f"(-85.0 + (CAST({key_expr} AS BIGINT) % {LAT_MOD} * {LAT_MULT}"
        f" % {LAT_MOD}) / 1e4)"
    )


def with_derived_position(df: DataFrame, key_col: str, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Attach derived lon/lat columns (JVM-side, codegen'd)."""
    return df.withColumn(lon, F.expr(derived_lon_sql(key_col))).withColumn(
        lat, F.expr(derived_lat_sql(key_col))
    )


def derived_points_np(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin for oracles/tests — bit-identical to the SQL expressions
    for ANY bigint key: np.fmod is truncation-mod (follows the dividend
    sign), matching SQL `%`; numpy's `%` is floor-mod and would diverge on
    negative keys."""
    k = np.asarray(keys, dtype=np.int64)
    lon = -180.0 + np.fmod(np.fmod(k, LON_MOD) * LON_MULT, LON_MOD) / 10000.0
    lat = -85.0 + np.fmod(np.fmod(k, LAT_MOD) * LAT_MULT, LAT_MOD) / 10000.0
    return lon, lat


# lineitem chain keys shared by every query/oracle that walks lineitem as
# ordered chains: the synthetic data has duplicate (l_orderkey, l_linenumber)
# pairs, so the vertex ORDER key packs (linenumber, partkey, suppkey) —
# unique per chain; the vertex POSITION key is decorrelated from the chain.
# Single source of truth — these appear verbatim inside oracle SQL strings,
# so a drifted copy would silently desynchronize Spark vs DuckDB.
LINEITEM_SEQ_SQL = (
    "(CAST(l_linenumber AS BIGINT) * 1000000000000 "
    "+ CAST(l_partkey AS BIGINT) * 1000000 + l_suppkey)"
)
LINEITEM_VKEY_SQL = "(CAST(l_partkey AS BIGINT) * 10 + l_linenumber)"
