"""MP → Garmin type translation + housenumber pseudoroads (§2.9 tail).

The reference translates MP type codes to Garmin shapefile type names via
a 414-row data table keyed by (shape kind, lowercased mp code) —
lib/WriterMPC.pm:550-557 `_init_code_table` over __DATA__ (kinds: 1 =
point, 3 = polyline, 5 = polygon). Here the table is a small BROADCAST
DIMENSION joined to the feature stream (the right Spark shape — a
700-entry CASE expression would cross the 64KB codegen cliff; a broadcast
hash join stays JVM-side and scales to any table size).

`parse_code_table` reads the reference's exact text format, so a
deployment can load the full table from config; `CODE_TABLE` ships a
representative built-in subset (standard public Garmin MP type constants)
covering all three kinds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# kind constants (shapefile geometry classes, WriterMPC.pm __DATA__ col 2)
KIND_POINT = 1
KIND_POLYLINE = 3
KIND_POLYGON = 5

# representative (kind, mp_code) → garmin type subset; same key semantics
# as _init_code_table (codes lowercased). Standard MP/Garmin constants.
CODE_TABLE: dict[tuple[int, str], str] = {
    # points: the city-size ladder + common POIs
    (1, "0x0100"): "LARGE_CITY", (1, "0x0200"): "MEDIUM_CITY",
    (1, "0x0300"): "CITY_2M", (1, "0x0400"): "CITY_1M",
    (1, "0x0500"): "CITY_500K", (1, "0x0600"): "CITY_200K",
    (1, "0x0700"): "CITY_100K", (1, "0x0800"): "CITY_50K",
    (1, "0x0900"): "CITY_20K", (1, "0x0a00"): "CITY_10K",
    (1, "0x0b00"): "CITY_5K", (1, "0x0c00"): "CITY_LT5K",
    (1, "0x0d00"): "CITY_UNKNOWN",
    (1, "0x1e00"): "STATE", (1, "0x1f00"): "COUNTY",
    (1, "0x2800"): "ISLAND", (1, "0x2a00"): "RESTAURANT",
    (1, "0x2c04"): "MUSEUM", (1, "0x2f08"): "TRANSIT",
    (1, "0x6402"): "BUILDING", (1, "0x6616"): "PEAK",
    # polylines: the road-class ladder
    (3, "0x00"): "RESIDENTIAL", (3, "0x01"): "MAJOR_HWY",
    (3, "0x02"): "PRINCIPAL_HWY", (3, "0x03"): "OTHER_HWY",
    (3, "0x04"): "ARTERIAL", (3, "0x05"): "COLLECTOR",
    (3, "0x06"): "RESIDENTIAL", (3, "0x07"): "ALLEY",
    (3, "0x08"): "LOW_SPEED_RAMP", (3, "0x09"): "HIGH_SPEED_RAMP",
    (3, "0x0a"): "UNPAVED_ROAD", (3, "0x0b"): "MAJOR_CONNECTOR",
    (3, "0x14"): "RAILROAD", (3, "0x15"): "SHORELINE",
    (3, "0x18"): "STREAM", (3, "0x1f"): "RIVER",
    # polygons
    (5, "0x01"): "LARGE_CITY", (5, "0x02"): "SMALL_CITY",
    (5, "0x03"): "TOWN", (5, "0x05"): "PARKING_LOT",
    (5, "0x07"): "AIRPORT", (5, "0x0b"): "HOSPITAL",
    (5, "0x0c"): "INDUSTRIAL_COMPLEX", (5, "0x13"): "BUILDING",
    (5, "0x28"): "SEA", (5, "0x29"): "BLUE_UNKNOWN",
    (5, "0x32"): "SEA", (5, "0x3c"): "LAKE",
    (5, "0x4b"): "BACKGROUND", (5, "0x4e"): "ORCHARD",
    (5, "0x50"): "FOREST", (5, "0x51"): "WETLAND",
}


def parse_code_table(text: str) -> dict[tuple[int, str], str]:
    """Parse the reference's whitespace table format
    (`mp_code kind garmin_code` per line, WriterMPC.pm:551-556):
    codes lowercased, later lines override earlier ones."""
    out: dict[tuple[int, str], str] = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) != 3 or not parts[1].isdigit():
            continue
        mp_code, kind, garmin = parts
        out[(int(kind), mp_code.lower())] = garmin
    return out


def code_table_df(spark: SparkSession, table=None) -> DataFrame:
    """The translation table as a (tiny) broadcastable dimension frame."""
    table = CODE_TABLE if table is None else table
    rows = [(k, c, g) for (k, c), g in sorted(table.items())]
    return spark.createDataFrame(
        rows, "kind int, mp_code string, garmin_type string"
    )


def code_table_values_sql(table=None) -> str:
    """VALUES literal of the same table for the DuckDB oracle twin."""
    table = CODE_TABLE if table is None else table
    return ", ".join(
        f"({k}, '{c}', '{g}')" for (k, c), g in sorted(table.items())
    )


def translate_types(
    features: DataFrame,
    kind_col: str = "kind",
    code_col: str = "mp_code",
    out_col: str = "garmin_type",
    table=None,
    default: str = "UNKNOWN",
) -> DataFrame:
    """Broadcast-join translation: (kind, lower(mp_code)) → garmin type,
    missing codes → `default` (the reference drops them; a named default
    keeps the row so the miss is auditable)."""
    dim = code_table_df(features.sparkSession, table)
    joined = features.join(
        F.broadcast(dim),
        (features[kind_col] == dim.kind)
        & (F.lower(features[code_col]) == dim.mp_code),
        "left",
    )
    return joined.select(
        *[features[c] for c in features.columns],
        F.coalesce(dim.garmin_type, F.lit(default)).alias(out_col),
    )


def sequential_id(
    df: DataFrame,
    order_col: str,
    out_col: str = "link_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based sequential id by `order_col` (must be unique) WITHOUT
    a single-task global window: range-repartition on the key, parallel
    per-partition row_number, then per-partition counts (≤ #partitions
    rows, one tiny collect) become broadcast offsets. The ids equal the
    global rank by order_col regardless of where the sampled range bounds
    land, so the result is deterministic at any parallelism."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    d = df.repartitionByRange(n, order_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(order_col)
    d = d.withColumn("__rn", F.row_number().over(w).cast("bigint"))
    counts = sorted(
        (r["__pid"], r["n"])
        for r in d.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    )
    offsets = []
    acc = 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    odf = spark.createDataFrame(offsets, "__pid int, __off bigint")
    return (
        d.join(F.broadcast(odf), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__pid", "__rn", "__off")
    )


# --- housenumber pseudoroads (WriterMPC.pm:273-316) ---------------------------

PSEUDOROAD_LENGTH = 0.00002  # $DEFAULT_PSEUDOROAD_LENGTH
PSEUDOROAD_TYPE = "ALLEY"
PSEUDOROAD_ACCESS = "1,1,1,1,1,1,1,1,1,1"


def synthesize_pseudoroads(
    addr_points: DataFrame,
    point_col: str = "point_id",
    house_col: str = "house",
    street_col: str = "street",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Housenumber pseudoroad synthesis: every address point whose house
    value contains a number becomes a tiny 2-vertex vertical road
    (lat ± PSEUDOROAD_LENGTH) named "<house> <street>" with
    L_FROM_ADR = L_TO_ADR = the number, all-open access flags, ALLEY type
    and a deterministic sequential LINK_ID (row_number by point id — the
    reference's pseudoroad_id counter made parallel-safe)."""
    hnum = F.regexp_extract(F.col(house_col), "([0-9]+)", 1)
    numbered = addr_points.withColumn("__h", hnum).filter(F.col("__h") != "")
    return (
        sequential_id(numbered, point_col, "link_id")
        .select(
            "link_id",
            F.col(point_col),
            F.concat_ws(" ", F.col(house_col), F.col(street_col)).alias("name"),
            F.lit(PSEUDOROAD_TYPE).alias("road_type"),
            F.col("__h").cast("bigint").alias("l_from_adr"),
            F.col("__h").cast("bigint").alias("l_to_adr"),
            F.lit(PSEUDOROAD_ACCESS).alias("access_flags"),
            F.col(lon).alias("lon"),
            (F.col(lat) - PSEUDOROAD_LENGTH).alias("lat0"),
            (F.col(lat) + PSEUDOROAD_LENGTH).alias("lat1"),
        )
    )
