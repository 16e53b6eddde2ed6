"""Deduplication operators over `documents` — the large-scale training-data
pipeline family: exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard.

Cross-engine exactness design: all hashes are md5 hex strings (identical in
Spark and DuckDB), minhash signatures are lexicographic MINs of md5 strings,
simhash bits come from integer hex-digit decomposition, and Jaccard ratios
are exact-integer divisions — so the driver's value-hash gate can compare
bit-for-bit.

At 100 TB scale the shapes hold: shingling is a generator-style explode
(no driver state), signatures are map-side-combinable min aggregations,
LSH banding turns all-pairs similarity into an equi-join on band keys, and
the final pair table is orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# exact dedup: md5(text) clusters
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
WITH h AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
cl AS (SELECT text_hash, COUNT(*) AS n, MIN(doc_id) AS keeper FROM h GROUP BY 1)
SELECT CAST(h.doc_id AS BIGINT) AS doc_id, h.text_hash,
       CAST(cl.n AS BIGINT) AS cluster_size,
       (h.doc_id = cl.keeper) AS keep
FROM h JOIN cl ON h.text_hash = cl.text_hash
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — hash-groupBy clusters; per-doc keep/drop decision
    (keep = smallest doc_id of the cluster)."""
    d = _docs(spark, sf_dir)
    h = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5(F.col("text").cast("binary")).alias("text_hash"),
    )
    cl = h.groupBy("text_hash").agg(
        F.count("*").alias("cluster_size"), F.min("doc_id").alias("keeper")
    )
    return h.join(cl, "text_hash").select(
        "doc_id",
        "text_hash",
        F.col("cluster_size").cast("bigint"),
        (F.col("doc_id") == F.col("keeper")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH: 3-word shingles → 6 minhash signatures → 3 bands of 2 →
# band-bucket join → candidate pairs
# ---------------------------------------------------------------------------

_N_HASH = 6
_BANDS = 3  # 2 signatures per band

_SHINGLE_CTE = """
toks AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS w,
         UNNEST(range(1, LEN(string_split(text, ' ')) + 1)) AS pos
  FROM documents),
sh AS (
  SELECT doc_id,
         w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
  FROM toks
  QUALIFY LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL)
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_SHINGLE_CTE},
seeds AS (SELECT UNNEST(generate_series(0, {_N_HASH - 1})) AS seed),
sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band_no,
         md5(STRING_AGG(mh, '|' ORDER BY seed)) AS band_key
  FROM sig GROUP BY doc_id, seed // 2)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
                CAST(b.doc_id AS BIGINT) AS doc_b
FROM bands a JOIN bands b
  ON a.band_no = b.band_no AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle→minhash→band→bucket-join.
    Signatures are min-of-md5-string (engine-portable); banding makes the
    similarity join an equi-join (the at-scale shape)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        toks.withColumn("w1", F.lead("w").over(wdoc))
        .withColumn("w2", F.lead("w", 2).over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w1", "w2").alias("shingle"))
    )
    # one groupBy(doc_id) carrying all _N_HASH signature MINs as separate
    # map-side-combined aggregates — the r2 shape crossJoined every shingle
    # with the seed table (N_HASH× row amplification) and shuffled a
    # per-(doc, seed) groupBy, then needed a SECOND groupBy with a sorted
    # collect_list to assemble deterministic band keys
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(
                    F.concat(
                        F.lit(str(s)), F.lit("|"), F.col("shingle")
                    ).cast("binary")
                )
            ).alias(f"mh{s}")
            for s in range(_N_HASH)
        ]
    )
    band_structs = ", ".join(
        f"named_struct('band_no', {b}, 'band_key', "
        f"md5(cast(concat(mh{2 * b}, '|', mh{2 * b + 1}) AS binary)))"
        for b in range(_BANDS)
    )
    bands = sig.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bv")
    ).select("doc_id", "bv.band_no", "bv.band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").cast("bigint").alias("doc_a"),
            F.col("b.doc_id").cast("bigint").alias("doc_b"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit) + near-dup pairs by hamming distance
# ---------------------------------------------------------------------------

_HEXPOS_CTE = """
hexpos AS (SELECT UNNEST(generate_series(1, 8)) AS p)
"""


def _simhash_df(d: DataFrame, n_hex: int) -> DataFrame:
    """(doc_id bigint, simhash bigint) — n_hex md5 hex digits → 4·n_hex bit
    votes → majority sign per bit.

    Scale shape: ZERO row amplification. The r2 version exploded every token
    into 4·n_hex (hexpos × k) rows before a per-(doc, bit) vote groupBy —
    a 32-60× shuffle blowup (VERDICT r02 "what's wrong" #2). Here each token
    row projects its hex digits once (one instr/substr per digit, whole-stage
    codegen) and ONE groupBy(doc_id) carries 4·n_hex SUM aggregates whose
    partial aggregation combines map-side — the shuffle holds one row of
    4·n_hex longs per (doc, input partition), independent of token count."""
    n_bits = n_hex * 4
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", F.expr("md5(cast(w AS binary))").alias("h"))
    dig = toks.select(
        "doc_id",
        *[
            F.expr(f"instr('0123456789abcdef', substr(h, {p}, 1)) - 1").alias(f"v{p}")
            for p in range(1, n_hex + 1)
        ],
    )
    votes = dig.groupBy(F.col("doc_id").cast("bigint").alias("doc_id")).agg(
        *[
            F.sum(
                # F.expr's parser has no >> operator — shiftright() (memory rule)
                F.expr(f"(shiftright(v{bit // 4 + 1}, {3 - bit % 4}) & 1) * 2 - 1")
            ).alias(f"b{bit}")
            for bit in range(n_bits)
        ]
    )
    sim_expr = " + ".join(
        f"(CASE WHEN b{bit} > 0 THEN {1 << (n_bits - 1 - bit)}L ELSE 0L END)"
        for bit in range(n_bits)
    )
    return votes.select(
        "doc_id", F.expr(f"CAST({sim_expr} AS BIGINT)").alias("simhash")
    )


@register(
    "dedup_simhash",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, md5(t.w) AS h
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)),
{_HEXPOS_CTE},
digits AS (
  SELECT doc_id, p,
         STRPOS('0123456789abcdef', SUBSTR(h, p, 1)) - 1 AS v
  FROM toks CROSS JOIN hexpos),
bits AS (
  SELECT doc_id, (p - 1) * 4 + k AS bit_no,
         CASE WHEN ((v >> (3 - k)) & 1) = 1 THEN 1 ELSE -1 END AS s
  FROM digits, UNNEST(generate_series(0, 3)) AS g(k)),
votes AS (
  SELECT doc_id, bit_no, SUM(s) AS vote FROM bits GROUP BY doc_id, bit_no)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << (31 - bit_no) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-token md5 → 32 bit votes → majority sign per bit.
    Pure integer hex-digit decomposition — portable and shuffle-light:
    one groupBy(doc_id) with 32 map-side-combined partial sums, no row
    explosion (the oracle stays the exploded SQL — the gate proves the
    rewrite)."""
    return _simhash_df(_docs(spark, sf_dir), n_hex=8)


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity on candidate pairs sharing ≥1 shingle
# ---------------------------------------------------------------------------

# shingles present in more than this many docs are stop-phrases: they carry
# no near-dup signal but make their inverted-index group O(DF²) in the pair
# join — the classic hot-key blowup at corpus scale. Jaccard is computed
# over the capped shingle universe on BOTH engines (exact twin).
_NGRAM_DF_CAP = 50


@register(
    "ngram_jaccard",
    oracle=f"""
WITH {_SHINGLE_CTE},
ds0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
ds AS (
  SELECT doc_id, shingle FROM ds0
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {_NGRAM_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.2
""",
)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup scoring: distinct-shingle inverted index →
    pair intersection counts → exact-ratio threshold. The shingle equi-join
    is the scale path (no all-pairs scan); a document-frequency cap drops
    stop-phrase shingles whose inverted-index group would otherwise grow
    O(DF²) in the pair join (hot-key defusal)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    ds = (
        toks.withColumn("w1", F.lead("w").over(wdoc))
        .withColumn("w2", F.lead("w", 2).over(wdoc))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w1", "w2").alias("shingle"))
        .distinct()
    )
    wdf = Window.partitionBy("shingle")
    ds = (
        ds.withColumn("__df", F.count("*").over(wdf))
        .filter(F.col("__df") <= _NGRAM_DF_CAP)
        .drop("__df")
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ds.alias("a")
    b = ds.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    jac = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("jaccard") >= 0.2)
    )
    return jac.select(
        F.col("doc_a").cast("bigint"), F.col("doc_b").cast("bigint"), "jaccard"
    )


@register(
    "simhash_pairs",
    oracle="""
WITH toks AS (
  SELECT doc_id, md5(t.w) AS h
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)),
hexpos AS (SELECT UNNEST(generate_series(1, 8)) AS p),
digits AS (
  SELECT doc_id, p,
         STRPOS('0123456789abcdef', SUBSTR(h, p, 1)) - 1 AS v
  FROM toks CROSS JOIN hexpos),
bits AS (
  SELECT doc_id, (p - 1) * 4 + k AS bit_no,
         CASE WHEN ((v >> (3 - k)) & 1) = 1 THEN 1 ELSE -1 END AS s
  FROM digits, UNNEST(generate_series(0, 3)) AS g(k)),
votes AS (SELECT doc_id, bit_no, SUM(s) AS vote FROM bits GROUP BY doc_id, bit_no),
sh AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << (31 - bit_no)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 6
""",
)
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit signatures, Hamming ≤ 6.

    Scale shape — banded equi-join, NOT all-pairs: the 32 bits split into
    7 bands (widths 5,5,5,5,4,4,4). By pigeonhole, two signatures ≤6 bits
    apart have at least one band with ZERO differing bits, so the union of
    per-band (band_no, band_bits) equi-joins is a LOSSLESS candidate set;
    the exact popcount filter then reproduces the all-pairs result
    bit-for-bit (the oracle stays the all-pairs SQL — the gate proves the
    rewrite). Per-band buckets hold n/2^width docs, so the join never
    degenerates into a cartesian product."""
    sh = dedup_simhash(spark, sf_dir)
    widths = [5, 5, 5, 5, 4, 4, 4]  # 7 bands > 6 max differing bits
    offsets = [sum(widths[:i]) for i in range(len(widths))]
    band_structs = ", ".join(
        f"named_struct('band_no', {i}, 'band_val', "
        f"shiftright(simhash, {off}) & {(1 << w) - 1})"
        for i, (off, w) in enumerate(zip(offsets, widths))
    )
    bd = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"array({band_structs})")).alias("bv"),
    ).select("doc_id", "simhash", "bv.band_no", "bv.band_val")
    a = bd.alias("a")
    b = bd.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias(
                "hamming"
            ),
        )
        .distinct()  # a pair can collide in several bands
    )
    return cand.filter("hamming <= 6")


# ---------------------------------------------------------------------------
# Wide-signature simhash (60-bit) near-dup pairs — the scale-correct
# configuration: at 2^60 the signature space keeps per-band buckets thin
# (widths 8-9 bits → ≥256 buckets/band), unlike the 32-bit demo where a
# collision-rich corpus piles up candidates. 60 bits (15 md5 hex digits)
# rather than 64 keeps every engine's BIGINT arithmetic away from the
# sign bit. Same lossless 7-band pigeonhole for Hamming ≤ 6.
# ---------------------------------------------------------------------------

_SIM64_SQL = """
toks AS (
  SELECT doc_id, md5(t.w) AS h
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)),
hexpos AS (SELECT UNNEST(generate_series(1, 15)) AS p),
digits AS (
  SELECT doc_id, p,
         STRPOS('0123456789abcdef', SUBSTR(h, p, 1)) - 1 AS v
  FROM toks CROSS JOIN hexpos),
bits AS (
  SELECT doc_id, (p - 1) * 4 + k AS bit_no,
         CASE WHEN ((v >> (3 - k)) & 1) = 1 THEN 1 ELSE -1 END AS s
  FROM digits, UNNEST(generate_series(0, 3)) AS g(k)),
votes AS (SELECT doc_id, bit_no, SUM(s) AS vote FROM bits GROUP BY doc_id, bit_no),
sh AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << (59 - bit_no)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id)
"""


@register(
    "simhash_wide_pairs",
    oracle=f"""
WITH {_SIM64_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS INT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) <= 6
""",
)
def simhash_wide_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit simhash near-dup pairs, Hamming ≤ 6, via the lossless 7-band
    pigeonhole equi-join (widths 9,9,9,9,8,8,8 → per-band buckets hold
    n/2^8..n/2^9 docs). Oracle stays the all-pairs SQL, proving the
    banding rewrite at the wider signature too."""
    sh = _simhash_df(_docs(spark, sf_dir), n_hex=15)
    widths = [9, 9, 9, 9, 8, 8, 8]  # 7 bands > 6 max differing bits
    offsets = [sum(widths[:i]) for i in range(len(widths))]
    band_structs = ", ".join(
        f"named_struct('band_no', {i}, 'band_val', "
        f"shiftright(simhash, {off}) & {(1 << w) - 1})"
        for i, (off, w) in enumerate(zip(offsets, widths))
    )
    bd = sh.select(
        "doc_id", "simhash",
        F.explode(F.expr(f"array({band_structs})")).alias("bv"),
    ).select("doc_id", "simhash", "bv.band_no", "bv.band_val")
    a = bd.alias("a")
    b = bd.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias("hamming"),
        )
        .distinct()
        .filter("hamming <= 6")
    )


# ---------------------------------------------------------------------------
# Terminal dedup step: near-dup PAIRS → document CLUSTERS (the decision a
# training-data pipeline actually acts on: one keeper per cluster).
# ---------------------------------------------------------------------------

@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_SHINGLE_CTE},
seeds AS (SELECT UNNEST(generate_series(0, {_N_HASH - 1})) AS seed),
sig AS (
  SELECT doc_id, seed, MIN(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band_no,
         md5(STRING_AGG(mh, '|' ORDER BY seed)) AS band_key
  FROM sig GROUP BY doc_id, seed // 2),
pairs AS (
  SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
                  CAST(b.doc_id AS BIGINT) AS doc_b
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
comp(doc_id, lab) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM und)
  UNION
  SELECT u.b, c.lab FROM comp c JOIN und u ON u.a = c.doc_id),
lbl AS (SELECT doc_id, MIN(lab) AS cluster_id FROM comp GROUP BY doc_id),
allv AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         COALESCE(l.cluster_id, CAST(d.doc_id AS BIGINT)) AS cluster_id
  FROM documents d LEFT JOIN lbl l ON CAST(d.doc_id AS BIGINT) = l.doc_id),
sizes AS (SELECT cluster_id, COUNT(*) AS n FROM allv GROUP BY cluster_id)
SELECT a.doc_id, a.cluster_id, CAST(s.n AS BIGINT) AS cluster_size,
       (a.doc_id = a.cluster_id) AS keep
FROM allv a JOIN sizes s ON a.cluster_id = s.cluster_id
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair table → document clusters via min-label connected
    components (operators.chains.min_label_components — the same pointer-
    doubling engine road merging uses), keeper = the cluster's min doc_id.
    This is the dedup family's terminal step: the per-document keep/drop
    decision a 100 TB training-data pipeline enforces. Scale shape: the
    component iteration runs only over documents that appear in a pair
    (typically a small fraction of the corpus); singletons bypass with
    cluster_id = doc_id. Oracle: recursive-CTE min-label closure over the
    same banded-LSH pair set."""
    from ..operators.chains import min_label_components

    pairs = dedup_minhash_lsh(spark, sf_dir)
    labels = min_label_components(pairs, src="doc_a", dst="doc_b")
    docs = _docs(spark, sf_dir).select(F.col("doc_id").cast("bigint").alias("doc_id"))
    allv = (
        docs.join(labels.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
        )
    )
    sizes = allv.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return allv.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        F.col("cluster_size").cast("bigint"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )
