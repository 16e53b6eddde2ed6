"""Rule-engine + string-kernel queries (SURVEY §2.2 F1-F11) over `documents`.

The documents table stands in for tagged OSM objects: its columns
(lang, source, text, n_chars) play the tag roles the YAML feature config
matches on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rules import (
    Rule,
    RuleSet,
    Threshold,
    cond_and,
    cond_eq,
    cond_ne,
    cond_or,
    cond_regex,
    expand_presets,
    field_to_column,
    field_to_sql,
)
from . import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# the demo feature config: ordered rules, one overridden by id (F1)
_SIZE = Threshold("n_chars", ((400, "large"), (200, "mid")), "small")

_RULES = RuleSet(
    [
        Rule("r_en_spark", cond_and(cond_eq("lang", "en"), cond_regex("text", "spark")),
             {"obj_type": "poi", "size": _SIZE}),
        Rule("r_not_src0", cond_ne("source", "src0"), {"obj_type": "line"}),
        Rule("r_batch", cond_regex("text", "^batch"), {"obj_type": "polygon", "size": _SIZE}),
        Rule("r_en_or_src1", cond_or(cond_eq("lang", "en"), cond_eq("source", "src1")),
             {"obj_type": "point"}),
        # override: same id re-registered — later config wins (F1)
        Rule("r_batch", cond_regex("text", "^batch"), {"obj_type": "area", "size": _SIZE}),
    ]
)


@register(
    "rule_dispatch",
    oracle=_RULES.dispatch_all_sql("documents", ["doc_id"]),
)
def rule_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6 — compiled rule conditions (eq/ne/regex/and/or), all-match
    dispatch (FeatureConfig.pm:127-151), threshold bucketing selector,
    override-by-id."""
    return _RULES.dispatch_all(_docs(spark, sf_dir), ["doc_id"])


# F6 selector spec suite + F7 presets — one spec dict drives BOTH engines
# (field_to_column for Spark, field_to_sql for the DuckDB oracle), so the
# correctness gate proves the compiler itself.
_SEL_TMPL = "%lang-%source"
_SEL_SWITCH = {
    "selector": "tag",
    "tag": "src_or_null",
    "src1": "one",
    "src2": "two-%lang",
    "_empty": "was-src0",
    "_default": "other:%src_or_null",
}
_SEL_THR = {"selector": "thresholds", "value": "%n_chars",
            100: "mid", 250: "large", 400: "huge"}
_SEL_IF = {
    "selector": "if",
    "condition": cond_eq("lang", "en"),
    "then": "EN:%source",
    "else": _SEL_THR,
}
_SEL_FIRST = ["%src_or_null", {"selector": "tag", "tag": "lang", "en": "eng"},
              "zz-%lang"]
_SEL_LANG = {"selector": "lang", "ru": "RU/%source", "en": "EN/%source"}

_PRESETS = {
    "contacts": {
        "phone": {"selector": "tag", "tag": "source",
                  "src1": "123-456", "_default": "000"},
        "web": "%lang.example.org",
    }
}
_SEL_ACTION = {"contacts": True, "extra_fields": {"web": "www.%source"}}
_SEL_EXTRA = expand_presets(_SEL_ACTION, _PRESETS)  # web overridden by action

_SEL_COLS = [
    ("sel_tmpl", _SEL_TMPL),
    ("sel_switch", _SEL_SWITCH),
    ("sel_if", _SEL_IF),
    ("sel_thr", _SEL_THR),
    ("sel_first", _SEL_FIRST),
    ("sel_lang", _SEL_LANG),
    ("preset_phone", _SEL_EXTRA["phone"]),
    ("preset_web", _SEL_EXTRA["web"]),
]


@register(
    "rule_selectors",
    oracle=(
        "WITH docs AS (SELECT *, NULLIF(source, 'src0') AS src_or_null "
        "FROM documents)\nSELECT doc_id,\n"
        + ",\n".join(
            f"  {field_to_sql(spec, target_lang='ru')} AS {name}"
            for name, spec in _SEL_COLS
        )
        + "\nFROM docs"
    ),
)
def rule_selectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 field-value selectors + F7 presets (osm2mp.pl:1856-2036): %tag
    templates (lenient top-level / strict-in-array), tag-switch with
    _empty/_default, if/then/else over compiled conditions, numeric
    thresholds over extract_number, lang selection, first-non-empty
    arrays, and preset expansion with action override — all compiled once
    to Catalyst expressions (pure whole-stage codegen, zero Python)."""
    d = _docs(spark, sf_dir).withColumn(
        "src_or_null", F.expr("NULLIF(source, 'src0')")
    )
    return d.select(
        "doc_id",
        *[
            field_to_column(spec, target_lang="ru").alias(name)
            for name, spec in _SEL_COLS
        ],
    )


@register(
    "string_cleanup",
    oracle=r"""
SELECT doc_id,
       TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '[0-9]+', 'N', 'g'),
            ' +', ' ', 'g')) AS clean_text,
       UPPER(source) AS source_uc
FROM documents
""",
)
def string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F10 — forbidden-symbol replacement + space collapse + upcase
    (osm2mp.pl:1117-1130, lib/TextFilter.pm:18-121) as a regexp_replace
    chain, pure whole-stage codegen."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.regexp_replace("text", "[0-9]+", "N"), " +", " ")
        ).alias("clean_text"),
        F.upper("source").alias("source_uc"),
    )


@register(
    "number_extraction",
    oracle=r"""
SELECT event_id,
       CAST(COALESCE(NULLIF(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1), ''), '0')
            AS BIGINT) AS k_value,
       CAST(CAST(COALESCE(NULLIF(REGEXP_EXTRACT(props, '"k": ([0-9]+)', 1), ''), '0')
            AS BIGINT) * 161 / 1e2 AS DOUBLE) AS k_kmh
FROM events
""",
)
def number_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — leading-number extraction + unit conversion (extract_number +
    mph→km/h, osm2mp.pl:2341-2346, 1610-1615), exact integer arithmetic."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.coalesce(
        F.nullif(F.regexp_extract("props", '"k": ([0-9]+)', 1), F.lit("")), F.lit("0")
    ).cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_value"),
        (k * 161 / F.expr("1e2")).cast("double").alias("k_kmh"),
    )


@register(
    "name_selection",
    oracle="""
SELECT doc_id,
       COALESCE(NULLIF(CASE WHEN lang = 'en' THEN text END, ''),
                NULLIF(source, ''), '-') AS sel_name,
       COALESCE(NULLIF(lang, ''), 'und') AS sel_lang
FROM documents
""",
)
def name_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — language-priority name selection as a coalesce chain
    (lib/LangSelect.pm:113-146 semantics: preferred-lang value, fallback
    taglist, last-resort default)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.when(F.col("lang") == "en", F.col("text")), F.lit("")),
            F.nullif(F.col("source"), F.lit("")),
            F.lit("-"),
        ).alias("sel_name"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("")), F.lit("und")).alias("sel_lang"),
    )


# ---------------------------------------------------------------------------
# F12: street-type abbreviation rewrite (mp-postprocess.pl:116-173)
# ---------------------------------------------------------------------------

# (input template, HAND-DERIVED expected output) — the oracle side is the
# hand-computed expectation table, so the gate checks the kernel against
# the written spec, not against itself. Covers: type-first, type-last,
# standalone type (unchanged), no-type (unchanged), ordinal rotation,
# Ukrainian rows, numbers without ordinal suffixes.
_STREET_FIXTURES = [
    ("улица ленина", "Ленина ул."),
    ("ленина улица", "Ленина ул."),
    ("переулок гагарина", "Гагарина пер."),
    ("проспект мира", "Мира пр-т"),
    ("красная площадь", "Красная пл."),
    ("садовое кольцо", "садовое кольцо"),
    ("1-й проезд марьиной рощи", "Марьиной Рощи 1-й пр-д"),
    ("шоссе энтузиастов", "Энтузиастов ш."),
    ("вулиця шевченка", "Шевченка вул."),
    ("набережная тараса шевченко", "Тараса Шевченко наб."),
    ("улица 26 бакинских комиссаров", "26 Бакинских Комиссаров ул."),
    ("площадь", "площадь"),
]


@register(
    "street_abbrev",
    oracle=(
        "SELECT CAST(c_custkey AS BIGINT) AS point_id,\n"
        + "  CASE CAST(c_custkey % 12 AS INT)\n"
        + "\n".join(
            f"    WHEN {i} THEN '{inp}'" for i, (inp, _) in enumerate(_STREET_FIXTURES)
        )
        + "\n  END AS street,\n"
        + "  CASE CAST(c_custkey % 12 AS INT)\n"
        + "\n".join(
            f"    WHEN {i} THEN '{out}'" for i, (_, out) in enumerate(_STREET_FIXTURES)
        )
        + "\n  END AS abbreviated\nFROM customer"
    ),
)
def street_abbrev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 — RU/UA street-type abbreviation rewrite
    (mp-postprocess.pl:116-173): ucfirst words, first-match street-type
    token moved to the tail as its canonical abbreviation, ordinal
    normalization. Vectorized pandas-UDF kernel; the ORACLE side is a
    hand-derived expectation table, so the kernel is held to the written
    spec."""
    from ..functions.strings import make_street_abbrev_udf

    ab = make_street_abbrev_udf(spark)
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    names = ", ".join(f"'{inp}'" for inp, _ in _STREET_FIXTURES)
    pts = c.selectExpr(
        "CAST(c_custkey AS BIGINT) AS point_id",
        f"element_at(array({names}), CAST(c_custkey % 12 AS INT) + 1) AS street",
    )
    return pts.withColumn("abbreviated", ab(F.col("street")))


# ---------------------------------------------------------------------------
# F4: named conditions (only_node / only_way / registered ids, ~negation)
# ---------------------------------------------------------------------------

from ..functions.rules import Cond  # noqa: E402


def _named(key: str) -> Cond:
    return Cond("named", key, "obj_kind")


_NAMED_RULES = RuleSet(
    [
        Rule("n_node_poi", cond_and(_named("only_node"), cond_eq("lang", "en")),
             {"obj_type": "poi"}),
        Rule("n_way_line", _named("only_way"), {"obj_type": "line"}),
        Rule("n_city_area", cond_and(_named("inside_city"), _named("~only_node")),
             {"obj_type": "cityarea"}),
        Rule("n_not_node", _named("no_node"), {"obj_type": "nonpoint"}),
    ]
)

_NAMED_CTE = (
    "(SELECT doc_id, lang, "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Node' WHEN 1 THEN 'Way' "
    "ELSE 'Relation' END AS obj_kind, "
    "(doc_id % 5 = 0) AS inside_city FROM documents)"
)


@register(
    "rule_named_dispatch",
    oracle=_NAMED_RULES.dispatch_all_sql(_NAMED_CTE, ["doc_id"]),
)
def rule_named_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (FeatureConfig.pm:109-113, 135): named condition ids — only_node
    tests the object type, only_way/no_node its negation, `~` prefixes
    negate, and registered ids (inside_city) read their precomputed
    boolean column (the J2 containment bit). Compiled to plain boolean
    Columns like every other condition — codegen, pushdown free."""
    d = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "lang",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Node' WHEN 1 THEN 'Way' "
        "ELSE 'Relation' END AS obj_kind",
        "(doc_id % 5 = 0) AS inside_city",
    )
    return _NAMED_RULES.dispatch_all(d, ["doc_id"])


# ---------------------------------------------------------------------------
# Feature-config loader end-to-end: rules written in the REFERENCE'S OWN
# YAML format, parsed by functions.config, dispatched all-match
# ---------------------------------------------------------------------------

_CFG_TEXT = """
####    demo feature config in the reference format

--- objects
---

- condition:
    - lang = en|de
    - only_node
  action:
    - action: write_poi
      type: '0x2c04'
      name: poi-%source

- condition:
    - source != src0
  action:
    - action: write_line
      type: '0x01'
    - action: load_access_area

- condition:
    - or:
        - lang = ru
        - and:
            - source = src1|src2
            - ~only_node
  action:
    - action: write_polygon
      type: '0x13'

- condition:
    - text = *
  id: overridable
  action:
    - action: write_poi
      type: '0x0100'

- condition:
    - n_chars = \\d{3}
  id: overridable
  action:
    - action: write_poi
      type: '0x0200'
"""

_CFG_CTE = (
    "(SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source, text, "
    "CAST(n_chars AS VARCHAR) AS n_chars, "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Node' ELSE 'Way' END "
    "AS obj_kind FROM documents)"
)

# PyYAML-gated registration (the repo's import-try pattern): without yaml
# only cfg_dispatch is absent — the other 75 queries must not care
try:
    from ..functions.config import load_feature_config  # noqa: E402

    _CFG_RULES = load_feature_config(_CFG_TEXT)["objects"]
except ImportError:  # pragma: no cover - yaml ships in this environment
    _CFG_RULES = None


def cfg_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end feature-config path: rules written in the reference's own
    YAML format (sections, `key = regex` conditions with ';'-multivalue
    anchored matching, or/and nesting, ~negated named conditions,
    override-by-id, multi-action rules, %tag templates in action params)
    parsed by functions.config.load_feature_config and dispatched
    all-match. A reference user's cfg files work unchanged."""
    d = _docs(spark, sf_dir).selectExpr(
        "CAST(doc_id AS BIGINT) AS doc_id",
        "lang",
        "source",
        "text",
        "CAST(n_chars AS STRING) AS n_chars",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Node' ELSE 'Way' END "
        "AS obj_kind",
    )
    return _CFG_RULES.dispatch_all(d, ["doc_id"])


if _CFG_RULES is not None:
    register(
        "cfg_dispatch",
        oracle=_CFG_RULES.dispatch_all_sql(_CFG_CTE, ["doc_id"]),
    )(cfg_dispatch)
