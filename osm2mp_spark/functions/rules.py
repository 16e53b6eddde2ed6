"""The rule engine — the reference's YAML feature-config re-expressed as a
driver-side compiler to Catalyst expressions (SURVEY §2.2, F1-F7).

Reference semantics (lib/FeatureConfig.pm):
  - rules are an ORDERED list; later configs override same-id rules (:55-73)
  - condition atoms: `key = value-regex`, `key != regex`, `key = *`
    existence; `;`-separated multivalues match any part (:84-88)
  - nested {and: [...]} / {or: [...]} combinators (:91-99)
  - dispatch: first-to-last, ALL matching rules fire (:127-151)
  - actions compute attributes via selectors incl. numeric threshold
    bucketing (osm2mp.pl:1856-2000)

Spark-first design: each condition compiles ONCE on the driver to (a) a
pyspark Column and (b) an equivalent ANSI-SQL string (used by the DuckDB
oracle and by spark.sql users). Catalyst then gets plain boolean
expressions — codegen, pushdown and CSE are free. Rule dispatch with
all-match semantics is the union of per-rule filtered projections, or a
single select of boolean match columns (`match_flags`). `to_sql` emits the
DuckDB-dialect oracle twin (not runnable through spark.sql).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


# --- condition AST -----------------------------------------------------------

@dataclass(frozen=True)
class Cond:
    kind: str  # eq | ne | exists | regex | and | or
    key: str = ""
    value: str = ""
    children: tuple = ()

    def to_column(self) -> Column:
        c = F.col(self.key) if self.key else None
        if self.kind == "true":
            return F.lit(True)
        if self.kind == "named":
            # F4 (FeatureConfig.pm:109-113): string condition ids with a
            # `~` negation prefix. only_node → object type is Node;
            # only_way / no_node → it is not; any other id reads the
            # like-named precomputed boolean column (the reference's
            # registered conditions, e.g. inside_city → cond_is_inside_city
            # whose containment bit our PIP stage materializes as a column).
            neg = self.key.startswith("~")
            cid = self.key.lstrip("~ ")
            type_col = F.col(self.value or "obj_kind")
            if cid == "only_node":
                out = type_col == "Node"
            elif cid in ("only_way", "no_node"):
                out = type_col != "Node"
            else:
                out = F.col(cid)
            return ~out if neg else out
        if self.kind == "eq":
            # ';'-separated multivalues match on ANY part (FeatureConfig.pm:87)
            return F.array_contains(F.split(c, ";"), self.value)
        if self.kind == "ne":
            # absent counts as "not value"; multivalue: NO part equals it
            return c.isNull() | ~F.array_contains(F.split(c, ";"), self.value)
        if self.kind == "exists":
            return c.isNotNull()
        if self.kind == "not_exists":
            return c.isNull()
        if self.kind == "regex":
            return c.rlike(self.value)
        if self.kind in ("re_any", "nre_any"):
            # FeatureConfig.pm:84-87: value is a REGEX matched anchored
            # (^(?:val)$) against every ';'-part; `!=` = negation, and a
            # missing tag splits to nothing → any{} false → `!=` true
            anchored = f"^(?:{self.value})$"
            hit = F.coalesce(
                F.exists(F.split(c, ";"), lambda p: p.rlike(anchored)),
                F.lit(False),
            )
            return ~hit if self.kind == "nre_any" else hit
        if self.kind == "and":
            out = self.children[0].to_column()
            for ch in self.children[1:]:
                out = out & ch.to_column()
            return out
        if self.kind == "or":
            out = self.children[0].to_column()
            for ch in self.children[1:]:
                out = out | ch.to_column()
            return out
        raise ValueError(self.kind)

    def to_sql(self) -> str:
        """DuckDB-dialect SQL (the oracle twin — NOT runnable in spark.sql:
        REGEXP_MATCHES / LIST_CONTAINS are DuckDB names; the Spark side is
        to_column)."""
        k = self.key
        v = self.value.replace("'", "''")
        if self.kind == "true":
            return "TRUE"
        if self.kind == "named":
            neg = self.key.startswith("~")
            cid = self.key.lstrip("~ ")
            tc = self.value or "obj_kind"
            if cid == "only_node":
                sql = f"({tc} = 'Node')"
            elif cid in ("only_way", "no_node"):
                sql = f"({tc} <> 'Node')"
            else:
                sql = f"({cid})"
            return f"(NOT {sql})" if neg else sql
        if self.kind == "eq":
            return f"LIST_CONTAINS(string_split({k}, ';'), '{v}')"
        if self.kind == "ne":
            return f"({k} IS NULL OR NOT LIST_CONTAINS(string_split({k}, ';'), '{v}'))"
        if self.kind == "exists":
            return f"({k} IS NOT NULL)"
        if self.kind == "not_exists":
            return f"({k} IS NULL)"
        if self.kind == "regex":
            return f"REGEXP_MATCHES({k}, '{v}')"
        if self.kind in ("re_any", "nre_any"):
            hit = (
                f"COALESCE(LEN(LIST_FILTER(STRING_SPLIT({k}, ';'), "
                f"p -> REGEXP_MATCHES(p, '^(?:{v})$'))) > 0, FALSE)"
            )
            return f"(NOT {hit})" if self.kind == "nre_any" else f"({hit})"
        if self.kind in ("and", "or"):
            op = " AND " if self.kind == "and" else " OR "
            return "(" + op.join(ch.to_sql() for ch in self.children) + ")"
        raise ValueError(self.kind)


def cond_eq(key: str, value: str) -> Cond:
    return Cond("eq", key, value)


def cond_ne(key: str, value: str) -> Cond:
    return Cond("ne", key, value)


def cond_exists(key: str) -> Cond:
    return Cond("exists", key)


def cond_regex(key: str, pattern: str) -> Cond:
    """NB: keep patterns in the Java∩RE2 common dialect (plain literals,
    anchors, classes) — Spark uses java.util.regex, DuckDB uses RE2."""
    return Cond("regex", key, pattern)


def cond_and(*children: Cond) -> Cond:
    return Cond("and", children=tuple(children))


def cond_or(*children: Cond) -> Cond:
    return Cond("or", children=tuple(children))


def cond_keys(c: Cond) -> set[str]:
    """Tag keys a condition reads (for schema checks / column pruning)."""
    if c.kind in ("and", "or"):
        out: set[str] = set()
        for ch in c.children:
            out |= cond_keys(ch)
        return out
    if c.kind == "named":
        cid = c.key.lstrip("~ ")
        if cid in ("only_node", "only_way", "no_node"):
            return {c.value or "obj_kind"}
        return {cid}
    return {c.key} if c.key else set()


# --- thresholds (F6 numeric bucketing selector) ------------------------------

@dataclass(frozen=True)
class Threshold:
    """osm2mp.pl:1906-1921 style: value ≥ bound_i → label_i (descending)."""

    key: str
    buckets: tuple  # ((bound, label), ...) descending bounds
    default: str

    def to_column(self) -> Column:
        out = F.lit(self.default)
        expr = None
        for bound, label in self.buckets:
            cond = F.col(self.key) >= bound
            expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        return expr.otherwise(out) if expr is not None else out

    def to_sql(self) -> str:
        whens = " ".join(
            f"WHEN {self.key} >= {bound} THEN '{label}'" for bound, label in self.buckets
        )
        return f"(CASE {whens} ELSE '{self.default}' END)"


# --- F6 field-value selectors (osm2mp.pl:1856-2000) --------------------------
#
# The reference resolves config field values per object through
# `_get_field_content`: plain strings are %tag templates, arrays pick the
# first non-empty sub-field, hashes dispatch on their 'selector' key
# (tag-switch / if-condition / numeric thresholds / lang). Here every spec
# compiles ONCE on the driver to a Catalyst Column (JVM codegen, no Python
# per row) and to its DuckDB-SQL oracle twin. Python spec syntax mirrors
# the YAML:  str | [spec, ...] | {"selector": kind, ...}; None = undef.
# Deviation noted for parity: template %tag reads the column directly
# (the reference routes through name_from_list's label aliases).

_TEMPLATE_RE = re.compile(r"%(\w+)")


def _template_parts(template: str) -> list[tuple[bool, str]]:
    """[(is_ref, text)] — literal runs and %tag references."""
    parts: list[tuple[bool, str]] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(template):
        if m.start() > pos:
            parts.append((False, template[pos : m.start()]))
        parts.append((True, m.group(1)))
        pos = m.end()
    if pos < len(template):
        parts.append((False, template[pos:]))
    return parts


def _extract_number_col(c: Column) -> Column:
    """extract_number || 0 (osm2mp.pl:2341-2346): leading integer of the
    resolved string, 0 when absent/undef."""
    return F.coalesce(
        F.nullif(F.regexp_extract(F.coalesce(c, F.lit("")), "([0-9]+)", 1), F.lit("")),
        F.lit("0"),
    ).cast("bigint")


def _extract_number_sql(s: str) -> str:
    return (
        f"CAST(COALESCE(NULLIF(REGEXP_EXTRACT(COALESCE({s}, ''), "
        f"'([0-9]+)', 1), ''), '0') AS BIGINT)"
    )


def field_to_column(spec, strict: bool = False, target_lang: str = "en") -> Column:
    """Compile a field spec to a string Column. `strict` is the reference's
    empty_failed mode (inside arrays): a template whose referenced tag is
    missing yields NULL instead of substituting ''. Empty results are NULL
    (osm2mp.pl:1866-1868)."""
    null_str = F.lit(None).cast("string")
    if spec is None:
        return null_str
    if isinstance(spec, str):
        if spec == "":
            return null_str
        parts = _template_parts(spec)
        refs = [t for is_ref, t in parts if is_ref]
        if not refs:
            return F.lit(spec)
        joined = F.concat(
            *[
                F.coalesce(F.col(t), F.lit("")) if is_ref else F.lit(t)
                for is_ref, t in parts
            ]
        )
        if strict:
            missing = F.col(refs[0]).isNull()
            for t in refs[1:]:
                missing = missing | F.col(t).isNull()
            joined = F.when(~missing, joined)
        return F.nullif(joined, F.lit(""))
    if isinstance(spec, (list, tuple)):
        subs = [field_to_column(s, strict=True, target_lang=target_lang) for s in spec]
        return F.coalesce(*subs) if subs else null_str
    if isinstance(spec, dict):
        kind = spec.get("selector")
        if kind == "tag":
            tag = spec["tag"]
            v = F.col(tag)
            reserved = {"selector", "tag", "_empty", "_default"}
            expr = None
            for k, sub in spec.items():
                if k in reserved or sub is None:
                    continue
                branch = field_to_column(sub, strict, target_lang)
                expr = (
                    F.when(v == F.lit(k), branch)
                    if expr is None
                    else expr.when(v == F.lit(k), branch)
                )
            if spec.get("_empty") is not None:
                eb = field_to_column(spec["_empty"], strict, target_lang)
                expr = (
                    F.when(v.isNull(), eb)
                    if expr is None
                    else expr.when(v.isNull(), eb)
                )
            default = field_to_column(spec.get("_default"), strict, target_lang)
            return expr.otherwise(default) if expr is not None else default
        if kind == "if":
            cond = spec["condition"]
            then_c = field_to_column(spec.get("then"), strict, target_lang)
            out = F.when(cond.to_column(), then_c)
            if spec.get("else") is not None:
                out = out.otherwise(
                    field_to_column(spec["else"], strict, target_lang)
                )
            return out
        if kind == "thresholds":
            val = _extract_number_col(
                field_to_column(spec["value"], strict, target_lang)
            )
            bounds = sorted(
                (k, v) for k, v in spec.items()
                if k not in ("selector", "value")
            )
            expr = None
            for bound, label in reversed(bounds):  # largest ≤ value wins
                branch = F.lit(str(label))
                expr = (
                    F.when(val >= F.lit(int(bound)), branch)
                    if expr is None
                    else expr.when(val >= F.lit(int(bound)), branch)
                )
            return expr if expr is not None else null_str
        if kind == "lang":
            chosen = (
                spec.get(target_lang)
                or spec.get("en")
                or next(
                    (v for k, v in spec.items() if k != "selector" and v), None
                )
            )
            return field_to_column(chosen, strict, target_lang)
        raise ValueError(f"unknown selector {kind!r}")
    raise TypeError(f"bad field spec type: {type(spec)}")


def field_to_sql(spec, strict: bool = False, target_lang: str = "en") -> str:
    """The DuckDB-dialect twin of field_to_column."""
    if spec is None:
        return "NULL"
    if isinstance(spec, str):
        if spec == "":
            return "NULL"
        parts = _template_parts(spec)
        refs = [t for is_ref, t in parts if is_ref]
        esc = lambda s: s.replace("'", "''")  # noqa: E731
        if not refs:
            return f"'{esc(spec)}'"
        joined = " || ".join(
            f"COALESCE(CAST({t} AS VARCHAR), '')" if is_ref else f"'{esc(t)}'"
            for is_ref, t in parts
        )
        if strict:
            missing = " OR ".join(f"{t} IS NULL" for t in refs)
            joined = f"CASE WHEN NOT ({missing}) THEN {joined} END"
        return f"NULLIF({joined}, '')"
    if isinstance(spec, (list, tuple)):
        subs = [field_to_sql(s, strict=True, target_lang=target_lang) for s in spec]
        return "COALESCE(" + ", ".join(subs) + ")" if subs else "NULL"
    if isinstance(spec, dict):
        kind = spec.get("selector")
        if kind == "tag":
            tag = spec["tag"]
            reserved = {"selector", "tag", "_empty", "_default"}
            whens = []
            for k, sub in spec.items():
                if k in reserved or sub is None:
                    continue
                kk = k.replace("'", "''")
                whens.append(
                    f"WHEN {tag} = '{kk}' THEN {field_to_sql(sub, strict, target_lang)}"
                )
            if spec.get("_empty") is not None:
                whens.append(
                    f"WHEN {tag} IS NULL THEN "
                    f"{field_to_sql(spec['_empty'], strict, target_lang)}"
                )
            default = field_to_sql(spec.get("_default"), strict, target_lang)
            if not whens:
                return default
            return f"(CASE {' '.join(whens)} ELSE {default} END)"
        if kind == "if":
            cond = spec["condition"].to_sql()
            then_s = field_to_sql(spec.get("then"), strict, target_lang)
            els = (
                field_to_sql(spec["else"], strict, target_lang)
                if spec.get("else") is not None
                else "NULL"
            )
            return f"(CASE WHEN {cond} THEN {then_s} ELSE {els} END)"
        if kind == "thresholds":
            val = _extract_number_sql(
                field_to_sql(spec["value"], strict, target_lang)
            )
            bounds = sorted(
                (k, v) for k, v in spec.items()
                if k not in ("selector", "value")
            )
            whens = " ".join(
                f"WHEN {val} >= {int(b)} THEN '{str(lab)}'"
                for b, lab in reversed(bounds)
            )
            return f"(CASE {whens} ELSE NULL END)" if whens else "NULL"
        if kind == "lang":
            chosen = (
                spec.get(target_lang)
                or spec.get("en")
                or next(
                    (v for k, v in spec.items() if k != "selector" and v), None
                )
            )
            return field_to_sql(chosen, strict, target_lang)
        raise ValueError(f"unknown selector {kind!r}")
    raise TypeError(f"bad field spec type: {type(spec)}")


def field_keys(spec) -> set[str]:
    """Tag keys a field spec reads (templates' %refs, tag-switch keys,
    condition keys, recursively) — the action-side complement of
    cond_keys for input-schema discovery."""
    if spec is None:
        return set()
    if isinstance(spec, str):
        return {t for is_ref, t in _template_parts(spec) if is_ref}
    if isinstance(spec, (list, tuple)):
        out: set[str] = set()
        for s in spec:
            out |= field_keys(s)
        return out
    if isinstance(spec, dict):
        kind = spec.get("selector")
        out = set()
        if kind == "tag":
            out.add(spec["tag"])
            for k, sub in spec.items():
                if k not in ("selector", "tag"):
                    out |= field_keys(sub)
        elif kind == "if":
            out |= cond_keys(spec["condition"])
            out |= field_keys(spec.get("then"))
            out |= field_keys(spec.get("else"))
        elif kind == "thresholds":
            out |= field_keys(spec.get("value"))
        elif kind == "lang":
            for k, sub in spec.items():
                if k != "selector":
                    out |= field_keys(sub)
        return out
    return set()


# --- F7 presets (osm2mp.pl:2026-2036) -----------------------------------------

def expand_presets(action: dict, presets: dict[str, dict]) -> dict:
    """Config-time preset expansion: the action's `presets` name list (plus
    the legacy `contacts` flag) pulls each preset's field specs into
    extra_fields; the action's own extra_fields override preset keys.
    Unknown preset names raise (the reference croaks). Per-object
    resolution of the resulting specs is field_to_column/_to_sql; the
    reference's 'skip undef values' is NULL in the columnar output."""
    names = list(action.get("presets", []))
    if action.get("contacts"):
        names.append("contacts")
    extra: dict = {}
    for name in names:
        if name not in presets:
            raise KeyError(f"Unknown preset {name}")
        extra.update(presets[name])
    extra.update(action.get("extra_fields", {}))
    return extra


def _is_field_spec(v) -> bool:
    """Action values that go through the F6 selector compiler: selector
    hashes, first-non-empty arrays, %tag templates. Other dicts/lists are
    opaque action metadata (e.g. add_tags maps) and stringify."""
    if isinstance(v, dict):
        return "selector" in v
    if isinstance(v, list):
        return all(isinstance(s, (str, dict, list)) or s is None for s in v) and any(
            _is_field_spec(s) or (isinstance(s, str) and "%" in s) for s in v
        )
    return isinstance(v, str) and "%" in v


def _attr_repr(v) -> str:
    if isinstance(v, (dict, list)):
        import json

        return json.dumps(v, sort_keys=True, ensure_ascii=False)
    return str(v)


# --- rules -------------------------------------------------------------------

@dataclass
class Rule:
    rule_id: str
    condition: Cond
    actions: dict = field(default_factory=dict)  # attr -> literal | Threshold


class RuleSet:
    """Ordered rule list with override-by-id (F1, FeatureConfig.pm:55-73)."""

    def __init__(self, rules: list[Rule] | None = None):
        self._rules: list[Rule] = []
        self._by_id: dict[str, int] = {}
        for r in rules or []:
            self.add(r)

    def add(self, rule: Rule) -> None:
        if rule.rule_id in self._by_id:
            self._rules[self._by_id[rule.rule_id]] = rule  # later config wins
        else:
            self._by_id[rule.rule_id] = len(self._rules)
            self._rules.append(rule)

    @property
    def rules(self) -> list[Rule]:
        return list(self._rules)

    def dispatch_all(self, df: DataFrame, key_cols: list[str]) -> DataFrame:
        """All-match dispatch (F5): one output row per (input row, matching
        rule), carrying the rule's computed action attributes. Implemented as
        a union of per-rule filtered projections — Catalyst merges the scans
        and pushes each rule predicate down independently."""
        if not self._rules:
            raise ValueError("dispatch_all on an empty RuleSet")
        outs = []
        attrs = sorted({a for r in self._rules for a in r.actions})
        for r in self._rules:
            proj = [F.col(c) for c in key_cols] + [F.lit(r.rule_id).alias("rule_id")]
            for a in attrs:
                v = r.actions.get(a)
                if v is None:
                    proj.append(F.lit("-").alias(a))
                elif isinstance(v, Threshold):
                    proj.append(v.to_column().alias(a))
                elif _is_field_spec(v):
                    # F6 field-value selector spec (templates/switches/...)
                    proj.append(field_to_column(v).alias(a))
                else:
                    proj.append(F.lit(_attr_repr(v)).alias(a))
            outs.append(df.filter(r.condition.to_column()).select(*proj))
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result

    def dispatch_all_sql(self, from_clause: str, key_cols: list[str]) -> str:
        """The DuckDB-oracle twin of dispatch_all."""
        if not self._rules:
            raise ValueError("dispatch_all_sql on an empty RuleSet")
        attrs = sorted({a for r in self._rules for a in r.actions})
        selects = []
        for r in self._rules:
            cols = list(key_cols) + [f"'{r.rule_id}' AS rule_id"]
            for a in attrs:
                v = r.actions.get(a)
                if v is None:
                    cols.append(f"'-' AS {a}")
                elif isinstance(v, Threshold):
                    cols.append(f"{v.to_sql()} AS {a}")
                elif _is_field_spec(v):
                    cols.append(f"{field_to_sql(v)} AS {a}")
                else:
                    sv = _attr_repr(v).replace("'", "''")
                    cols.append(f"'{sv}' AS {a}")
            selects.append(
                f"SELECT {', '.join(cols)} FROM {from_clause} WHERE {r.condition.to_sql()}"
            )
        return "\nUNION ALL\n".join(selects)
