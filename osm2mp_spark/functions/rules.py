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
        if self.kind == "eq":
            # ';'-separated multivalues match on ANY part (FeatureConfig.pm:87)
            return F.array_contains(F.split(c, ";"), self.value)
        if self.kind == "ne":
            # absent counts as "not value"; multivalue: NO part equals it
            return c.isNull() | ~F.array_contains(F.split(c, ";"), self.value)
        if self.kind == "exists":
            return c.isNotNull()
        if self.kind == "regex":
            return c.rlike(self.value)
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
        if self.kind == "eq":
            return f"LIST_CONTAINS(string_split({k}, ';'), '{v}')"
        if self.kind == "ne":
            return f"({k} IS NULL OR NOT LIST_CONTAINS(string_split({k}, ';'), '{v}'))"
        if self.kind == "exists":
            return f"({k} IS NOT NULL)"
        if self.kind == "regex":
            return f"REGEXP_MATCHES({k}, '{v}')"
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
                else:
                    proj.append(F.lit(str(v)).alias(a))
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
                else:
                    cols.append(f"'{v}' AS {a}")
            selects.append(
                f"SELECT {', '.join(cols)} FROM {from_clause} WHERE {r.condition.to_sql()}"
            )
        return "\nUNION ALL\n".join(selects)
