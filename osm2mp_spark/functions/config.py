"""Feature-config loader — parses the REFERENCE'S OWN YAML config format
(cfg/polish-mp/*.yml and friends) into the compiled rule engine, so a user
of the reference can point their existing config files at this engine.

Format (lib/FeatureConfig.pm add_to_settings/add_rules): a multi-document
YAML stream alternating a section-name scalar document (`--- nodes`) with
a list document of rules `{condition: [...], action: [...], id?}`.

Condition grammar (_precompile_condition, FeatureConfig.pm:77-113):
  - "key = *"        tag exists;   "key != *"  tag absent
  - "key = regex"    any ';'-part of the tag matches ^(?:regex)$
  - "key != regex"   negation (true when the tag is missing)
  - {or: [...]}, {and: [...]}   recursive combinators
  - "id" / "~id"     named conditions (only_node / only_way / no_node /
                     registered boolean columns)

Every rule becomes one Rule PER ACTION (the reference executes all actions
of a matching rule; all-match dispatch emits one row per matching action).
Action parameter values pass through the F6 field-value selector compiler,
so `%tag` templates and selector hashes in the config work unchanged.
"""

from __future__ import annotations

import re

from .rules import Cond, Rule, RuleSet, cond_and, cond_keys, cond_or

_TAG_RE = re.compile(r"(\S+)\s*(!?)=\s*(.+)", re.S)
_ID_RE = re.compile(r"(~?)\s*(\w+)")


def parse_condition(cond, type_col: str = "obj_kind") -> Cond:
    """One condition entry → Cond AST (FeatureConfig.pm:77-113 grammar)."""
    if isinstance(cond, str):
        m = _TAG_RE.match(cond)
        if m:
            key, neg, val = m.group(1), m.group(2), m.group(3).strip()
            if val == "*":
                return Cond("not_exists" if neg else "exists", key)
            return Cond("nre_any" if neg else "re_any", key, val)
        m = _ID_RE.match(cond)
        if m:
            neg, cid = m.group(1), m.group(2)
            return Cond("named", f"{neg}{cid}", type_col)
        raise ValueError(f"unparseable condition: {cond!r}")
    if isinstance(cond, dict):
        if "or" in cond:
            return cond_or(*(parse_condition(c, type_col) for c in cond["or"]))
        if "and" in cond:
            return cond_and(*(parse_condition(c, type_col) for c in cond["and"]))
        raise ValueError(f"unsupported complex condition: {cond!r}")
    raise TypeError(f"bad condition type: {type(cond)}")


def _safe_attr(name: str) -> str:
    return re.sub(r"\W", "_", str(name))


_BARE_PCT_ITEM = re.compile(r"^(\s*-\s+)(%[^#\n]*)$", re.M)
_BARE_PCT_VAL = re.compile(r"^(\s*[\w.-]+:\s+)(%[^#\n]*)$", re.M)
_BARE_HEX_VAL = re.compile(r"^(\s*[\w.-]+:\s+)(0x[0-9a-fA-F]+)\s*$", re.M)


def _perl_yaml_compat(text: str) -> str:
    """The reference's configs are written for Perl's lax YAML:
    - bare scalars may start with '%' (`name: %label`) — strict YAML
      rejects those; quote them so templates survive as the strings the
      F6 selector compiler expects;
    - `type: 0x6403` stays a STRING under Perl's loader while YAML 1.1
      reads it as a hex integer — quote bare hex values to preserve the
      reference's code-as-text semantics."""

    def q(m: re.Match) -> str:
        val = m.group(2).rstrip()
        return m.group(1) + "'" + val.replace("'", "''") + "'"

    text = _BARE_PCT_ITEM.sub(q, text)
    text = _BARE_PCT_VAL.sub(q, text)
    return _BARE_HEX_VAL.sub(q, text)


def load_feature_config(
    text_or_path: str, type_col: str = "obj_kind"
) -> dict[str, RuleSet]:
    """Parse a reference-format config file/text → {section: RuleSet}.

    Rules with an `id` override earlier same-id rules (FeatureConfig.pm:
    65-70); rules without one get a synthetic unique id."""
    import yaml

    class _RefLoader(yaml.SafeLoader):
        pass

    def _perl_code(loader, suffix, node):
        # inline Perl subs in the reference configs can't execute here;
        # keep them as opaque markers so the rest of the file loads and
        # callers can override the affected fields
        return f"<perl:{suffix}>"

    yaml.add_multi_constructor(
        "tag:yaml.org,2002:perl/", _perl_code, Loader=_RefLoader
    )

    if "\n" not in text_or_path:
        with open(text_or_path) as f:
            text = f.read()
    else:
        text = text_or_path
    text = _perl_yaml_compat(text)

    sections: dict[str, RuleSet] = {}
    current: str | None = None
    for doc in yaml.load_all(text, Loader=_RefLoader):
        if doc is None:
            continue
        if isinstance(doc, str):
            current = doc.strip()
            sections.setdefault(current, RuleSet())
            continue
        if not isinstance(doc, list):
            raise ValueError(f"unexpected document type: {type(doc)}")
        if current is None:
            raise ValueError("rule list before any section-name document")
        rs = sections[current]
        base = len(rs.rules)
        for i, raw in enumerate(doc):
            conds = [
                parse_condition(c, type_col)
                for c in raw.get("condition", [])
            ]
            condition = (
                conds[0] if len(conds) == 1
                else cond_and(*conds) if conds
                else Cond("true")  # no conditions = always matches
            )
            actions = raw.get("action", [])
            rid_base = raw.get("id") or f"{current}:{base + i}"
            for j, act in enumerate(actions):
                attrs = {"action": act.get("action", "-")}
                for k, v in act.items():
                    if k == "action":
                        continue
                    attrs[_safe_attr(k)] = v
                rs.add(Rule(f"{rid_base}#{j}", condition, attrs))
    return sections


def config_tag_keys(rulesets: dict[str, RuleSet]) -> set[str]:
    """Every tag key any condition reads — the input schema the config
    needs (used for smoke-compiling real reference configs)."""
    keys: set[str] = set()
    for rs in rulesets.values():
        for r in rs.rules:
            keys |= cond_keys(r.condition)
    return keys
