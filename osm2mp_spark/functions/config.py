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

from .rules import (
    Cond,
    Rule,
    RuleSet,
    _is_field_spec,
    cond_and,
    cond_keys,
    cond_or,
    expand_presets,
    field_keys,
)

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


def _normalize_spec(v, type_col: str):
    """Field specs in config files embed RAW condition strings inside `if`
    selectors; parse them into Cond so the F6 compiler (and key
    discovery) can consume the spec directly."""
    if isinstance(v, dict):
        out = {}
        for k, sub in v.items():
            if k == "condition" and v.get("selector") == "if":
                out[k] = (
                    sub if isinstance(sub, Cond)
                    else cond_and(*(parse_condition(c, type_col) for c in sub))
                    if isinstance(sub, list)
                    else parse_condition(sub, type_col)
                )
            else:
                out[k] = _normalize_spec(sub, type_col)
        return out
    if isinstance(v, list):
        return [_normalize_spec(s, type_col) for s in v]
    return v


_BARE_PCT_ITEM = re.compile(r"^(\s*-\s+)(%[^#\n]*?)(\s*#[^\n]*)?$", re.M)
_BARE_PCT_VAL = re.compile(r"^(\s*[\w.-]+:\s+)(%[^#\n]*?)(\s*#[^\n]*)?$", re.M)
_BARE_HEX_VAL = re.compile(
    r"^(\s*[\w.-]+:\s+)(0x[0-9a-fA-F]+)(\s*(?:#[^\n]*)?)$", re.M
)


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
        tail = m.group(3) or ""
        return m.group(1) + "'" + val.replace("'", "''") + "'" + tail

    text = _BARE_PCT_ITEM.sub(q, text)
    text = _BARE_PCT_VAL.sub(q, text)
    return _BARE_HEX_VAL.sub(q, text)


def load_feature_config(
    text_or_path: str,
    type_col: str = "obj_kind",
    presets: dict | None = None,
) -> dict[str, RuleSet]:
    """Parse a reference-format config file/text → {section: RuleSet}.

    Rules with an `id` override earlier same-id rules (FeatureConfig.pm:
    65-70); rules without one get a synthetic unique id. A `presets`
    mapping (or a `presets` section in the stream, a dict document)
    expands action preset lists / the `contacts` flag into extra fields
    (F7, osm2mp.pl:2026-2036)."""
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

    # PHASE 1: collect raw (id, condition, actions) per section, applying
    # override-by-id at the WHOLE-RULE level (FeatureConfig.pm:65-70 —
    # replacing a rule replaces ALL its actions, even when the override
    # has fewer). Per-action expansion happens once, afterwards, so
    # synthetic ids can never collide with earlier documents' rules.
    raw_sections: dict[str, list] = {}
    current: str | None = None
    for doc in yaml.load_all(text, Loader=_RefLoader):
        if doc is None:
            continue
        if isinstance(doc, str):
            current = doc.strip()
            if current != "presets":
                raw_sections.setdefault(current, [])
            continue
        if isinstance(doc, dict) and current == "presets":
            presets = {**(presets or {}), **doc}
            continue
        if not isinstance(doc, list):
            raise ValueError(f"unexpected document type: {type(doc)}")
        if current is None:
            raise ValueError("rule list before any section-name document")
        rules = raw_sections[current]
        for raw in doc:
            conds = raw.get("condition") or []
            if isinstance(conds, (str, dict)):
                conds = [conds]
            parsed = [parse_condition(c, type_col) for c in conds]
            condition = (
                parsed[0] if len(parsed) == 1
                else cond_and(*parsed) if parsed
                else Cond("true")  # no conditions = always matches
            )
            actions = raw.get("action") or []
            if isinstance(actions, dict):
                actions = [actions]
            rid = raw.get("id")
            entry = (rid, condition, actions)
            if rid is not None:
                for k, (old_id, _c, _a) in enumerate(rules):
                    if old_id == rid:
                        rules[k] = entry
                        break
                else:
                    rules.append(entry)
            else:
                rules.append(entry)

    # PHASE 2: expand to one Rule per action with globally unique ids
    sections: dict[str, RuleSet] = {}
    for section, rules in raw_sections.items():
        rs = sections.setdefault(section, RuleSet())
        for i, (rid, condition, actions) in enumerate(rules):
            for j, act in enumerate(actions):
                if presets and (act.get("presets") or act.get("contacts")):
                    act = dict(act)
                    act["extra_fields"] = expand_presets(act, presets)
                    act.pop("presets", None)
                    act.pop("contacts", None)
                attrs = {"action": act.get("action", "-")}
                for k, v in act.items():
                    if k == "action":
                        continue
                    if k == "extra_fields" and isinstance(v, dict):
                        # flatten: each extra field is its own attr so
                        # %tag templates / selector specs inside compile
                        # per object instead of being stringified
                        for k2, v2 in v.items():
                            attrs[_safe_attr(k2)] = _normalize_spec(v2, type_col)
                        continue
                    attrs[_safe_attr(k)] = _normalize_spec(v, type_col)
                rs.add(Rule(f"{section}:{i}#{j}", condition, attrs))
    return sections


def config_tag_keys(rulesets: dict[str, RuleSet]) -> set[str]:
    """Every tag key the config READS — condition keys plus the columns
    referenced by %tag templates / selector specs in action values (which
    dispatch compiles into column reads). This is the input schema a
    frame must provide for dispatch_all to analyze."""
    keys: set[str] = set()
    for rs in rulesets.values():
        for r in rs.rules:
            keys |= cond_keys(r.condition)
            for v in r.actions.values():
                if _is_field_spec(v):
                    keys |= field_keys(v)
    return keys
