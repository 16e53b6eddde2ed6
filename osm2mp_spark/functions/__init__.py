from .rules import Rule, RuleSet, cond_eq, cond_ne, cond_exists, cond_regex, cond_and, cond_or  # noqa: F401
