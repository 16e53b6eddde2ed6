"""Query registry: every implemented operator exposed as a (spark_fn, oracle_sql)
pair for the driver's correctness gate (__spark_entry__ re-exports these).

spark_fn: Callable[(SparkSession, sf_dir)] -> DataFrame, built on the engine's
operators. oracle_sql: equivalent DuckDB SQL over the same parquet views, or
None for non-SQL-expressible ops (driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def golden_path(name: str) -> str | None:
    """Path of a committed golden parquet artifact (tools/make_golden.py at
    sf0.01), or None when absent (fresh checkout before generation, or
    package imported from a --py-files zip)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "golden", f"{name}.parquet",
    )
    return path if os.path.isfile(path) else None


def golden_oracle(name: str) -> str | None:
    """Oracle SQL for a non-SQL-expressible query: read the committed golden
    parquet (independently validated by the pytest fixtures listed in
    FIXTURES.md §golden). Returns None when the artifact is absent — the
    gate then records the rows-only check it always did. NB: goldens pin
    sf0.01 — the scale the driver's oracle side runs at."""
    path = golden_path(name)
    if path is None:
        return None
    return f"SELECT * FROM read_parquet('{path}')  -- GOLDEN sf0.01"


def load_all() -> None:
    """Import all query modules (idempotent) so the registry is populated."""
    from . import spatial  # noqa: F401
    from . import chains  # noqa: F401
    from . import dedup  # noqa: F401
    from . import text  # noqa: F401
    from . import similarity  # noqa: F401
    from . import rules  # noqa: F401
    from . import geometry  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import images_q  # noqa: F401
    from . import relations  # noqa: F401
    from . import kernels_q  # noqa: F401
    from . import sources_q  # noqa: F401
    from . import render  # noqa: F401
    from . import raster  # noqa: F401
