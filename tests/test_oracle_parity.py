"""Replicates the driver's correctness gate locally: every
``__spark_entry__.queries()`` entry that has an ``oracle_sql()``
counterpart is run on Spark AND on DuckDB over the same parquet tables,
and the results must agree exactly (order-insensitive, columns sorted by
name — the same normalization the driver's value-hash applies).

Runs at sf0.001 by default (fast); set PARITY_SF_DIR to check another
tier (e.g. /root/testdata/sf0.01, the driver's gate scale).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entry.oracle_sql()
CHECKED = sorted(set(entry.queries()) & set(ORACLES))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(rows, columns):
    """Order-insensitive canonical form: columns sorted by name, floats
    rounded to 9 significant-ish digits, rows sorted."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in order], out


@pytest.mark.parametrize("name", CHECKED)
def test_parity(spark, ddb, name):
    q = entry.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    _, s_norm = _normalize(s_rows, s_cols)
    _, d_norm = _normalize(d_rows, d_cols)
    assert len(s_norm) == len(d_norm), (
        f"{name}: row count spark={len(s_norm)} duckdb={len(d_norm)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ][:5]
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
