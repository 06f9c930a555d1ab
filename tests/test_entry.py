"""Replica of the driver's correctness gate: every queries() entry vs
its oracle_sql() in DuckDB at sf0.01 — row count, column names, and
values compared STRICTLY: in result order (the driver's value hash is
order-sensitive — bigram_collocations r4 hash-failed on row order alone
while its sorted values matched), with floats compared exactly after
round(·, 4) (repr equality, −0.0 normalized) instead of isclose — the
combination that let the r4 order bug reach the driver unseen."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(rows, cols):
    """Sort columns by name; keep ROW ORDER (driver hash is
    order-sensitive); round floats to 4dp exactly.

    Deliberately NO −0.0 → 0.0 normalization: the driver is empirically
    confirmed NOT to normalize (r5's one red row, bigram_collocations,
    was Spark 0.0 vs DuckDB -0.0 on a single pmi — Python == calls them
    equal, the repr-sensitive hash does not). Signed zero must be
    normalized in the QUERIES (+ 0.0 after every signed rounded float,
    on BOTH the Spark and the oracle side), never papered over here —
    otherwise this replica stays green while the driver fails."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
            vals.append(v)
        out.append(tuple(vals))
    return [sorted(c for c in cols)] + out


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    if name not in sqls:
        pytest.skip("non-SQL-expressible op: rows-only check")
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(sqls[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    a = _norm(spark_rows, spark_cols)
    b = _norm(duck_rows, duck_cols)
    assert a[0] == b[0], f"column names differ: {a[0]} vs {b[0]}"
    assert len(a) == len(b), f"row count differs: {len(a)-1} vs {len(b)-1}"
    for i, (ra, rb) in enumerate(zip(a[1:], b[1:])):
        for va, vb in zip(ra, rb):
            assert repr(va) == repr(vb), (name, i, ra, rb)
