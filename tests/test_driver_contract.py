"""Replicates the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` twin must match DuckDB exactly (row count,
schema names, order-insensitive values) on the sf0.01 tables."""
import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e
    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result):
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(name, ray_df, sql_df):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    # the driver's value-hash is dtype-sensitive: DuckDB sum(BIGINT)
    # returns HUGEINT (→ object/float in pandas) while the engine emits
    # int64 — `5 == 5.0` passing in pandas is NOT good enough.
    for c in sorted(ray_df.columns):
        ad, bd = str(ray_df[c].dtype), str(sql_df[c].dtype)
        assert ad == bd, f"{name}.{c}: dtype {ad} (engine) != {bd} (oracle)"
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        assert av == bv, f"{name}.{c}: first diff at " + str(next(
            (i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if x != y))


def _oracle_names():
    import __ray_entry__ as e
    return sorted(e.oracle_sql().keys())


# every declared oracle is gated — a new oracle_sql entry is tested
# automatically, it cannot silently skip the comparison
@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(entrymod, con, name):
    qs = entrymod.queries()
    oss = entrymod.oracle_sql()
    assert name in qs and name in oss
    ray_df = _to_pandas(qs[name](SF_DIR))
    sql_df = con.execute(oss[name]).fetchdf()
    _compare(name, ray_df, sql_df)


def test_every_oracle_has_query(entrymod):
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name


def test_rows_only_queries_run(entrymod):
    qs = entrymod.queries()
    for name in ("knn_lsh", "knn_ivf", "pack_sequences"):
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None
