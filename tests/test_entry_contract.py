"""Driver-contract shape checks (no Spark session needed)."""

import inspect


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert len(qs) >= 20
    # every oracle key has a query
    assert set(sqls) <= set(qs)
    # at least 20 oracle-checked entries
    assert len(sqls) >= 20
    for name, fn in qs.items():
        sig = inspect.signature(fn)
        assert len(sig.parameters) == 2, f"{name} must take (spark, sf_dir)"
    for name, sql in sqls.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    assert callable(e.entry)


def test_oracle_sql_runs_on_duckdb():
    """Every oracle SQL parses and executes on DuckDB against the
    sf0.001 tables (result correctness vs Spark is covered by
    tools/check_oracle.py and the driver's own gate)."""
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as exc:   # pragma: no cover
            raise AssertionError(f"{name} oracle SQL failed: {exc}") from exc
