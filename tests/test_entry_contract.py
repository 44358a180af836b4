"""Differential test of every queries() entry against its DuckDB oracle —
the local mirror of the driver's CORRECTNESS gate, run at sf0.001 for speed
(the driver uses sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_matches_oracle, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_no_duplicate_dict_keys_in_entry_module():
    """A duplicate key in the queries()/oracle_sql() dict literals would
    silently shadow a query — scan the module AST for them."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(entrymod))
    dups: list[str] = []

    class V(ast.NodeVisitor):
        def visit_Dict(self, node: ast.Dict) -> None:
            keys = [
                k.value for k in node.keys if isinstance(k, ast.Constant)
            ]
            dups.extend(k for k in keys if keys.count(k) > 1)
            self.generic_visit(node)

    V().visit(tree)
    assert not dups, f"duplicate dict keys: {sorted(set(dups))}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    assert name in QUERIES, f"oracle_sql has {name} but queries() does not"
    con = duckdb_connection(sf_dir)
    try:
        df = QUERIES[name](spark, sf_dir)
        assert_matches_oracle(df, con, ORACLES[name], name)
    finally:
        con.close()
