"""CLI surface tests (in-process; the CLI is how a reference user runs
jobs — homework mains parity)."""

from __future__ import annotations

from geektime_bigdata_spark.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in out and len(out) > 90


def test_cli_unknown_query(capsys):
    assert main(["run", "nope_not_real"]) == 2


def test_cli_explain(spark, capsys):
    assert main(["explain", "flow_stats", "--sf-dir",
                 "/root/testdata/sf0.001"]) == 0
    assert "Physical Plan" in capsys.readouterr().out
