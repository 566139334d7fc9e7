"""CLI surface smoke tests (in-process: subcommands accept an
injected SparkSession so tests reuse the warm fixture)."""

from __future__ import annotations

import os
import tempfile

from lsd_spark.cli import main
from tests.conftest import SF_DIR


def test_cli_query_prints(capsys, spark):
    main(
        ["query", "SELECT r_name FROM region ORDER BY r_name", "--db", SF_DIR],
        spark=spark,
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5 and out[0] == "AFRICA"


def test_cli_query_writes_csv(spark, tmp_path):
    out = str(tmp_path / "res")
    main(
        ["query", "SELECT n_name, n_regionkey FROM nation", "--db", SF_DIR,
         "--out", out, "--format", "csv"],
        spark=spark,
    )
    got = spark.read.option("header", "true").csv(out)
    assert got.count() == 25


def test_cli_import_roundtrip(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{SF_DIR}/region.parquet").coalesce(1).write.option(
        "header", "true"
    ).csv(src)
    db = str(tmp_path / "wh")
    os.makedirs(db, exist_ok=True)
    main(
        ["import", src, "--table", "region2",
         "--schema", "r_regionkey int, r_name string, r_comment string",
         "--db", db],
        spark=spark,
    )
    assert "imported 5 rows" in capsys.readouterr().out
    assert spark.read.parquet(f"{db}/region2.parquet").count() == 5


def test_cli_xmatch_and_footprint(spark, tmp_path, capsys):
    out = str(tmp_path / "xm")
    main(["xmatch", "--db", SF_DIR, "--out", out], spark=spark)
    assert spark.read.parquet(out).columns == ["m1", "m2", "dist_us"]
    main(["footprint", "--db", SF_DIR, "--out", str(tmp_path / "fp"),
          "--format", "parquet"], spark=spark)
    assert spark.read.parquet(str(tmp_path / "fp")).count() > 0


def test_cli_xmatch2d_and_decontaminate(capsys, spark):
    from lsd_spark.cli import main

    main(["xmatch2d", "--db", "/root/testdata/sf0.001"], spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    assert all(len(ln.split("\t")) == 3 for ln in out)  # l_id, r_id, dist

    main(["decontaminate", "--db", "/root/testdata/sf0.001"], spark=spark)
    out = capsys.readouterr().out.strip()
    # 0+ contaminated rows, each (doc_id, n_hits)
    assert all(len(ln.split("\t")) == 2 for ln in out.splitlines() if ln)
