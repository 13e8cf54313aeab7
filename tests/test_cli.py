"""CLI surface tests (cmd/main.go analog): list/run/maintain
subcommands drive the same registry and operators the driver uses,
in-process (main(argv) — no subprocess, reuses the session fixture's
JVM via get_spark's singleton)."""

from __future__ import annotations

import json
import os

from wire_spark.__main__ import main


def test_cli_list_filters_and_shapes(capsys, spark):
    rc = main(["list", "--filter", "tcloseness"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert [x["name"] for x in lines] == ["tcloseness_audit"]
    assert lines[0]["oracle"] is True and lines[0]["bench"] is True


def test_cli_run_query_rows_and_unknown(capsys, spark, sf_dir):
    rc = main(["run", "ldiversity_audit", "--sf-dir", sf_dir])
    assert rc == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert rows and all("l_band" in r and "n_classes" in r for r in rows)

    rc = main(["run", "no_such_query"])
    assert rc == 2
    err = json.loads(capsys.readouterr().err.strip())
    assert "unknown query" in err["error"]


def test_cli_run_limit_and_explain(capsys, spark, sf_dir):
    rc = main(["run", "tokenizer_fertility", "--sf-dir", sf_dir,
               "--limit", "2"])
    assert rc == 0
    assert len(capsys.readouterr().out.splitlines()) == 2

    rc = main(["run", "tokenizer_fertility", "--sf-dir", sf_dir,
               "--explain"])
    assert rc == 0
    plan = capsys.readouterr().out
    assert "HashAggregate" in plan and "ReadSchema" in plan


def test_cli_maintain_compact_and_expire(capsys, spark, sf_dir, tmp_path):
    from wire_spark.engine import load_table
    from pyspark.sql import functions as F

    frag = str(tmp_path / "t")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    o.repartition(16).write.mode("overwrite").parquet(frag)
    rc = main(["maintain", "compact", frag, "--target-mb", "64",
               "--sort-by", "o_orderkey"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["files_after"] < 16
    assert spark.read.parquet(frag).count() == o.count()

    part = str(tmp_path / "by_day")
    ev = load_table(spark, sf_dir, "events")
    (ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
       .write.partitionBy("day").mode("overwrite").parquet(part))
    days = sorted(e.split("=", 1)[1] for e in os.listdir(part)
                  if e.startswith("day="))
    rc = main(["maintain", "expire", part, "day", days[1]])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["dropped"] == [days[0]]
