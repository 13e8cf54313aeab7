"""Dump .explain('formatted') for every bench query and tally plan
red flags (optimization round harness, guide §1/§7.2).

For each bench=True registry query this builds the DataFrame at
$SPARK_GRAFT_SF_DIR and writes the formatted physical plan to
``--out`` (default /tmp/plans_audit/<name>.txt), then prints one
tab-separated line per query:

    name  n_exchange  n_smj  n_bhj  n_shj  n_python  n_cartesian  n_sort  n_scan

Iterative kernels (connected components, Lloyd rounds, the bloom
bitmap collect) execute their driver-side loops during plan
construction — that is the kernels' real shape, and the dumped plan
is the FINAL returned DataFrame's plan.

Usage:  python tools/plan_audit.py [--out DIR] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wire_spark.catalog import load_registry  # noqa: E402
from wire_spark.engine import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def tally(plan: str) -> dict[str, int]:
    return {
        "n_exchange": len(re.findall(r"\bExchange\b", plan)),
        "n_smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "n_bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "n_shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "n_python": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
                r"|FlatMapGroupsInPandas|AggregateInPandas",
                plan,
            )
        ),
        "n_cartesian": len(re.findall(r"CartesianProduct", plan)),
        "n_sort": len(re.findall(r"^\(\d+\) Sort\b", plan, re.M)),
        "n_scan": len(re.findall(r"Scan parquet", plan)),
    }


def main() -> None:
    args = sys.argv[1:]
    out_dir = "/tmp/plans_audit"
    if args and args[0] == "--out":
        out_dir = args[1]
        args = args[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wire-spark-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    names = args or sorted(n for n, q in registry.items() if q.bench)
    cols = [
        "n_exchange", "n_smj", "n_bhj", "n_shj",
        "n_python", "n_cartesian", "n_sort", "n_scan",
    ]
    print("name\t" + "\t".join(cols), flush=True)
    for name in names:
        try:
            df = registry[name].fn(spark, sf_dir)
            plan = plan_text(df)
        except Exception as e:
            print(f"{name}\tERROR: {e}", flush=True)
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        t = tally(plan)
        print(name + "\t" + "\t".join(str(t[c]) for c in cols), flush=True)
    from wire_spark.queries._util import release_tracked_caches

    release_tracked_caches()
    spark.stop()


if __name__ == "__main__":
    main()
