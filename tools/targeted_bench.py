"""Targeted per-query timing for optimization A/B runs: same
methodology as bench.py's query loop (noop sink, steady-state
best-of-N) over an explicit name list, one JSON line out.

Usage: python tools/targeted_bench.py [--reps N] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wire_spark.catalog import load_registry  # noqa: E402
from wire_spark.engine import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wire-spark-targeted-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    out: dict[str, float] = {}
    for name in args:
        q = registry[name]
        times = []
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            out[name] = round(min(times), 3)
        except Exception as e:
            out[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
    from wire_spark.queries._util import release_tracked_caches

    release_tracked_caches()
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
