"""Regenerate FRESHNESS.json from the CORRECTNESS_r*.json history.

The driver checks only the first 50 registry queries each round
(see ``wire_spark/catalog.py`` ``_DRIVER_PRIORITY``); with 200+
queries the rotation takes 4+ rounds, so per-query staleness must
be machine-auditable, not comment-tracked.  This script folds every
``CORRECTNESS_r*.json`` in the repo root into one artifact:

    {
      "generated_from": ["CORRECTNESS_r01.json", ...],
      "latest_round": 8,
      "queries": {
        "<name>": {"newest_green": 5, "ever_failed": false},
        ...
      },
      "never_checked": ["...", ...]
    }

A query is *green* in a round when its record has ``rows_match``,
``schema_match``, a non-false ``hash_match`` (``null`` for
rows-only checks), and no ``err``.  ``ever_failed`` records whether
any historical round produced a non-green record for the name —
useful for spotting fixed-then-regressed shapes.

Run from the repo root:  python tools/freshness.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def is_green(rec: dict) -> bool:
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match") in (True, None)
        and not rec.get("err")
    )


def build(root: str = ".") -> dict:
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    newest: dict[str, int] = {}
    failed: set[str] = set()
    checked: set[str] = set()
    latest_round = 0
    for f in files:
        m = re.search(r"r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        for name, rec in json.load(open(f)).items():
            checked.add(name)
            if is_green(rec):
                newest[name] = max(newest.get(name, 0), rnd)
            else:
                failed.add(name)

    sys.path.insert(0, root)
    from wire_spark.catalog import load_registry

    reg = load_registry()
    queries = {
        name: {
            "newest_green": newest.get(name),
            "ever_failed": name in failed,
        }
        for name in sorted(reg)
    }
    return {
        "generated_from": [os.path.basename(f) for f in files],
        "latest_round": latest_round,
        "queries": queries,
        # absent from EVERY round's records — a query that was checked
        # and failed each time has newest_green=null + ever_failed=true
        # but is NOT "never checked" (no-evidence vs red-evidence)
        "never_checked": sorted(n for n in reg if n not in checked),
    }


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    out = build(root)
    path = os.path.join(root, "FRESHNESS.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
        fh.write("\n")
    n = len(out["queries"])
    stale = sorted(
        (q["newest_green"], name)
        for name, q in out["queries"].items()
        if q["newest_green"] is not None
    )[:5]
    print(f"wrote {path}: {n} queries, never_checked={out['never_checked']}")
    print(f"stalest: {stale}")
