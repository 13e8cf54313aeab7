"""Mechanized edited-since-green OMISSION detection (ADVICE r12).

The EDITED_SINCE_GREEN dict in ``tools/rotate_window.py`` is the
re-verification worklist for kernels rewritten after their newest
driver green — but it is hand-maintained, and r12 proved the failure
mode: ``q15_top_supplier``'s revenue sum was widened in the maxmass
wave, yet the entry (and the NOTES tally) omitted it, so the
edited-since-green rule would never have scheduled its driver
re-check.  The unknown-name guard catches typos; nothing caught
omissions.

This tool closes that hole with a per-query source-hash baseline:

- ``KERNEL_BASELINE.json`` maps each registry query name to the
  sha256 of (kernel function source + oracle SQL) as of the last
  time the driver VERIFIED that code (recorded at round open, when
  the just-landed CORRECTNESS greens attest the committed code).
- ``audit()`` recomputes every hash; a query whose hash differs from
  its baseline has been edited since its last driver green, so it
  must be accounted for: either inside the CURRENT driver window
  (re-verified this round) or carried in EDITED_SINCE_GREEN (queued
  for a slack slot).  Anything else is exactly the q15 omission
  class and fails loudly.
- ``--refresh`` (run at round open, right after tools/freshness.py)
  re-baselines every query whose newest driver green is the
  just-landed round: at open, the working tree still equals the code
  that driver run executed, so current-hash == verified-hash.

Scope: the hash covers the kernel function's own source, its oracle
string, and — one level deep — the source of every ``wire_spark``
FUNCTION the kernel references (module-global names like ``T`` /
``msum`` via ``co_names``, plus kernel-local ``from wire_spark.x
import y`` targets resolved by regex).  The r13 CDC tombstone fix
proved the shallow version's blind spot in practice: the fix lived
in ``transforms/cdc.py:checkpoint_state`` and left the kernel's own
source untouched.  Deeper transitive edits (a helper's helper) and
non-function dependencies (CTE string constants referenced via
module attribute) still require manual EDITED_SINCE_GREEN entries.

Run from the repo root:
    python tools/kernel_audit.py            # audit (exit 1 on violations)
    python tools/kernel_audit.py --refresh  # re-baseline driver-verified names
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

BASELINE_PATH = "KERNEL_BASELINE.json"


_IMPORT_RE = None


def _dep_sources(fn, src: str) -> list[str]:
    """Source of every wire_spark FUNCTION the kernel references,
    one level deep: module-global names the code object uses
    (``co_names`` resolved through ``__globals__``) plus
    kernel-local ``from wire_spark.x import y`` targets."""
    global _IMPORT_RE
    import importlib
    import re as _re

    if _IMPORT_RE is None:
        # names group must NOT cross newlines (a greedy [\w,\s]+ ate
        # the following code lines and silently dropped every name
        # after the first — caught by the resolved-deps unit test)
        _IMPORT_RE = _re.compile(
            r"from\s+(wire_spark[.\w]*)\s+import\s+\(?([^\n)]+)"
        )
    deps = {}

    def consider(obj):
        if not (inspect.isfunction(obj)
                and getattr(obj, "__module__", "").startswith("wire_spark")):
            return
        key = f"{obj.__module__}.{obj.__qualname__}"
        if key not in deps:
            try:
                deps[key] = inspect.getsource(obj)
            except (OSError, TypeError):
                pass

    for name in fn.__code__.co_names:
        consider(fn.__globals__.get(name))
    for mod_name, names in _IMPORT_RE.findall(src):
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        for n in (x.strip() for x in names.split(",") if x.strip()):
            consider(getattr(mod, n, None))
    return [deps[k] for k in sorted(deps)]


def _hashes() -> dict[str, str]:
    from wire_spark.catalog import load_registry

    out = {}
    for name, q in load_registry().items():
        src = inspect.getsource(q.fn)
        parts = [src, "----oracle----", q.oracle or ""]
        parts += ["----deps----"] + _dep_sources(q.fn, src)
        out[name] = hashlib.sha256("\n".join(parts).encode()).hexdigest()
    return out


def _load_baseline(root: str) -> dict:
    path = os.path.join(root, BASELINE_PATH)
    if not os.path.exists(path):
        return {}
    return json.load(open(path))


def audit(root: str = ".") -> list[str]:
    """Return human-readable violation strings (empty == clean)."""
    sys.path.insert(0, root)
    from tools.freshness import build
    from tools.rotate_window import EDITED_SINCE_GREEN
    from wire_spark.catalog import _DRIVER_PRIORITY

    baseline = _load_baseline(root)
    current = _hashes()
    fresh = build(root)["queries"]
    window = set(_DRIVER_PRIORITY)
    violations = []
    for name, h in current.items():
        rec = baseline.get(name)
        if rec is None:
            # new registry addition: never-checked queries lead the
            # window by the rotation rule, so membership covers them
            if name not in window:
                violations.append(
                    f"{name}: not in KERNEL_BASELINE.json and not in the "
                    "current driver window — run --refresh after its first "
                    "driver green, or schedule it"
                )
            continue
        if h == rec["hash"]:
            continue
        newest_green = fresh.get(name, {}).get("newest_green")
        edited = EDITED_SINCE_GREEN.get(name)
        accounted = name in window or (
            edited is not None
            and (newest_green is None or newest_green < edited[0])
        )
        if not accounted:
            violations.append(
                f"{name}: kernel/oracle source changed since its last "
                f"driver-verified baseline (r{rec['round']}) but it is "
                "neither in the current driver window nor carried in "
                "EDITED_SINCE_GREEN — the q15_top_supplier omission class; "
                "add an EDITED_SINCE_GREEN entry (or re-baseline if the "
                "driver has in fact verified this exact code)"
            )
    return violations


def refresh(root: str = ".") -> tuple[int, int]:
    """Re-baseline names whose newest driver green is the latest round
    (their verified code is the current working tree at round open),
    plus seed any name missing from the baseline entirely."""
    sys.path.insert(0, root)
    from tools.freshness import build
    from tools.rotate_window import EDITED_SINCE_GREEN

    fresh = build(root)
    latest = fresh["latest_round"]
    baseline = _load_baseline(root)
    current = _hashes()
    updated = seeded = 0
    for name, h in current.items():
        rec = fresh["queries"].get(name, {})
        newest_green = rec.get("newest_green")
        if name not in baseline:
            # seed: record the current hash with the newest green (or
            # 0 for never-checked).  Names carried in EDITED_SINCE_GREEN
            # keep their pending status via that dict — seeding does
            # not absolve them, it only sets the change-detection
            # anchor for FUTURE edits.
            baseline[name] = {"hash": h, "round": newest_green or 0}
            seeded += 1
        elif newest_green == latest and baseline[name]["hash"] != h:
            edited = EDITED_SINCE_GREEN.get(name)
            if edited is not None and edited[0] > latest:
                # edited again AFTER the round the driver just
                # verified — keep the old anchor so the audit still
                # sees the pending change
                continue
            baseline[name] = {"hash": h, "round": latest}
            updated += 1
    with open(os.path.join(root, BASELINE_PATH), "w") as f:
        json.dump(baseline, f, indent=0, sort_keys=True)
        f.write("\n")
    return updated, seeded


def migrate(root: str = ".") -> int:
    """Recompute every baseline hash under the CURRENT hash
    definition, preserving each name's recorded round — for when the
    hash scope itself evolves (as at r13: one-level dep sources
    added).  Queries with genuinely pending edits keep their status
    through EDITED_SINCE_GREEN, exactly as at initial seeding."""
    sys.path.insert(0, root)
    baseline = _load_baseline(root)
    current = _hashes()
    n = 0
    for name, h in current.items():
        if name in baseline and baseline[name]["hash"] != h:
            baseline[name] = {"hash": h, "round": baseline[name]["round"]}
            n += 1
    with open(os.path.join(root, BASELINE_PATH), "w") as f:
        json.dump(baseline, f, indent=0, sort_keys=True)
        f.write("\n")
    return n


if __name__ == "__main__":
    root = "."
    if "--migrate" in sys.argv:
        print(f"wrote {BASELINE_PATH}: {migrate(root)} hashes recomputed")
    elif "--refresh" in sys.argv:
        updated, seeded = refresh(root)
        print(f"wrote {BASELINE_PATH}: {updated} re-baselined, {seeded} seeded")
    else:
        v = audit(root)
        for line in v:
            print("VIOLATION:", line)
        print(f"{len(v)} violations")
        raise SystemExit(1 if v else 0)
