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

Scope (r14 closure of the two documented r13 blind spots): the hash
covers the kernel function's own source, its oracle string, and the
transitive closure — TWO function-call levels deep (kernel → helper →
helper-of-helper) — of every ``wire_spark`` FUNCTION the code
references, plus every module-level CONSTANT (str/bytes/bool/int/
float/tuple) the code reads at runtime, whether via a module-global
name, a ``mod.ATTR`` attribute access on a wire_spark module, or a
function-local ``from wire_spark.x import y`` (parsed with ``ast``,
so parenthesized multi-line imports and aliases resolve — the old
regex silently dropped every name of a parens-wrapped import whose
name list started on the next line, ADVICE r13 medium).  Names are
collected from the full code-object tree (``co_names`` of the
function AND its nested lambdas/comprehensions).  The r13 CDC
tombstone fix proved the shallow version's blind spot in practice:
the fix lived in ``transforms/cdc.py:checkpoint_state`` and left the
kernel's own source untouched.  Oracle CTE constants composed at
module import time (``_X_ORACLE = SOME_CTE + ...``) were never a
hole — ``q.oracle`` is re-read at audit time, so the composed string
already reflects the edit; the constants scope closes the RUNTIME
reference class (a kernel reading ``_util.EVENTS_SANITIZED_CTE`` or
a module-level cap like ``_K`` while executing).

Remaining (documented) limits: call levels beyond two, constants of
container types with order-unstable reprs (set/dict — none load-
bearing today), and dependencies reached only through objects
(class attributes, closures over non-module state).

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


_CONST_TYPES = (str, bytes, bool, int, float, tuple)
_FUNC_DEPTH = 2  # kernel -> helper -> helper-of-helper


def _code_names(code) -> set[str]:
    """co_names of a code object AND of every nested code object
    (lambdas, comprehensions, inner defs) — a name used only inside
    a nested scope is still a runtime dependency."""
    import types

    names = set(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            names |= _code_names(c)
    return names


def _import_targets(src: str) -> list[tuple[str, str]]:
    """(module, name) for every ``from wire_spark.x import y`` in
    ``src``, parsed with ``ast`` so parenthesized multi-line forms
    and aliases resolve (the old regex captured only '(' when the
    name list started on the next line — ADVICE r13 medium)."""
    import ast
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return []
    out = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.ImportFrom) and node.module
                and node.module.startswith("wire_spark")):
            out.extend((node.module, a.name) for a in node.names)
    return out


def _dep_sources(fn, src: str) -> list[str]:
    """Hash inputs for everything the kernel depends on beyond its
    own source: wire_spark function sources (transitively, to
    ``_FUNC_DEPTH`` call levels) and module-level constants the code
    reads (globals, ``mod.ATTR`` on wire_spark modules, and
    function-local wire_spark imports)."""
    import importlib

    deps: dict[str, str] = {}    # function key -> source
    consts: dict[str, str] = {}  # "module:name" -> repr(value)

    def consider(obj, key_hint: str, depth: int) -> None:
        if (inspect.isfunction(obj)
                and getattr(obj, "__module__", "").startswith("wire_spark")):
            key = f"{obj.__module__}.{obj.__qualname__}"
            if key in deps:
                return
            try:
                obj_src = inspect.getsource(obj)
            except (OSError, TypeError):
                return
            deps[key] = obj_src
            if depth < _FUNC_DEPTH:
                walk(obj, obj_src, depth + 1)
        elif isinstance(obj, _CONST_TYPES):
            consts.setdefault(key_hint, repr(obj))

    def walk(f, f_src: str, depth: int) -> None:
        names = _code_names(f.__code__)
        g = f.__globals__
        wire_mods = []
        for name in sorted(names):
            if name.startswith("__"):
                continue
            obj = g.get(name)
            if (inspect.ismodule(obj)
                    and obj.__name__.startswith("wire_spark")):
                wire_mods.append(obj)
            else:
                consider(obj, f"{f.__module__}:{name}", depth)
        # mod.ATTR access pattern: co_names holds both the module name
        # and the attribute name; probe every referenced name against
        # every referenced wire_spark module
        for mod in wire_mods:
            for name in sorted(names):
                if name.startswith("__"):
                    continue
                consider(getattr(mod, name, None),
                         f"{mod.__name__}:{name}", depth)
        for mod_name, n in _import_targets(f_src):
            try:
                mod = importlib.import_module(mod_name)
            except ImportError:
                continue
            consider(getattr(mod, n, None), f"{mod_name}:{n}", depth)

    walk(fn, src, 1)
    return ([deps[k] for k in sorted(deps)]
            + ["----consts----"]
            + [f"{k}={consts[k]}" for k in sorted(consts)])


def _hashes() -> dict[str, dict[str, str]]:
    """Per query: ``hash`` (full dependency scope — the audit key)
    and ``own`` (kernel source + oracle only).  ``own`` is stable
    across hash-SCOPE evolutions, which is what lets migrate()
    verify that a scope migration is not absolving a genuine kernel
    edit (ADVICE r13 low)."""
    from wire_spark.catalog import load_registry

    out = {}
    for name, q in load_registry().items():
        src = inspect.getsource(q.fn)
        own_parts = [src, "----oracle----", q.oracle or ""]
        own = hashlib.sha256("\n".join(own_parts).encode()).hexdigest()
        parts = own_parts + ["----deps----"] + _dep_sources(q.fn, src)
        full = hashlib.sha256("\n".join(parts).encode()).hexdigest()
        out[name] = {"hash": full, "own": own}
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
    for name, cur in current.items():
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
        if cur["hash"] == rec["hash"]:
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
    for name, cur in current.items():
        rec = fresh["queries"].get(name, {})
        newest_green = rec.get("newest_green")
        if name not in baseline:
            # seed: record the current hash with the newest green (or
            # 0 for never-checked).  Names carried in EDITED_SINCE_GREEN
            # keep their pending status via that dict — seeding does
            # not absolve them, it only sets the change-detection
            # anchor for FUTURE edits.
            baseline[name] = {
                "hash": cur["hash"], "own": cur["own"],
                "round": newest_green or 0,
            }
            seeded += 1
        elif newest_green == latest and baseline[name]["hash"] != cur["hash"]:
            edited = EDITED_SINCE_GREEN.get(name)
            if edited is not None and edited[0] > latest:
                # edited again AFTER the round the driver just
                # verified — keep the old anchor so the audit still
                # sees the pending change
                continue
            baseline[name] = {
                "hash": cur["hash"], "own": cur["own"], "round": latest,
            }
            updated += 1
        elif baseline[name]["hash"] == cur["hash"]:
            # unchanged code: backfill the own-hash on legacy entries
            baseline[name].setdefault("own", cur["own"])
    with open(os.path.join(root, BASELINE_PATH), "w") as f:
        json.dump(baseline, f, indent=0, sort_keys=True)
        f.write("\n")
    return updated, seeded


def migrate(root: str = ".", force: bool = False,
            justification: str | None = None) -> int:
    """Recompute every baseline hash under the CURRENT hash
    definition, preserving each name's recorded round — for when the
    hash scope itself evolves (as at r13: one-level dep sources
    added; r14: ast imports + constants + depth 2).

    A scope migration must not absolve a genuine pending edit
    (ADVICE r13 low: the old migrate() rewrote every mismatched hash
    unconditionally).  Guard: the ``own`` hash (kernel source +
    oracle only) is scope-stable, so any name whose OWN hash drifted
    from its baseline while unaccounted (neither in the current
    driver window nor in EDITED_SINCE_GREEN) is a real edit —
    migrate refuses and lists them unless ``--force``.  Legacy
    entries without an own-hash cannot be verified and also require
    ``--force`` (one-time, when the own field first lands).

    A ``--force`` absolution is a hole punched through the audit, so
    it must be SELF-DOCUMENTING (VERDICT r14 #6 — the r14 forced
    migration's justification lived only in NOTES): forcing requires
    a ``justification`` string, which is recorded with the absolved
    names under the baseline's reserved ``__migrations__`` key; a
    forced migrate without one exits non-zero."""
    sys.path.insert(0, root)
    from tools.rotate_window import EDITED_SINCE_GREEN
    from wire_spark.catalog import _DRIVER_PRIORITY

    baseline = _load_baseline(root)
    current = _hashes()
    window = set(_DRIVER_PRIORITY)
    blockers = []
    for name, cur in current.items():
        rec = baseline.get(name)
        if rec is None or rec["hash"] == cur["hash"]:
            continue
        if name in window or name in EDITED_SINCE_GREEN:
            continue
        if "own" not in rec:
            blockers.append(f"{name}: legacy entry has no own-hash — "
                            "cannot verify the migration is scope-only")
        elif rec["own"] != cur["own"]:
            blockers.append(f"{name}: kernel/oracle OWN source drifted — "
                            "this is a real edit, not a scope change; "
                            "schedule it before migrating")
    if blockers and not force:
        for b in blockers:
            print("MIGRATE BLOCKED:", b)
        raise SystemExit(2)
    if blockers and force:
        if not (justification and justification.strip()):
            print("MIGRATE BLOCKED: --force requires --justification "
                  "\"<why these absolutions are safe>\" — the absolved "
                  "names are recorded in the baseline so a forced "
                  "migration is self-documenting")
            raise SystemExit(2)
        log = baseline.setdefault("__migrations__", [])
        log.append({
            "forced": True,
            "justification": justification.strip(),
            "absolved": sorted(b.split(":", 1)[0] for b in blockers),
        })
    n = 0
    for name, cur in current.items():
        if name in baseline and baseline[name]["hash"] != cur["hash"]:
            baseline[name] = {
                "hash": cur["hash"], "own": cur["own"],
                "round": baseline[name]["round"],
            }
            n += 1
    with open(os.path.join(root, BASELINE_PATH), "w") as f:
        json.dump(baseline, f, indent=0, sort_keys=True)
        f.write("\n")
    return n


if __name__ == "__main__":
    root = "."
    if "--migrate" in sys.argv:
        just = None
        if "--justification" in sys.argv:
            i = sys.argv.index("--justification")
            just = sys.argv[i + 1] if i + 1 < len(sys.argv) else None
        n = migrate(root, force="--force" in sys.argv, justification=just)
        print(f"wrote {BASELINE_PATH}: {n} hashes recomputed")
    elif "--refresh" in sys.argv:
        updated, seeded = refresh(root)
        print(f"wrote {BASELINE_PATH}: {updated} re-baselined, {seeded} seeded")
    else:
        v = audit(root)
        for line in v:
            print("VIOLATION:", line)
        print(f"{len(v)} violations")
        raise SystemExit(1 if v else 0)
