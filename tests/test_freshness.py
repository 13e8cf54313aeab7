"""Machine-audited driver-evidence freshness (VERDICT r8 item 8).

With 200+ registry queries and a 50-slot driver window, per-query
driver-green staleness must be enforced by a test, not a comment.
``tools/freshness.py`` folds the CORRECTNESS_r*.json history into
FRESHNESS.json; these tests pin three invariants:

1. The committed FRESHNESS.json matches a fresh regeneration (no
   stale artifact drift).
2. Every registry query is either green within the last
   MAX_STALENESS_ROUNDS rounds or scheduled in the CURRENT 50-slot
   driver window — i.e. nothing can silently age out of the rotation.
3. Never-driver-checked queries are all front-loaded in the window.
4. The rotation is schedulable at all: a 50-slot window refreshing
   stalest-first can keep N queries within MAX_STALENESS_ROUNDS only
   if N <= 50 * MAX_STALENESS_ROUNDS.  VERDICT r9 found the r8 policy
   (240 queries, budget 4 -> capacity 200) arithmetically
   unsatisfiable from r11 onward; the chosen fix (NOTES.md round-10
   log) is budget 5 -> capacity 250, which also means the registry is
   effectively frozen near its current 240 — growth beyond 250 now
   fails loudly here instead of silently rotting the gate.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.freshness import build  # noqa: E402
from wire_spark.catalog import _DRIVER_PRIORITY, load_registry  # noqa: E402

# Raised 4 -> 5 at r10 (VERDICT r9 "What's wrong" #2): with 240
# registry queries and a 50-slot driver window, a 4-round budget caps
# schedulable capacity at 200 — unsatisfiable.  5 rounds x 50 slots =
# 250 fits the 240-query registry with 10 slots of slack; the
# schedulability test below pins the arithmetic so a registry grown
# past 250 (or a shrunk window) fails this suite, not the driver gate.
MAX_STALENESS_ROUNDS = 5
WINDOW_SLOTS = 50


@pytest.fixture(scope="module")
def freshness() -> dict:
    return build(ROOT)


def test_committed_artifact_matches_regeneration(freshness):
    path = os.path.join(ROOT, "FRESHNESS.json")
    assert os.path.exists(path), "FRESHNESS.json missing — run tools/freshness.py"
    committed = json.load(open(path))
    if committed != freshness:
        # The by-far most common cause (every round so far): the driver
        # dropped a new CORRECTNESS_r{N}.json after the artifact was
        # generated.  Name the exact fix instead of dumping a dict diff
        # (VERDICT r11 "What's wrong" #1).
        newer = [
            f
            for f in freshness["generated_from"]
            if f not in committed.get("generated_from", [])
        ]
        assert not newer, (
            f"driver round artifact(s) {newer} landed after FRESHNESS.json "
            "was generated — open the round mechanically: run "
            "`python tools/freshness.py`, then `python tools/rotate_window.py` "
            "and paste the proposed window into wire_spark/catalog.py "
            "_DRIVER_PRIORITY"
        )
    assert committed == freshness, (
        "FRESHNESS.json is stale — regenerate with `python tools/freshness.py`"
    )


def test_every_query_fresh_or_scheduled(freshness):
    reg = load_registry()
    window = set(list(reg)[:50])
    latest = freshness["latest_round"]
    violations = []
    for name, rec in freshness["queries"].items():
        green = rec["newest_green"]
        fresh = green is not None and latest - green < MAX_STALENESS_ROUNDS
        if not fresh and name not in window:
            violations.append((name, green))
    assert not violations, (
        f"queries stale >{MAX_STALENESS_ROUNDS} rounds and not in the "
        f"current driver window: {violations}"
    )


def test_never_checked_queries_lead_the_window(freshness):
    never = freshness["never_checked"]
    head = list(_DRIVER_PRIORITY)[: len(never)] if never else []
    assert sorted(head) == sorted(never), (
        f"never-driver-checked queries {never} must be the first "
        f"{len(never)} names in _DRIVER_PRIORITY (got {head})"
    )


def test_window_is_exactly_fifty_known_names():
    reg = load_registry()
    assert len(_DRIVER_PRIORITY) == 50
    unknown = [n for n in _DRIVER_PRIORITY if n not in reg]
    assert not unknown, f"_DRIVER_PRIORITY names not in registry: {unknown}"
    assert list(reg)[:50] == list(_DRIVER_PRIORITY)


def test_rotation_is_schedulable(freshness):
    """The freshness invariant is only satisfiable when the registry
    fits the rotation's capacity: each round the driver refreshes at
    most WINDOW_SLOTS queries, so after a full cycle every query can
    be at most ceil(N / WINDOW_SLOTS) rounds stale.  N must therefore
    stay <= WINDOW_SLOTS * MAX_STALENESS_ROUNDS or the gate becomes
    arithmetically unsatisfiable no matter how windows are chosen
    (the r9 verdict's finding, with N=240 against capacity 200)."""
    n = len(load_registry())
    capacity = WINDOW_SLOTS * MAX_STALENESS_ROUNDS
    assert n <= capacity, (
        f"registry has {n} queries but the rotation can keep at most "
        f"{capacity} fresh ({WINDOW_SLOTS} slots x {MAX_STALENESS_ROUNDS} "
        f"rounds) — shrink the registry or redesign the freshness gate"
    )


def test_rotate_window_proposal_satisfies_invariants(freshness):
    """tools/rotate_window.py mechanizes the rotation policy; its
    proposal must itself satisfy the freshness invariants: exactly 50
    known names; every never-checked (and ever-red) query first; every
    FORCED query (green hits the staleness budget at the coming round)
    present; slack slots go to edited-since-green kernels (furthest
    forced deadline first) before any stale-but-untouched green
    (VERDICT r11 "What's wrong" #3 made this rule explicit)."""
    from tools.rotate_window import BUDGET, EDITED_SINCE_GREEN, propose
    from wire_spark.catalog import load_registry

    window, at_risk = propose(ROOT)
    reg = load_registry()
    assert len(window) == 50
    assert all(n in reg for n in window)
    q = freshness["queries"]
    next_round = freshness["latest_round"] + 1
    never = set(freshness["never_checked"]) | {
        n for n, r in q.items() if r["newest_green"] is None and r["ever_failed"]
    }
    head = set(window[: len(never)])
    assert head == never, (head ^ never)
    # every forced query (due at the staleness horizon) is in the window
    forced = {
        n
        for n, r in q.items()
        if r["newest_green"] is not None
        and next_round - r["newest_green"] >= BUDGET
    }
    assert forced <= set(window), forced - set(window)
    # the forced block is monotone by newest_green
    forced_tail = [n for n in window[len(never):] if n in forced]
    greens = [q[n]["newest_green"] for n in forced_tail]
    assert greens == sorted(greens)
    # slack slots: eligible edited-since-green kernels outrank untouched
    # stale greens — outputs-changed edits first (r13 tier, VERDICT r12
    # "What's wrong" #4), then oldest edit wave, then furthest forced
    # deadline (largest newest_green) within a tier+wave
    slack = [n for n in window[len(never):] if n not in forced]
    eligible = sorted(
        (
            n
            for n, (edit_round, _oc) in EDITED_SINCE_GREEN.items()
            if n in q
            and n not in forced
            and n not in never
            and q[n]["newest_green"] is not None
            and q[n]["newest_green"] < edit_round
        ),
        key=lambda n: (
            not EDITED_SINCE_GREEN[n][1],
            EDITED_SINCE_GREEN[n][0],
            -q[n]["newest_green"],
            n,
        ),
    )
    k = min(len(slack), len(eligible))
    assert slack[:k] == eligible[:k], (slack[:k], eligible[:k])
    # at-risk report only lists genuinely near-horizon deferrals
    horizon = freshness["latest_round"] - 2
    assert all(g <= horizon for _n, g in at_risk)


def test_kernel_audit_no_unaccounted_edits():
    """tools/kernel_audit.py mechanizes edited-since-green OMISSION
    detection (ADVICE r12: q15_top_supplier's kernel edit was in
    neither the driver window nor EDITED_SINCE_GREEN, and only the
    NOTES prose could have caught it).  Every query whose
    kernel/oracle source hash differs from its driver-verified
    baseline must be scheduled in the current window or carried in
    EDITED_SINCE_GREEN."""
    from tools.kernel_audit import audit

    violations = audit(ROOT)
    assert not violations, "\n".join(violations)


def test_kernel_audit_hash_covers_helper_deps():
    """The r13 CDC tombstone fix proved the shallow hash's blind
    spot: the fix lived in transforms/cdc.py and left the kernel's
    own source untouched.  The hash must now cover one level of
    referenced wire_spark functions — module-global helpers (T /
    msum via co_names) AND kernel-local multi-name imports (the
    greedy-regex bug dropped every name after the first)."""
    import inspect

    from tools.kernel_audit import _dep_sources
    from wire_spark.catalog import load_registry

    reg = load_registry()
    fn = reg["cdc_resume_restart"].fn
    heads = [
        d.splitlines()[0]
        for d in _dep_sources(fn, inspect.getsource(fn))
    ]
    assert any("checkpoint_state" in h for h in heads), heads
    assert any("resume_apply" in h for h in heads), heads
    fn2 = reg["q1_pricing_summary"].fn
    heads2 = [
        d.splitlines()[0]
        for d in _dep_sources(fn2, inspect.getsource(fn2))
    ]
    assert any("def msum" in h for h in heads2), heads2


def test_kernel_audit_catches_planted_omission(tmp_path, monkeypatch):
    """The audit must actually FIRE on the q15 class: fake a baseline
    whose hash differs for a query that is neither in the window nor
    in EDITED_SINCE_GREEN."""
    import json as _json

    from tools import kernel_audit
    from tools.rotate_window import EDITED_SINCE_GREEN
    from wire_spark.catalog import _DRIVER_PRIORITY, load_registry

    victim = next(
        n for n in load_registry()
        if n not in _DRIVER_PRIORITY and n not in EDITED_SINCE_GREEN
    )
    baseline = _json.load(open(os.path.join(ROOT, kernel_audit.BASELINE_PATH)))
    baseline[victim]["hash"] = "0" * 64
    fake = tmp_path / kernel_audit.BASELINE_PATH
    fake.write_text(_json.dumps(baseline))
    monkeypatch.setattr(
        kernel_audit, "_load_baseline", lambda root: _json.load(open(fake))
    )
    violations = kernel_audit.audit(ROOT)
    assert any(v.startswith(victim + ":") for v in violations), violations


def test_kernel_audit_resolves_multiline_parenthesized_imports():
    """ADVICE r13 medium: the old import regex captured only '(' for
    a parenthesized import whose name list starts on the next line
    (extras.py's multimodal_frame_plan), silently dropping every
    helper from the hash.  The ast-based parser must resolve all
    four."""
    import inspect

    from tools.kernel_audit import _dep_sources
    from wire_spark.catalog import load_registry

    fn = load_registry()["multimodal_frame_plan"].fn
    parts = _dep_sources(fn, inspect.getsource(fn))
    for helper in ("attach_media", "decode_media",
                   "frame_offsets", "resize_plan"):
        assert any(p.splitlines() and f"def {helper}" in p.splitlines()[0]
                   for p in parts), helper


def test_kernel_audit_depth_two_helper_closure():
    """VERDICT r13 item 5: the hash closure must follow one more call
    level — cdc_resume_restart references resume_apply, which calls
    apply_cdc; the kernel itself names apply_cdc only in a docstring,
    so only the depth-2 walk can pull apply_cdc's SOURCE in."""
    import inspect

    from tools.kernel_audit import _dep_sources
    from wire_spark.catalog import load_registry

    fn = load_registry()["cdc_resume_restart"].fn
    parts = _dep_sources(fn, inspect.getsource(fn))
    heads = [p.splitlines()[0] for p in parts if p.splitlines()]
    assert any("def resume_apply" in h for h in heads), heads
    assert any("def apply_cdc" in h for h in heads), heads


def test_kernel_audit_hash_covers_runtime_constants(monkeypatch):
    """VERDICT r13 item 5: a kernel that reads a module-level CTE
    string (or cap constant) at RUNTIME via module attribute must
    have that constant's VALUE in its hash inputs, so a planted edit
    to _util.EVENTS_SANITIZED_CTE fires the audit for that kernel."""
    import types

    from tools.kernel_audit import _dep_sources
    from wire_spark.queries import _util

    # Catalog kernels are MODULE-LEVEL functions resolving their
    # helpers through module globals; build the probe kernel the same
    # way (a test-local def would close over _util as a freevar, a
    # shape no registered kernel has).
    src = "def kernel(spark, sf_dir):\n    return _util.EVENTS_SANITIZED_CTE\n"
    g = {"_util": _util}
    exec(compile(src, "<probe>", "exec"), g)
    kernel = g["kernel"]
    assert isinstance(kernel, types.FunctionType)
    before = _dep_sources(kernel, src)
    assert any("EVENTS_SANITIZED_CTE=" in p for p in before), before
    monkeypatch.setattr(_util, "EVENTS_SANITIZED_CTE",
                        _util.EVENTS_SANITIZED_CTE + "/*planted-edit*/")
    after = _dep_sources(kernel, src)
    assert before != after


def test_kernel_audit_migrate_refuses_unaccounted_own_drift(tmp_path):
    """ADVICE r13 low: migrate() must not absolve a genuine kernel
    edit.  A baseline whose FULL hash drifted but OWN hash matches is
    a scope-only change (migrate proceeds); an unaccounted OWN drift
    blocks with exit code 2 unless --force."""
    import json as _json
    import shutil

    import pytest as _pytest

    from tools import kernel_audit
    from tools.rotate_window import EDITED_SINCE_GREEN
    from wire_spark.catalog import _DRIVER_PRIORITY, load_registry

    victim = next(
        n for n in load_registry()
        if n not in _DRIVER_PRIORITY and n not in EDITED_SINCE_GREEN
    )
    src_path = os.path.join(ROOT, kernel_audit.BASELINE_PATH)
    baseline = _json.load(open(src_path))
    assert "own" in baseline[victim]  # r14 migration backfilled it

    # scope-only drift: full hash wrong, own intact -> migrate rewrites
    baseline[victim]["hash"] = "0" * 64
    fake = tmp_path / kernel_audit.BASELINE_PATH
    fake.write_text(_json.dumps(baseline))
    assert kernel_audit.migrate(str(tmp_path)) >= 1
    rewritten = _json.load(open(fake))
    assert rewritten[victim]["hash"] != "0" * 64
    assert rewritten[victim]["round"] == baseline[victim]["round"]

    # unaccounted own drift -> refused without force
    baseline[victim]["hash"] = "0" * 64
    baseline[victim]["own"] = "1" * 64
    fake.write_text(_json.dumps(baseline))
    with _pytest.raises(SystemExit):
        kernel_audit.migrate(str(tmp_path))
    assert kernel_audit.migrate(
        str(tmp_path), force=True,
        justification="unit test: planted own drift",
    ) >= 1


def test_kernel_audit_forced_migrate_requires_justification(tmp_path):
    """VERDICT r14 #6: a --force migration is a hole punched through
    the audit and must be self-documenting — forcing without a
    justification exits non-zero; with one, the justification and the
    absolved names are recorded under the baseline's reserved
    __migrations__ key."""
    import json as _json

    import pytest as _pytest

    from tools import kernel_audit
    from tools.rotate_window import EDITED_SINCE_GREEN
    from wire_spark.catalog import _DRIVER_PRIORITY, load_registry

    victim = next(
        n for n in load_registry()
        if n not in _DRIVER_PRIORITY and n not in EDITED_SINCE_GREEN
    )
    src_path = os.path.join(ROOT, kernel_audit.BASELINE_PATH)
    baseline = _json.load(open(src_path))
    baseline[victim]["hash"] = "0" * 64
    baseline[victim]["own"] = "1" * 64  # unaccounted own drift
    fake = tmp_path / kernel_audit.BASELINE_PATH
    fake.write_text(_json.dumps(baseline))

    with _pytest.raises(SystemExit):
        kernel_audit.migrate(str(tmp_path), force=True)  # no reason
    with _pytest.raises(SystemExit):
        kernel_audit.migrate(str(tmp_path), force=True, justification="  ")

    n = kernel_audit.migrate(str(tmp_path), force=True,
                             justification="unit test absolution")
    assert n >= 1
    rewritten = _json.load(open(fake))
    log = rewritten["__migrations__"]
    assert log[-1]["justification"] == "unit test absolution"
    assert victim in log[-1]["absolved"] and log[-1]["forced"] is True
    # reserved key survives a subsequent refresh untouched
    kernel_audit.refresh(str(tmp_path))
    assert _json.load(open(fake))["__migrations__"] == log
