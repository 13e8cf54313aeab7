"""Generate the next round's ``_DRIVER_PRIORITY`` window from the
CORRECTNESS history — makes the rotation mechanical instead of
hand-curated (the hand-curated r8 window mislabeled its exclusions;
ADVICE r8).

Policy (the same one every round has applied by hand, plus the
edited-since-green rule the r11 verdict asked to make explicit):

1. queries that were checked and FAILED with no later green sort
   first of all — none exist today, but red evidence outranks
   everything;
2. every query with NO driver evidence at all (never checked) —
   these can only earn their first green by being in the window;
3. the FORCED cohort: greens that hit the staleness budget at the
   coming round (``newest_green <= next_round - BUDGET``) — these
   must run now or the freshness gate goes red; oldest first,
   ties by name;
4. remaining SLACK slots go to ``EDITED_SINCE_GREEN`` queries
   (kernels substantially rewritten after their newest driver
   green) before any stale-but-untouched green: local bit-identity
   evidence is strong, but the driver hash-match is the hard
   signal and a rewritten kernel should re-earn it at the earliest
   opportunity (VERDICT r11 "What's wrong" #3).  Among edited
   candidates, three-level ordering (the OUTPUTS-CHANGED tier was
   added at r13 per VERDICT r12 "What's wrong" #4):
   a. edits that CHANGED REAL-DATA OUTPUTS first — an edit whose
      values differ on real data carries strictly more driver-risk
      than a plan-only or gate-identity edit (local bit-identity
      evidence does not even exist for it), so it must not wait
      behind older low-risk waves;
   b. then OLDEST EDIT ROUND first (an edit that has waited more
      rounds for driver confirmation outranks every newer wave —
      otherwise a flood of new low-risk edits, like the r12
      zerovec loader-WHERE wave, starves the substantial r11
      kernel rewrites indefinitely);
   c. within one tier+wave the FURTHEST forced deadline first (the
      near-deadline ones get forced slots in a round or two anyway,
      so slack there saves almost nothing, while the
      furthest-deadline query would otherwise wait the full
      staleness budget);
5. any slots still left fill stalest-green-first as before.

Prints the ready-to-paste tuple body plus a deferral summary.  It
does NOT rewrite catalog.py — the window is load-bearing enough that
a human (or the next round's builder) should paste and review it;
tests/test_freshness.py then enforces the invariants.

Run from the repo root:  python tools/rotate_window.py
"""

from __future__ import annotations

import sys

WINDOW = 50
# keep in sync with tests/test_freshness.py MAX_STALENESS_ROUNDS
BUDGET = 5

# Queries whose kernels were substantially rewritten AFTER their newest
# driver green: name -> (edit round, outputs_changed).  ``edit round``
# is the round whose commits contain the rewrite; ``outputs_changed``
# is True when the edit CHANGED REAL-DATA OUTPUT VALUES (not merely the
# plan, an identity gate, or an oracle-mirrored definition) — those
# entries take slack slots ahead of every plan-only wave because local
# bit-identity evidence does not exist for them (VERDICT r12 "What's
# wrong" #4).  A query stays here until a driver green lands at/after
# its edit round (``newest_green >= edit round`` drops it from slack
# consideration automatically, but prune the entry too for readability
# — 15 r12-green entries pruned at the r13 open, plus
# ``q15_top_supplier`` ADDED at r13 (ADVICE r12: its revenue sum was
# widened in the r12 maxmass wave but the entry was omitted; it is
# r13-forced so the re-check lands this round).
EDITED_SINCE_GREEN: dict[str, tuple[int, bool]] = {
    # Driver-green-covered entries pruned in place at r16 (17 names
    # whose newest green >= edit round, the r15 driver window's
    # harvest; the auto-drop rule had already retired them — this is
    # readability only, same as the r13/r14 prunes).
    # r12 zerovec valid-embedding domain gate (loader + oracle WHERE,
    # identity on real data at every SF — verified at r12).
    "ann_ivf_lloyd_cosine": (12, False),
    "ann_recall_audit": (12, False),
    "knn_label_agreement": (12, False),
    # r12 connected_components pointer-jumping rewrite, superseded by
    # the r15 wave-3 raw-edge persist (operator-level; plans changed,
    # outputs bit-identical on real data — re-verified vs the
    # unchanged oracles at r15: connected/lsh/star at sf0.01+sf0.1,
    # survivors at sf0.001+sf0.01, sample at sf0.01; sample's and
    # survivors' sf0.1 DuckDB oracles exhaust this host's temp disk
    # (the known-impractical quadratic-CTE trio) — their operator
    # path is the one sf0.1-green via connected/lsh/star)
    "dedup_connected_components": (15, False),
    # (survivors: consumes both iterative operators; r16 fusions
    # re-verified through it at sf0.001+sf0.01)
    "dedup_survivors_central": (16, False),
    "sample_dedup_weighted": (15, False),
    "dedup_components_lsh": (15, False),
    # r16 star-round window fusion (operator-level: per-key min via a
    # window sharing the groupBy/join exchange — one round: 15
    # Exchange/6 SMJ/12 Sort -> 7/0/4, loop jobs 61 -> 46 on the
    # synthetic chain A/B; outputs bit-identical, re-verified vs the
    # unchanged oracle at sf0.001+0.01+0.1)
    "dedup_components_star": (16, False),
    # r15 wave-3b lazy per-iteration checkpoint in pagerank_fixed
    # (operator-level, plan-shape unchanged; outputs bit-identical —
    # personalized + weighted re-verified at sf0.001+sf0.01; neardup
    # sits in the r15 driver window and is re-verified there)
    # + r16 per-iteration base-join fusion into the rank aggregation
    # (one less exchange and one less SMJ per iteration; integer
    # arithmetic untouched — all four consumers re-verified at
    # sf0.001+0.01, neardup/weighted also at sf0.1)
    "graph_pagerank_personalized": (16, False),
    "graph_pagerank_weighted": (16, False),
    "graph_pagerank_neardup": (16, False),
    # r12 maxmass group-mass overflow wave: msum and every inline
    # fixed-point sum widened to DECIMAL(38,0)/HUGEINT accumulation
    # (bit-identical on real data).  In-window r12/r15 names earned
    # their post-edit greens and were pruned; the rest queue for
    # slack (all three are r16-forced).
    "rollup_plus_tail_merge": (12, False),
    "rollup_time_lattice": (12, False),
    "window_range_frame_30m": (12, False),
    # r13 fixed-point accumulator widening: the one name whose
    # post-edit green has not landed yet (r16-slack slot).
    "corpus_js_divergence": (13, False),
    # r16 restart-protocol single materialization: the tagged
    # envelope projected to the five fold columns and tracked_cache'd
    # once for the prefix/tail branches (3 log scans -> 2; jobs
    # 9 -> 6, 4.45 -> 1.46 s A/B; outputs bit-identical, re-verified
    # vs the unchanged oracle at sf0.001+0.01+0.1).
    "cdc_resume_restart": (16, False),
    # r16 contest-pair shared exchange: repartition(order key) below
    # the aggregation so both self-join branches read one
    # ReusedExchange, replacing the r15 data-sized localCheckpoint
    # (interleaved A/B ~1.62 -> ~1.12 s; outputs bit-identical at
    # sf0.001+0.01+0.1).  bt_strength/basket sit in the r16 window.
    "preference_winrate_wilson": (16, False),
    # r16 literal-table build path: driver-side constants relations
    # (caps/digits/quantile probes/GEMM block map) built as ONE
    # partition via _util.local_df instead of 32 Python-worker slices
    # (~0.2 s per materialization warm; outputs bit-identical —
    # all consumers re-verified at sf0.001+0.01+0.1).
    "dedup_embedding_cosine": (16, False),
    "dedup_cost_model": (16, False),
    "robust_outliers_mad_bucketed": (16, False),
    "quantile_histogram_sketch": (16, False),
    "percentile_bucketed_exact": (16, False),
    "session_dwell_percentiles": (16, False),
    "orders_benford_audit": (16, False),
    # r15 OPTIMIZATION-round plan-only rewrites (outputs verified
    # bit-identical vs the unchanged oracles at sf0.001/0.01/0.1):
    # exact-percentile single-pass conditional-aggregate forms
    # (percentile_order_value, robust MAD pair via shared helper),
    # small-relation localCheckpoint materialization (Lloyd
    # centroids, permutation stats), scan-local langid
    # classification, day-grid broadcast joins.  Queries edited this
    # wave that are IN the r15 driver window are not listed (the
    # window re-verifies them); these queue for slack.
    # + r16 cluster-safety swap: the two data-sized localCheckpoints
    # (signup-user grain `s`, censoring rollup `u`) became eager
    # tracked_caches — lineage kept (executor-loss recoverable,
    # ADVICE r15), caches released after the query's actions; outputs
    # re-verified bit-identical at sf0.001+0.01+0.1.
    "events_survival_hazard": (16, False),
    "ann_ivf_cosine": (15, False),
    "kmeans_lloyd_round": (15, False),
    "kmeans_lloyd_two_rounds": (15, False),
    "ann_ivf_lloyd_cosine": (15, False),
    "percentile_order_value": (15, False),
    "percentile_order_value_bucketed": (15, False),
    "events_permutation_test": (15, False),
    "events_fdr_bh": (15, False),
    # r15 wave 2: bloom bitmap literal built as one parsed SQL
    # expression (driver-side py4j fix; plan and outputs verified
    # identical vs the unchanged oracle at all 3 SFs).
    "bloom_join_prune": (15, False),
}


def propose(root: str = ".") -> tuple[list[str], list[tuple[str, int]]]:
    sys.path.insert(0, root)
    from tools.freshness import build

    fresh = build(root)
    q = fresh["queries"]
    next_round = fresh["latest_round"] + 1

    def green(name: str):
        return q[name]["newest_green"]

    unknown = sorted(n for n in EDITED_SINCE_GREEN if n not in q)
    if unknown:
        raise SystemExit(
            f"EDITED_SINCE_GREEN names not in the registry: {unknown} — "
            "a typo or rename here silently loses the edited-since-green "
            "re-verification guarantee; fix the entry"
        )
    red = sorted(n for n in q if green(n) is None and q[n]["ever_failed"])
    never = sorted(n for n in q if green(n) is None and not q[n]["ever_failed"])
    forced = sorted(
        (n for n in q if green(n) is not None and next_round - green(n) >= BUDGET),
        key=lambda n: (green(n), n),
    )
    window = red + never + forced
    if len(window) > WINDOW:
        raise SystemExit(
            f"unschedulable: {len(window)} forced queries exceed the "
            f"{WINDOW}-slot window — the staleness budget is blown"
        )
    chosen = set(window)
    # slack: edited-since-green first — outputs-changed tier first,
    # then oldest edit wave, then furthest forced deadline (largest
    # newest_green) within a tier+wave — then stalest untouched greens
    edited = sorted(
        (
            n
            for n, (edit_round, _oc) in EDITED_SINCE_GREEN.items()
            if n in q
            and n not in chosen
            and green(n) is not None
            and green(n) < edit_round
        ),
        key=lambda n: (
            not EDITED_SINCE_GREEN[n][1],
            EDITED_SINCE_GREEN[n][0],
            -green(n),
            n,
        ),
    )
    rest = sorted(
        (n for n in q if n not in chosen and n not in set(edited) and green(n) is not None),
        key=lambda n: (green(n), n),
    )
    ordered = window + edited + rest
    window, deferred = ordered[:WINDOW], ordered[WINDOW:]
    # deferral summary: only queries at/near the staleness horizon
    horizon = fresh["latest_round"] - 2
    at_risk = [
        (n, q[n]["newest_green"])
        for n in deferred
        if q[n]["newest_green"] is not None and q[n]["newest_green"] <= horizon
    ]
    return window, at_risk


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    window, at_risk = propose(root)
    print("# paste into wire_spark/catalog.py _DRIVER_PRIORITY:")
    print("_DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    if at_risk:
        print(f"\n# deferred near the staleness horizon ({len(at_risk)}):")
        for n, g in sorted(at_risk, key=lambda t: (t[1], t[0])):
            print(f"#   {n} (newest green r{g})")
