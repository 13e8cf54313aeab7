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
   candidates: OLDEST EDIT ROUND first (an edit that has waited
   more rounds for driver confirmation outranks every newer wave —
   otherwise a flood of new low-risk edits, like the r12 zerovec
   loader-WHERE wave, starves the substantial r11 kernel rewrites
   indefinitely), and within one edit wave the FURTHEST forced
   deadline first (the near-deadline ones get forced slots in a
   round or two anyway, so slack there saves almost nothing, while
   the furthest-deadline query would otherwise wait the full
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
# driver green: name -> round whose commits contain the rewrite.  A
# query stays here until a driver green lands at/after that round
# (``newest_green >= edit round`` drops it from slack consideration
# automatically, but prune the entry too for readability).  The five
# below are the r11 ``longdocs`` super-linear kernel rewrites (commit
# 5b83190); ``quality_logreg_step`` / ``multimodal_feature_stats`` were
# r7-green so the r12 forced cohort re-checks them for free — the dict
# still lists them so the rule is data, not prose.
EDITED_SINCE_GREEN: dict[str, int] = {
    # r11 longdocs super-linear kernel rewrites (commit 5b83190)
    "dedup_winnowing_overlap": 11,
    "context_chunking_plan": 11,
    "text_langid_trigram_trained": 11,
    "quality_logreg_step": 11,
    "multimodal_feature_stats": 11,
    # r12 zerovec valid-embedding domain gate (loader + oracle WHERE,
    # identity on real data at every SF — verified at r12): every
    # embedding-consuming query gained the filter.  The ones inside
    # the r12 window (ann_ivf_cosine, ann_lsh_cosine, ann_pq_adc,
    # embedding_norm_stats, knn_bruteforce_cosine, knn_label_agreement)
    # earn post-edit greens this round and are listed for completeness;
    # the rest queue for slack slots.
    "ann_ivf_cosine": 12,
    "ann_lsh_cosine": 12,
    "ann_pq_adc": 12,
    "embedding_norm_stats": 12,
    "knn_bruteforce_cosine": 12,
    "knn_label_agreement": 12,
    "ann_ivf_lloyd_cosine": 12,
    "ann_lsh_multiprobe_cosine": 12,
    "embedding_quantize_int8": 12,
    "ann_ivfpq_adc": 12,
    "ann_recall_audit": 12,
    "embedding_centroid_distance": 12,
    "embedding_hard_negatives": 12,
    "kmeans_lloyd_round": 12,
    "kmeans_lloyd_two_rounds": 12,
    "embedding_gram_matrix": 12,
    "embedding_power_iteration": 12,
    "search_hybrid_rrf": 12,
    "dedup_crossmodal_audit": 12,
    # r12 connected_components pointer-jumping rewrite (operator-level;
    # dedup_connected_components / dedup_components_lsh /
    # dedup_survivors_central / sample_dedup_weighted changed plans,
    # same outputs — bigclique sweep + full oracle drive re-verified)
    "dedup_connected_components": 12,
    "dedup_components_lsh": 12,
    "dedup_survivors_central": 12,
    "sample_dedup_weighted": 12,
    # r12 maxmass group-mass overflow wave: msum and every inline
    # fixed-point sum widened to DECIMAL(38,0)/HUGEINT accumulation
    # (bit-identical on real data); welch/anova/linear_trend moved to
    # the quadratic-moment tier (|v| <= 1e8 gate, identity on real
    # data); linear_trend's slope and type_stats' avg moved to
    # deterministic integer-derived trees (last-digit definition
    # change, verified both-engine at 3 SFs); sliding-window oracle
    # rebuilt on naive timestamp arithmetic (to_timestamp returned
    # TIMESTAMPTZ -> host-tz labels on non-UTC hosts).  In-window
    # names (r12 cohort) earn their post-edit greens immediately and
    # drop out; the rest queue for slack.
    "events_anova_f": 12,
    "events_linear_trend": 12,
    "events_resample_ffill": 12,
    "events_type_stats": 12,
    "events_welch_ttest": 12,
    "join_broadcast_brand_volume": 12,
    "cube_flag_status": 12,
    "orders_by_month": 12,
    "outer_join_nation_suppliers": 12,
    "q10_returned_items": 12,
    "q11_important_parts": 12,
    "q14_promo_revenue": 12,
    "q17_small_quantity_revenue": 12,
    "q19_disjunctive_filter": 12,
    "q1_pricing_summary": 12,
    "q22_rich_inactive": 12,
    "q3_shipping_priority": 12,
    "q5_local_supplier_volume": 12,
    "q6_forecast_revenue": 12,
    "q7_nation_volume": 12,
    "q8_market_share": 12,
    "q9_profit_by_nation": 12,
    "range_join_price_bands": 12,
    "rollup_plus_tail_merge": 12,
    "rollup_time_lattice": 12,
    "scalar_subquery_above_avg": 12,
    "window_range_frame_30m": 12,
    "window_session_10m": 12,
    "window_sliding_30m": 12,
    "window_tumbling_hourly": 12,
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
    # slack: edited-since-green first — oldest edit wave first, then
    # furthest forced deadline (largest newest_green) within a wave —
    # then stalest untouched greens
    edited = sorted(
        (
            n
            for n, edit_round in EDITED_SINCE_GREEN.items()
            if n in q
            and n not in chosen
            and green(n) is not None
            and green(n) < edit_round
        ),
        key=lambda n: (EDITED_SINCE_GREEN[n], -green(n), n),
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
