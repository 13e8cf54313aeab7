"""Property-based verification of the custom operators with the most
semantic surface: as-of join and connected components, each checked
against a brute-force Python model on random inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wire_spark.operators.graph import connected_components
from wire_spark.operators.joins import asof_join

_key = st.integers(min_value=0, max_value=3)
_t = st.integers(min_value=0, max_value=20)


def _ts(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(_key, _t), min_size=1, max_size=8, unique=True),
    right=st.lists(st.tuples(_key, _t, st.integers(0, 99)), min_size=1, max_size=8,
                   unique_by=lambda r: (r[0], r[1])),
)
def test_asof_join_matches_bruteforce_model(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left)], ["k", "ts", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), float(v)) for k, t, v in right], ["k", "ts", "v"]
    )
    got = {
        (r.k, r.lid): r.matched_v
        for r in asof_join(ldf, rdf, on="k", left_time="ts", right_time="ts",
                           value_cols=["v"]).collect()
    }
    # model: for each left row, the right row of the same key with the
    # greatest ts <= left.ts
    expected = {}
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        expected[(k, i)] = float(max(cands)[1]) if cands else None
    assert got == expected


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                      min_size=1, max_size=15))
def test_components_match_union_find_model(spark, edges):
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.comp for r in connected_components(edf).collect()}

    # union-find model
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {}
    for v in {x for e in edges for x in e}:
        expected[v] = find(v)
    # canonicalize: min element of each component
    comp_min: dict[int, int] = {}
    for v, root in expected.items():
        comp_min[root] = min(comp_min.get(root, v), v)
    expected = {v: comp_min[find(v)] for v in expected}
    assert got == expected


def test_embedding_lsh_recall_vs_exact(spark, sf_dir):
    """dedup_embedding_cosine_lsh is candidates-subset-of-exact with
    measured recall: every LSH pair must appear in the exact result
    with the identical cosine, and recall at sf0.001 is the known 6/7
    (sign-LSH at threshold 0.45 ~ 63 degrees; documented tradeoff)."""
    from wire_spark.catalog import load_registry

    reg = load_registry()
    exact = {
        (r.v1, r.v2): r.cosine
        for r in reg["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    }
    lsh = {
        (r.v1, r.v2): r.cosine
        for r in reg["dedup_embedding_cosine_lsh"].fn(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact)          # no false positives survive verify
    for k, v in lsh.items():
        assert v == exact[k]               # identical verified cosine
    assert len(lsh) >= len(exact) - 1      # 6/7 at sf0.001


def test_lsh_multiprobe_recall(spark, sf_dir):
    """Multi-probe must strictly improve (or tie) LSH recall@5 vs the
    exact brute-force top-5, and its candidate set is a superset of
    single-probe's per query."""
    from wire_spark.catalog import load_registry

    reg = load_registry()

    def top5(name):
        out = {}
        for r in reg[name].fn(spark, sf_dir).collect():
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    exact = top5("knn_bruteforce_cosine")
    single = top5("ann_lsh_cosine")
    multi = top5("ann_lsh_multiprobe_cosine")

    def recall(approx):
        hit = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
        total = sum(len(v) for v in exact.values())
        return hit / total

    r_single, r_multi = recall(single), recall(multi)
    assert r_multi >= r_single
    # embeddings here are near-uniform, so exact top-5 neighbors sit at
    # low cosine and recall is intrinsically modest: probing 9/256
    # buckets scans ~3.5% of the table; measured multi-probe recall
    # (0.12 at sf0.001) is ~3x that random-scan baseline and ~4x the
    # single-probe recall — assert those relative gains, not a fantasy
    # absolute
    assert r_multi >= 0.08
    assert r_multi >= 2 * r_single or r_single == 0


def test_split_is_total_and_stable(spark, sf_dir):
    """Every document lands in exactly one split; assignment is a pure
    function of doc_id (invariant under repartitioning)."""
    from pyspark.sql import functions as F

    from wire_spark.engine import load_table
    from wire_spark.queries._util import md5_long

    d = load_table(spark, sf_dir, "documents")
    b = md5_long(F.col("doc_id").cast("string")) % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    once = d.select("doc_id", split.alias("s"))
    again = d.repartition(7).select("doc_id", split.alias("s"))
    a = {r.doc_id: r.s for r in once.collect()}
    c = {r.doc_id: r.s for r in again.collect()}
    assert a == c
    assert len(a) == d.count()  # total: one assignment per doc
    assert set(a.values()) == {"train", "val", "test"}


def test_packing_plan_conserves_tokens(spark, sf_dir):
    """The packing plan neither loses nor duplicates tokens, bins are
    contiguous from 0, and every bin before the last is filled to at
    least the 2048-token window boundary it spans."""
    from pyspark.sql import functions as F

    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    plan = load_registry()["sequence_packing_plan"].fn(spark, sf_dir).collect()
    bins = [r.bin for r in plan]
    assert bins == list(range(len(bins)))  # contiguous from 0
    total_planned = sum(r.bin_tokens for r in plan)
    d = load_table(spark, sf_dir, "documents")
    total = d.select(F.sum(F.size(F.split("text", " "))).alias("t")).first().t
    assert total_planned == total


def test_winnowing_planted_run_guarantee(spark):
    """The winnowing guarantee, exercised: any shared word run of
    length >= w + k - 1 (= 6 for k=3, w=4) must select at least one
    common fingerprint in both documents — for runs planted at random
    positions inside otherwise-disjoint documents."""
    import random

    from wire_spark.queries.dedup import winnow_pair_overlap

    rng = random.Random(42)
    for trial in range(5):
        run = [f"run{trial}w{j}" for j in range(6)]  # the shared 6-word run
        docs = []
        for doc_id in (1, 2):
            filler = [f"d{doc_id}t{trial}x{j}" for j in range(30)]
            pos = rng.randrange(len(filler) + 1)
            words = filler[:pos] + run + filler[pos:]
            docs.append((doc_id, " ".join(words)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        pairs = winnow_pair_overlap(df).collect()
        assert len(pairs) == 1, f"trial {trial}: planted pair not detected"
        assert (pairs[0].d1, pairs[0].d2) == (1, 2)
        assert pairs[0].n_shared >= 1


def test_winnowing_disjoint_docs_no_overlap(spark):
    from wire_spark.queries.dedup import winnow_pair_overlap

    docs = [
        (1, " ".join(f"a{j}" for j in range(30))),
        (2, " ".join(f"b{j}" for j in range(30))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert winnow_pair_overlap(df).collect() == []


# --------------------------------------------------------------------
# PageRank invariants (pagerank_fixed on synthetic graphs)
# --------------------------------------------------------------------


def _pr(spark, pair_list, iterations=3):
    from wire_spark.operators.graph import pagerank_fixed

    pairs = spark.createDataFrame(pair_list, "src long, dst long")
    edges = pairs.union(pairs.selectExpr("dst as src", "src as dst"))
    return {
        r["node"]: (r["d"], r["r"])
        for r in pagerank_fixed(edges, iterations=iterations).collect()
    }


def test_pagerank_complete_graph_uniform(spark):
    # K4: perfect symmetry => every node must hold exactly the same
    # fixed-point rank after any number of iterations
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    ranks = _pr(spark, k4)
    assert len(ranks) == 4
    assert len({r for _, r in ranks.values()}) == 1


def test_pagerank_star_center_dominates(spark):
    # star(1 center, 5 leaves): the center absorbs every leaf's full
    # contribution each round => strictly larger rank than any leaf,
    # and all leaves identical by symmetry
    star = [(0, i) for i in range(1, 6)]
    ranks = _pr(spark, star)
    center = ranks[0][1]
    leaves = {r for n, (_, r) in ranks.items() if n != 0}
    assert len(leaves) == 1
    assert center > next(iter(leaves))


def test_pagerank_mass_conservation_bound(spark):
    # integer flooring only ever LOSES mass: total rank stays within
    # N * (per-node floor loss bound) below SCALE and never exceeds it
    from wire_spark.operators.graph import _PR_SCALE

    path = [(i, i + 1) for i in range(6)]  # path graph, 7 nodes
    ranks = _pr(spark, path)
    total = sum(r for _, r in ranks.values())
    n = len(ranks)
    assert total <= _PR_SCALE
    # each node floors at most 3 divisions per iteration; loss per
    # floor < 1 unit x contributing edges — a loose linear bound
    assert total >= _PR_SCALE - 1000 * n


# --------------------------------------------------------------------
# Markov transition matrix invariants
# --------------------------------------------------------------------


def test_markov_rows_are_distributions(spark, sf_dir):
    from wire_spark.catalog import load_registry

    reg = load_registry()
    rows = reg["events_markov_transitions"].fn(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, grp in by_prev.items():
        n_from = grp[0]["n_from"]
        assert sum(g["n_trans"] for g in grp) == n_from
        p_sum = sum(g["p_trans"] for g in grp)
        # floored 6dp probabilities: sum in (1 - k*1e-6, 1]
        assert 1.0 - len(grp) * 1e-6 <= p_sum <= 1.0 + 1e-9


# --------------------------------------------------------------------
# weighted-sample (A-ES) stratification invariant
# --------------------------------------------------------------------


def test_weighted_sample_strata_sizes(spark, sf_dir):
    from wire_spark.catalog import load_registry

    from wire_spark.queries._util import T

    reg = load_registry()
    rows = reg["sample_weighted_per_source"].fn(spark, sf_dir).collect()
    per_src: dict[str, int] = {}
    for r in rows:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    n_sources = T(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(per_src) == n_sources  # every stratum represented
    assert all(c <= 10 for c in per_src.values())


# --------------------------------------------------------------------
# round-5 operators: invariants independent of the oracle comparison
# --------------------------------------------------------------------


def test_gopher_rules_counts_consistent(spark, sf_dir):
    from wire_spark.catalog import load_registry

    rows = load_registry()["text_gopher_quality_rules"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in ("n_fail_wordcount", "n_fail_meanlen", "n_fail_stopword",
                  "n_fail_repetition", "n_fail_ttr"):
            assert 0 <= r[c] <= r.n_docs, (r.source, c)
        # pass-all can't exceed docs passing the WORST single rule
        worst = max(r.n_fail_wordcount, r.n_fail_meanlen, r.n_fail_stopword,
                    r.n_fail_repetition, r.n_fail_ttr)
        assert r.n_pass_all <= r.n_docs - worst, r.source


def test_ann_recall_bounds_and_self_hit(spark, sf_dir):
    from wire_spark.catalog import load_registry

    rows = load_registry()["ann_recall_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_truth == 5
        assert 0 <= r.n_hit <= r.n_truth
        assert 0.0 <= r.recall_at_5 <= 1.0
        # floor(10000*h/5)/10000 reconstructs exactly from the counts
        assert abs(r.recall_at_5 - (r.n_hit * 2000) // 1 / 10000.0) < 1e-9


def test_token_budget_plan_monotone_and_budget(spark, sf_dir):
    from wire_spark.catalog import load_registry

    rows = load_registry()["curation_token_budget_plan"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    cum = 0
    prev_q = None
    for r in sorted(rows, key=lambda r: r.rnk):
        cum += r.n_tokens
        assert r.cum_tokens == cum, r.source
        assert r.selected == (1 if 2 * cum <= total else 0), r.source
        if prev_q is not None:
            assert r.mean_quality <= prev_q + 1e-9, "quality ranking not monotone"
        prev_q = r.mean_quality


def test_incremental_dedup_batch_only_and_verified(spark, sf_dir):
    from wire_spark.catalog import load_registry

    rows = load_registry()["dedup_incremental_lsh"].fn(spark, sf_dir).collect()
    assert rows  # non-vacuous at sf0.001 (verified: 8 rejects)
    for r in rows:
        assert r.new_doc_id % 10 == 0          # rejects come from the batch
        assert r.best_match % 10 != 0          # matches come from the corpus
        assert r.n_matches >= 1
        assert r.best_jaccard >= 0.8


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2),                 # key
                  st.integers(-500, 500),            # value (int -> exact)
                  st.integers(0, 10**6)),            # tie id
        min_size=2, max_size=40, unique_by=lambda r: r[2],
    ),
    width=st.sampled_from([1.0, 7.0, 100.0]),
)
def test_bucketed_quantiles_match_sorted_model(spark, vals, width):
    """bucketed_quantiles must be BIT-identical to the sort-the-data
    rank interpolation for any data and any bucket width — the
    histogram-navigation path (incl. the new width parameter) can
    only relocate work, never change the answer."""
    from wire_spark.queries.sketches import bucketed_quantiles

    df = spark.createDataFrame(
        [(k, float(v), t) for k, v, t in vals], ["event_type", "value", "event_id"]
    )
    got = {
        (r[0], r.p): (r.n, r.v)
        for r in bucketed_quantiles(df, (0.5, 0.9), width=width).collect()
    }

    # brute-force rank-interpolation model per key
    from collections import defaultdict
    groups = defaultdict(list)
    for k, v, t in vals:
        groups[k].append((float(v), t))
    expected = {}
    for k, rows in groups.items():
        rows.sort()
        n = len(rows)
        for p in (0.5, 0.9):
            h = (n - 1) * p
            lo, hi = rows[int(h)][0], rows[min(n - 1, int(h) + (h % 1 > 0))][0]
            expected[(k, p)] = (n, lo + (hi - lo) * (h % 1))
    assert set(got) == set(expected)
    for key in expected:
        assert got[key][0] == expected[key][0], key
        assert abs(got[key][1] - expected[key][1]) < 1e-9, key


# -- round-8 operator properties -------------------------------------


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(pts=st.lists(st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
                    min_size=2, max_size=12, unique=True))
def test_morton_key_matches_bit_model_and_tiles(spark, pts):
    """morton_key equals the Python bit-interleave model for every
    in-range point, is injective there, and preserves the tile
    property: two points in the same 2^5-aligned tile sort closer than
    the tile span allows points from different tiles to interleave."""
    from wire_spark.operators.layout import morton_key

    from pyspark.sql import functions as F

    df = spark.createDataFrame(pts, ["x", "y"]).select(
        "x", "y", morton_key(F.col("x"), F.col("y"), bits=10).alias("z")
    )
    got = {(r.x, r.y): r.z for r in df.collect()}

    def model(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): model(x, y) for x, y in pts}
    assert len(set(got.values())) == len(pts)  # injective on the grid


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    a=st.sets(st.integers(0, 30), min_size=1, max_size=12),
    b=st.sets(st.integers(0, 30), min_size=1, max_size=12),
)
def test_containment_dominates_jaccard_model(spark, a, b):
    """Metric sanity on random shingle sets via the same SQL formulas
    dedup_containment evaluates: containment >= jaccard always, and a
    true subset has containment exactly 1.0 regardless of the size
    ratio that makes its jaccard arbitrarily small."""
    i = len(a & b)
    n1, n2 = len(a), len(b)
    union = n1 + n2 - i
    from math import floor
    containment = floor(i * 10000.0 / min(n1, n2)) / 10000.0
    jaccard = floor(i * 10000.0 / union) / 10000.0
    assert containment >= jaccard
    if a <= b or b <= a:
        assert containment == 1.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 9), st.booleans()),
                     min_size=1, max_size=30))
def test_contract_validate_matches_python_model(spark, rows):
    """contracts.validate pass counts/rates/verdicts equal a plain
    Python evaluation of the same predicates, including the
    NULL-counts-as-failure rule (every third value nulled)."""
    from wire_spark.operators.contracts import Expectation, validate

    from pyspark.sql import functions as F

    data = [
        (i, v if i % 3 else None, flag)
        for i, (v, flag) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id LONG, v LONG, flag BOOLEAN")
    result = validate(df, [
        Expectation("v_small", F.col("v") <= 5, min_pass_rate=0.5),
        Expectation("flag_true", F.col("flag"), min_pass_rate=0.0),
    ])
    exp_small = sum(1 for _, v, _f in data if v is not None and v <= 5)
    exp_flag = sum(1 for *_x, f in data if f)
    assert result.n_rows == len(data)
    assert result.rules["v_small"][0] == exp_small
    assert result.rules["flag_true"][0] == exp_flag
    assert ("v_small" in result.failed) == (exp_small / len(data) < 0.5)
    assert "flag_true" not in result.failed


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(pts=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255),
                              st.integers(0, 255)),
                    min_size=2, max_size=10, unique=True))
def test_morton_nd_matches_model_and_2d_compat(spark, pts):
    """morton_key_nd equals the N-dim bit model for 3 columns, is
    injective on the grid, and collapses to morton_key exactly for 2
    columns; out-of-budget dims raise."""
    import pytest

    from pyspark.sql import functions as F

    from wire_spark.operators.layout import morton_key, morton_key_nd

    df = spark.createDataFrame(pts, ["x", "y", "w"]).select(
        "x", "y", "w",
        morton_key_nd([F.col("x"), F.col("y"), F.col("w")], bits=8).alias("z3"),
        morton_key_nd([F.col("x"), F.col("y")], bits=8).alias("z2n"),
        morton_key(F.col("x"), F.col("y"), bits=8).alias("z2"),
    )
    rows = df.collect()

    def model(vals, bits, n):
        z = 0
        for i in range(bits):
            for d, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * n + d)
        return z

    for r in rows:
        assert r.z3 == model((r.x, r.y, r.w), 8, 3)
        assert r.z2n == r.z2  # 2-D nd form == the original interleave
    assert len({r.z3 for r in rows}) == len(pts)
    with pytest.raises(ValueError):
        morton_key_nd([F.col("x")] * 7, bits=10)  # 70 bits > 63
    with pytest.raises(ValueError):
        morton_key_nd([], bits=4)


def test_morton_nd_int_columns_high_bit_positions(spark):
    """IntegerType inputs must not wrap: with 3 dims x 12 bits, bit
    positions reach 35 — Java int shiftleft would mask the distance
    & 31 and collide keys; the internal long cast keeps the nd key
    equal to the Python model for INT columns too."""
    from pyspark.sql import functions as F

    from wire_spark.operators.layout import morton_key_nd

    pts = [(4095, 0, 0), (0, 4095, 0), (0, 0, 4095), (4095, 4095, 4095)]
    df = spark.createDataFrame(pts, "x INT, y INT, w INT").select(
        "x", "y", "w",
        morton_key_nd([F.col("x"), F.col("y"), F.col("w")], bits=12)
        .alias("z"),
    )

    def model(vals):
        z = 0
        for i in range(12):
            for d, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * 3 + d)
        return z

    got = {(r.x, r.y, r.w): r.z for r in df.collect()}
    assert got == {p: model(p) for p in pts}
    assert max(got.values()) >= (1 << 35)  # high positions actually used


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["L", "R"]),
            st.integers(-100_000, 100_000),   # order value (can collide)
            st.integers(0, 9),                # summand a
            st.integers(0, 9),                # summand b
        ),
        min_size=1, max_size=60,
    ),
    bucket=st.sampled_from([1, 7, 1024]),
)
def test_hist_prefix_matches_naive_window_property(spark, rows, bucket):
    """Property: _hist_prefix's two-pass prefix sums equal the naive
    global ordered window for ANY histogram — duplicate order values
    collapse (histogram grain), negatives bucket monotonically, and
    bucket width 1 (every value its own bucket) and width > domain
    (single bucket) are both exact, inclusive and exclusive."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from wire_spark.queries.features import _hist_prefix

    # histogram grain: one row per (part, order value)
    seen = {}
    for p, v, a, b in rows:
        seen[(p, v)] = (a, b)
    h = spark.createDataFrame(
        [(p, v, a, b) for (p, v), (a, b) in seen.items()],
        "part STRING, v LONG, a LONG, b LONG",
    )
    w_in = W.partitionBy("part").orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_ex = W.partitionBy("part").orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ref = sorted(
        map(
            tuple,
            h.select(
                "part", "v",
                F.sum("a").over(w_in).alias("ca"),
                F.coalesce(F.sum("b").over(w_ex), F.lit(0)).alias("cb"),
            ).collect(),
        )
    )
    got_df = _hist_prefix(h, "v", {"ca": "a"}, parts=("part",), bucket=bucket)
    got_df = _hist_prefix(
        got_df, "v", {"cb": "b"}, parts=("part",), inclusive=False, bucket=bucket
    )
    got = sorted(map(tuple, got_df.select("part", "v", "ca", "cb").collect()))
    assert got == ref


def test_attribution_multitouch_replay(spark, sf_dir):
    """Replay first/last/linear attribution per channel from the raw
    journeys; first- and last-touch totals must both equal the count
    of converters with at least one touch."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {r.channel: r for r in
            reg["events_attribution_multitouch"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type))
    agg, n_conv = {}, 0
    for evs in by_user.values():
        purchases = sorted((t, i) for t, i, c in evs if c == "purchase")
        if not purchases:
            continue
        conv = purchases[0]
        touches = sorted((t, i, c) for t, i, c in evs
                         if c != "purchase" and (t, i) < conv)
        if not touches:
            continue
        n_conv += 1
        k = len(touches)
        for _, _, c in touches:
            a = agg.setdefault(c, [0, 0, 0, 0])
            a[0] += 1
            a[3] += 1000000 // k
        agg[touches[0][2]][1] += 1
        agg[touches[-1][2]][2] += 1
    assert rows and set(rows) == set(agg)
    for c, (tc, fc, lc, lin) in agg.items():
        r = rows[c]
        assert (r.touches, r.first_touch, r.last_touch,
                r.linear_credit_1e6) == (tc, fc, lc, lin)
    assert sum(r.first_touch for r in rows.values()) == n_conv
    assert sum(r.last_touch for r in rows.values()) == n_conv


def test_edit_distance_lsh_matches_dp_model(spark, sf_dir):
    """Every emitted pair's distance matches a classic Levenshtein
    DP on the 256-char prefixes, satisfies the integer 0.8 gate, and
    carries the exact floored similarity."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = reg["dedup_edit_distance_lsh"].fn(spark, sf_dir).collect()
    assert rows
    texts = {r.doc_id: r.text[:256] for r in
             load_table(spark, sf_dir, "documents")
             .select("doc_id", "text").collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for r in rows:
        a, b = texts[r.d1], texts[r.d2]
        d, m = lev(a, b), max(len(a), len(b))
        assert r.edit_distance == d and d * 5 <= m
        assert r.edit_sim_1e4 == (m - d) * 10000 // max(m, 1)
        assert r.edit_sim_1e4 >= 8000


def test_fulfillment_lag_replay(spark, sf_dir):
    """Replay per-order first-ship lag and the per-priority rollup."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {r.priority: r for r in
            reg["orders_fulfillment_lag"].fn(spark, sf_dir).collect()}
    orders = {r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
              for r in load_table(spark, sf_dir, "orders")
              .select("o_orderkey", "o_orderpriority", "o_orderdate")
              .collect()}
    first_ship = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate").collect():
        d = r.l_shipdate.date()
        k = r.l_orderkey
        if k not in first_ship or d < first_ship[k]:
            first_ship[k] = d
    per = {}
    for k, (prio, od) in orders.items():
        if k not in first_ship:
            continue
        per.setdefault(prio, []).append((first_ship[k] - od).days)
    assert set(rows) == set(per)
    for prio, lags in per.items():
        r = rows[prio]
        assert (r.n_orders, r.min_lag_days, r.max_lag_days) == (
            len(lags), min(lags), max(lags))
        # both engines TRUNCATE integer division toward zero (Spark
        # div; DuckDB // on integer operands) — Python // floors, so
        # the replay must truncate explicitly for negative sums
        s = sum(lags) * 10000
        trunc = -((-s) // len(lags)) if s < 0 else s // len(lags)
        assert r.avg_lag_1e4 == trunc
        assert r.n_over_60d == sum(1 for d in lags if d > 60)


def test_substitution_savings_replay(spark, sf_dir):
    """Replay the blocked cheapest-other-brand model: every emitted
    row's alternative is the true minimum over different-brand
    same-type/same-size parts, and no saving opportunity is missed."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {r.p_partkey: r for r in
            reg["part_substitution_savings"].fn(spark, sf_dir).collect()}
    parts = [(r.p_partkey, r.p_brand, r.p_type, r.p_size,
              int(r.p_retailprice * 100 + 0.5))
             for r in load_table(spark, sf_dir, "part").collect()]
    blocks = {}
    for pk, br, ty, sz, c in parts:
        blocks.setdefault((ty, sz), []).append((pk, br, c))
    expected = {}
    for (ty, sz), members in blocks.items():
        for pk, br, c in members:
            others = [mc for mpk, mbr, mc in members if mbr != br]
            if others and min(others) < c:
                expected[pk] = (br, c, min(others), c - min(others))
    assert rows and set(rows) == set(expected)
    for pk, (br, c, alt, sav) in expected.items():
        r = rows[pk]
        assert (r.p_brand, r.cents, r.alt_cents, r.savings_cents) == (
            br, c, alt, sav)


def test_pr_curve_replay_and_invariants(spark, sf_dir):
    """Replay the PR curve from raw rows; recall must be monotone
    non-increasing in s, the lowest threshold must have recall 1e6,
    and (tp, fp) must agree with model_auc_rank's class totals."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = sorted(reg["model_pr_curve"].fn(spark, sf_dir).collect(),
                  key=lambda r: r.s)
    docs = [(1 if r.lang == "en" else 0, len(r.text.split(" ")))
            for r in load_table(spark, sf_dir, "documents")
            .select("lang", "text").collect()]
    P = sum(y for y, _ in docs)
    N = len(docs) - P
    assert {r.s for r in rows} == {s for _, s in docs}
    for r in rows:
        tp = sum(1 for y, s in docs if y == 1 and s >= r.s)
        fp = sum(1 for y, s in docs if y == 0 and s >= r.s)
        assert (r.tp, r.fp) == (tp, fp)
        assert r.precision_1e6 == tp * 1000000 // max(tp + fp, 1)
        assert r.recall_1e6 == tp * 1000000 // max(P, 1)
    recalls = [r.recall_1e6 for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    assert rows[0].recall_1e6 == 1000000 and rows[0].tp == P
    assert rows[0].fp == N


def test_time_to_convert_replay(spark, sf_dir):
    """Replay signup-to-first-purchase delays in microseconds and
    the exact type-1 deciles over the hour histogram."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {r.decile: r for r in
            reg["events_time_to_convert"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").collect()
    su, pu = {}, {}
    for r in ev:
        if r.event_type == "signup":
            if r.user_id not in su or r.ts < su[r.user_id]:
                su[r.user_id] = r.ts
    for r in ev:
        if r.event_type == "purchase" and r.user_id in su \
                and r.ts >= su[r.user_id]:
            if r.user_id not in pu or r.ts < pu[r.user_id]:
                pu[r.user_id] = r.ts
    delays = sorted(
        int((pu[u] - su[u]).total_seconds() * 1000000) // 3600000000
        for u in pu)
    n = len(delays)
    assert n > 0 and set(rows) == set(range(1, 10))
    for q in range(1, 10):
        thr = (q * n + 9) // 10
        assert (rows[q].delay_hours, rows[q].n_converters) == (
            delays[thr - 1], n)
    # deciles are monotone
    ds = [rows[q].delay_hours for q in range(1, 10)]
    assert ds == sorted(ds)


def test_rolling_active_7d_replay(spark, sf_dir):
    """Replay rolling 7-day distinct actives; WAU >= DAU everywhere,
    stickiness is the exact floored ratio, and a day's WAU equals
    the union of the trailing week's daily user sets."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {r.day: r for r in
            reg["events_rolling_active_7d"].fn(spark, sf_dir).collect()}
    per_day = {}
    for r in load_table(spark, sf_dir, "events").select(
            "user_id", "ts").collect():
        per_day.setdefault(r.ts.strftime("%Y-%m-%d"), set()).add(r.user_id)
    import datetime as dt
    assert set(rows) == set(per_day)
    for day, users in per_day.items():
        d = dt.date.fromisoformat(day)
        wau_set = set()
        for back in range(7):
            wau_set |= per_day.get(str(d - dt.timedelta(days=back)), set())
        r = rows[day]
        assert (r.dau, r.wau) == (len(users), len(wau_set))
        assert r.wau >= r.dau
        assert r.stickiness_1e4 == len(users) * 10000 // len(wau_set)


def test_cohort_ltv_triangle_replay(spark, sf_dir):
    """Replay the LTV triangle from raw journeys: per-cell buyers and
    revenue, cohort-cumulative revenue, and per-signup LTV; the
    cohort grid must align with retention_cohorts' conventions."""
    import math

    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    reg = load_registry()
    rows = {(r.cohort_week, r.week_n): r for r in
            reg["cohort_ltv_triangle"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value").collect()

    def week_start(ts):
        d = ts.date()
        return d - __import__("datetime").timedelta(days=d.weekday())

    cohort = {}
    for r in ev:
        if r.event_type == "signup":
            w = week_start(r.ts)
            if r.user_id not in cohort or w < cohort[r.user_id]:
                cohort[r.user_id] = w
    n_cohort, cells = {}, {}
    for u, w in cohort.items():
        n_cohort[w] = n_cohort.get(w, 0) + 1
    for r in ev:
        if r.event_type != "purchase" or r.user_id not in cohort:
            continue
        cw = cohort[r.user_id]
        if r.ts.date() < cw:
            continue
        wn = (week_start(r.ts) - cw).days // 7
        c = cells.setdefault((cw, wn), [set(), 0])
        c[0].add(r.user_id)
        c[1] += int(math.floor(r.value * 10000.0))
    expected = {}
    for (cw, wn), (buyers, rev) in cells.items():
        if wn <= 8:
            cum = sum(v for (c2, w2), (_, v) in cells.items()
                      if c2 == cw and w2 <= wn)
            # both engines TRUNCATE integer division; Python //
            # floors, which diverges if refunds make cum negative
            nc = n_cohort[cw]
            ltv = -((-cum) // nc) if cum < 0 else cum // nc
            expected[(str(cw), wn)] = (len(buyers), rev, cum, ltv)
    assert rows and set(rows) == set(expected)
    for k, (nb, rev, cum, ltv) in expected.items():
        r = rows[k]
        assert (r.n_buyers, r.rev_v4, r.cum_rev_v4,
                r.ltv_per_signup_v4) == (nb, rev, cum, ltv)


def test_source_ablation_loso_replay(spark, sf_dir):
    """Full plain-Python replay of the leave-one-source-out readout:
    token/stopword counts per the shared regexes, complement
    arithmetic, and the fixed-point floors — plus the accounting
    identity that token shares sum to ~1e6."""
    import re

    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text").collect()
    ws = re.compile(r"\S+")
    stopw = re.compile(r"\b(?:the|a|of|and|in)\b")
    agg = {}
    for r in docs:
        if r.text is None or r.source is None:
            continue
        n, t, s = agg.get(r.source, (0, 0, 0))
        agg[r.source] = (n + 1, t + len(ws.findall(r.text)),
                         s + len(stopw.findall(r.text)))
    nn = sum(v[0] for v in agg.values())
    tok_g = sum(v[1] for v in agg.values())
    stop_g = sum(v[2] for v in agg.values())
    want = {}
    for src, (n, t, s) in agg.items():
        loso_tok = ((tok_g - t) * 10000 // (nn - n)) if nn > n else None
        loso_stop = ((stop_g - s) * 1000000 // (tok_g - t)) \
            if tok_g > t else None
        want[src] = (
            n, t * 1000000 // tok_g, loso_tok,
            None if loso_tok is None else loso_tok - tok_g * 10000 // nn,
            loso_stop,
            None if loso_stop is None
            else loso_stop - stop_g * 1000000 // tok_g,
        )
    rows = load_registry()["source_ablation_loso"].fn(
        spark, sf_dir).collect()
    assert len(rows) == len(want) and rows
    for r in rows:
        assert want[r.source] == (
            r.n_docs, r.token_share_1e6, r.loso_mean_tok_1e4,
            r.delta_mean_tok_1e4, r.loso_stop_1e6, r.delta_stop_1e6)
    # floors lose < 1 unit each: shares sum into (1e6 - k, 1e6]
    share_sum = sum(r.token_share_1e6 for r in rows)
    assert 1000000 - len(rows) < share_sum <= 1000000
    # a dropped above-average-length source must lower the LOSO mean
    for r in rows:
        src_mean = agg[r.source][1] * 10000 // agg[r.source][0]
        if r.loso_mean_tok_1e4 is not None and src_mean > tok_g * 10000 // nn:
            assert r.delta_mean_tok_1e4 <= 0


def test_valid_embedding_domain_gate(spark, tmp_path):
    """The r12 zerovec contract gate (tightened by the r12 review
    pass): zero-norm, non-finite, and >=1e6-norm vectors (dd >= 1e12)
    are excluded by the shared loader; unit-scale, denormal-scale,
    and near-budget vectors pass.  One malformed row must never be
    able to crash a cosine kernel (ANSI 0/0) or silently saturate a
    1e6-scale fixed-point floor again."""
    import pyspark.sql.functions as F

    rows = [
        (0, [0.0] * 64, 1),            # zero norm -> out
        (1, [0.5] * 64, 1),            # unit-ish -> in
        (2, [1.0e30] * 64, 1),         # huge -> out
        (3, [1.0e-30] * 64, 1),        # denormal-scale, nonzero -> in
        (4, [float("nan")] * 64, 1),   # non-finite -> out
        (5, [float("inf")] * 64, 1),   # non-finite -> out
        (6, [1.0e10] * 64, 1),         # dd=6.4e21: old gate admitted,
                                       # saturates 1e6 floors -> out
        (7, [3.0] * 64, 1),            # dd=576: in-gate, above unit -> in
    ]
    df = spark.createDataFrame(rows, ["vec_id", "raw", "label"]).select(
        "vec_id", F.col("raw").cast("array<float>").alias("embedding"), "label"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.write.parquet(path)

    from wire_spark.queries.similarity import _valid_vectors

    kept = sorted(
        r.vec_id for r in _valid_vectors(spark, str(tmp_path)).collect()
    )
    assert kept == [1, 3, 7]


# --------------------------------------------------------------------
# Vector-index maintenance: arbitrary CDC logs vs a replay model
# --------------------------------------------------------------------

_vop = st.sampled_from(["insert", "update", "replace", "delete", "update_null"])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(ops=st.lists(st.tuples(st.integers(0, 9), _vop),
                    min_size=0, max_size=25))
def test_vector_fold_update_matches_replay_model(spark, ops):
    """update_cells over fold_vector_delta must agree with a Python
    dict replay of ANY op sequence — not just the fixed %7/%13/%11
    catalog protocol: last op per key wins (strictly increasing
    cluster_time), a delete removes the key, a NULL-payload upsert is
    an index tombstone (the r15 gate), and `changed` marks exactly
    the keys whose winning op carries a payload."""
    from pyspark.sql import functions as F

    from wire_spark.operators.vector_index import (
        assign_cells, fold_vector_delta, update_cells)

    def vec(key: int, salt: int) -> list[float]:
        return [float(key % 3 + 1 + salt % 5), float((key * 7) % 4 + 1)]

    base = {k: vec(k, 0) for k in range(10)}
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], ["vec_id", "v"])
    cent = base_df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.sqrt(F.aggregate(F.zip_with("v", "v", lambda a, b: a * b),
                           F.lit(0.0), lambda a, b: a + b)).alias("cn"))
    cells0 = assign_cells(base_df, cent)

    # replay model: dict of live payloads + the set of changed keys
    state = dict(base)
    winner: dict[int, str] = {}
    rows = []
    for i, (key, op) in enumerate(ops):
        payload = None if op in ("delete", "update_null") else vec(key, i + 1)
        rows.append((f"t{i:04d}", "update" if op == "update_null" else op,
                     key, payload, i + 1))
        winner[key] = op
    for key, op in winner.items():
        if op in ("delete", "update_null"):
            state.pop(key, None)
    # apply winning payloads from the LAST payload-bearing win
    for key, op in winner.items():
        if op not in ("delete", "update_null"):
            last_i = max(i for i, (k, o) in enumerate(ops)
                         if k == key and o == op and o == winner[key])
            state[key] = vec(key, last_i + 1)

    if rows:
        changes = spark.createDataFrame(
            rows, "resume_token string, operation_type string, "
                  "document_id long, full_document array<double>, "
                  "cluster_time long")
        got_df = update_cells(cells0, fold_vector_delta(changes), cent)
    else:
        got_df = cells0.withColumn("changed", F.lit(0))
    got = {r.vec_id: (r.cid, r.changed) for r in got_df.collect()}

    expected_cells = {
        r.vec_id: r.cid
        for r in assign_cells(
            spark.createDataFrame(
                [(k, v) for k, v in state.items()],
                "vec_id long, v array<double>"),
            cent).collect()
    } if state else {}
    assert {k: c for k, (c, _) in got.items()} == expected_cells
    expected_changed = {k for k, op in winner.items()
                        if op not in ("delete", "update_null")}
    assert {k for k, (_, ch) in got.items() if ch == 1} == expected_changed
