"""Streaming distribution-drift monitor: per-window Jensen-Shannon
divergence of the live token stream against a reference unigram
profile — the streaming form of ``corpus_js_divergence``
(queries/text3.py) and the alarm an ingest pipeline raises when a
source's content shifts (scraper broke, language mix changed,
boilerplate flood).

Shape: explode tokens -> watermarked tumbling-window (window, token)
counts -> stream-static join to the broadcast reference profile ->
second windowed aggregation folds each CLOSED window's token counts
into one JS score. Two chained stateful aggregations in ONE append-
mode query (legal for time-window aggregations; the second groups on
``window_time`` of the first's window), same chaining pattern as
``markov_stream.windowed_transition_matrix``.

The q-side mass of profile tokens ABSENT from a window needs no grid
row: for p = 0 the pair addend collapses to q*ln(2), so the absent
mass contributes ln(2) * (1 - sum_present q) in closed form — the
second aggregation only ever touches tokens the window actually saw.

Scale notes: agg-1 state is live-windows x window-vocab (bounded by
vocabulary and the watermark horizon, never by stream length); the
profile join is broadcast (vocabulary-sized); agg-2 state is one
accumulator row per live window. All shuffles key on (window, token)
then (window).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch-side helper: (token, q) unigram reference distribution
    from a static corpus (q sums to 1). Compute once, broadcast into
    the stream."""
    tok = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    tot = cnt.agg(F.sum("ct").alias("n"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "token", (F.col("ct") / F.col("n")).alias("q")
    )


def windowed_js_divergence(
    stream: DataFrame,
    profile: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window: (w_start, w_end, n_tokens, js) where js is
    the Jensen-Shannon divergence (nats, <= ln 2) between the
    window's unigram distribution and ``profile`` (a static (token,
    q) frame from :func:`reference_profile`).

    Append semantics: a window's row emits only after the event-time
    watermark passes its end, so the score is final — late tokens
    inside the allowance still fold in. Tokens outside the profile
    carry q = 0; their addend is p*ln(2) (the JS convention for
    disjoint support), handled by coalescing q to 0.
    """
    tok = stream.select(
        F.col(ts_col).alias("ts"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).withWatermark("ts", watermark)
    counts = tok.groupBy(F.window("ts", window).alias("w"), "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    scored = counts.join(F.broadcast(profile), "token", "left").withColumn(
        "q", F.coalesce(F.col("q"), F.lit(0.0))
    )
    # fold each window's (c, q) rows into sufficient statistics; the
    # JS integrand needs the window total ns, so the aggregation
    # carries the raw addends as functions of ns via collected sums:
    #   js = 0.5 * [ sum_present( p*ln(p/m) + q*ln(q/m) )
    #              + ln(2) * (1 - sum_present q) ]
    # with p = c/ns, m = (p+q)/2. ns is itself sum(c), so the per-row
    # terms are computed in a higher-order function AFTER the fold:
    # collect the bounded (c, q) pairs (vocabulary-sized, not
    # stream-sized) and evaluate once per closed window.
    folded = scored.groupBy(
        F.window(F.window_time("w"), window).alias("w2")
    ).agg(
        F.sum("c").alias("ns"),
        F.sum("q").alias("q_present"),
        F.collect_list(F.struct(F.col("c"), F.col("q"))).alias("pairs"),
    )
    ln2 = math.log(2.0)
    term = (
        "aggregate(pairs, CAST(0.0 AS DOUBLE), (acc, x) -> acc"
        " + (x.c / CAST(ns AS DOUBLE))"
        "   * ln((x.c / CAST(ns AS DOUBLE))"
        "        / ((x.c / CAST(ns AS DOUBLE) + x.q) / 2.0))"
        " + CASE WHEN x.q > 0.0 THEN x.q"
        "   * ln(x.q / ((x.c / CAST(ns AS DOUBLE) + x.q) / 2.0))"
        "   ELSE 0.0 END)"
    )
    return folded.select(
        F.col("w2.start").alias("w_start"),
        F.col("w2.end").alias("w_end"),
        F.col("ns").alias("n_tokens"),
        (
            0.5
            * (F.expr(term) + F.lit(ln2) * (F.lit(1.0) - F.col("q_present")))
        ).alias("js"),
    )
