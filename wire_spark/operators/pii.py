"""PII detection and redaction over text columns — the governance
pass every training-data pipeline runs between ingest and tokenize.

Pure JVM-side regex (``regexp_count`` / ``regexp_replace`` inside
whole-stage codegen — no Python UDF in the hot path), so the scan
costs one projection over the corpus at any scale, and redaction is
the same projection writing a new column.

Pattern philosophy: CONSERVATIVE, structural patterns (emails, E.164
/ US phone shapes, SSNs, 16-digit PANs, IPv4) — the high-precision
tier a pipeline hard-redacts.  Recall-oriented NER-style detection
(names, addresses) is a model inference pass, out of scope for a
regex tier and explicitly not promised here.  Patterns use only
regex constructs with identical semantics in Java (Spark) and RE2
(many downstream engines): no backrefs, no lookbehind.

Reference parity: the reference ships no PII tooling; this extends
the governance family (SURVEY §2 gap-fill: kanonymity/ldiversity/
tcloseness audits + contracts gate) to content-level discovery.

Scale notes: ``scan_pii`` is a narrow projection (adds one int per
pattern) — pushdown-friendly, no shuffle; ``pii_audit`` is one
map-combinable groupBy on the audit key.  Redaction order is
longest-pattern-first so a PAN inside a longer digit run is not
partially masked by the phone pattern first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name -> (regex, replacement token), ordered: longer/more-specific
#: patterns first so redaction never leaves a partial match for a
#: later pattern to mangle.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # 16-digit PAN, optionally 4x4 grouped with spaces or dashes
    "credit_card": (
        r"\b(?:\d[ -]?){15}\d\b",
        "[CREDIT_CARD]",
    ),
    # local@domain.tld — the structural core, no exotic quoting
    "email": (
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
        "[EMAIL]",
    ),
    # 123-45-6789 (dashes required: bare 9-digit runs are too noisy)
    "ssn": (
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    # +1-555-123-4567 / +1555 123 4567 / (555) 123-4567 /
    # 555-123-4567 / +15551234567.  Three mid-run guards, one per
    # start shape: a '+' start needs no \b ('+' cannot occur inside
    # a digit run, and \b never matches before '+' — the branch must
    # NOT be behind \b or it is dead and glued '+cc' numbers leak);
    # a bare-digit start takes \b AND a mandatory separator after
    # any country code — otherwise 'id 98765 432-1098' parses as
    # cc=98 + 765 + 432-1098 and redacts from the middle of the id
    # (the r8 false-positive); the '(area)' branch is anchored by
    # '(' itself, so its country code keeps the optional separator.
    # The last alternative is bare E.164: '+' then 10-14 digits.
    "phone": (
        r"(?:\+\d{1,2}[ -]?\d{3}"
        r"|\b(?:\d{1,2}[ -])?\d{3}"
        r"|(?:\+?\d{1,2}[ -]?)?\(\d{3}\))"
        r"[ -]?\d{3}[ -]\d{4}\b"
        r"|\+\d{10,14}\b",
        "[PHONE]",
    ),
    # dotted-quad IPv4 (0-255 per octet)
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b",
        "[IPV4]",
    ),
}


def scan_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Append one ``pii_<name>`` match-count column per pattern plus
    ``pii_total`` — the per-document discovery record.  A projection
    only: no shuffle, no UDF; run it as part of any existing scan.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    out = df
    # NULL text carries no extractable content: counts coalesce to 0
    # so one NULL row can never NULL-poison pii_total (NULL + n = NULL
    # would make the audit read the document as unscanned-but-clean);
    # pii_audit reports NULL documents separately as n_docs_null.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    total: Column = F.lit(0)
    for name, (rx, _repl) in patterns.items():
        c = F.regexp_count(txt, F.lit(rx))
        out = out.withColumn(f"pii_{name}", c)
        total = total + c
    return out.withColumn("pii_total", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace every pattern match with its typed placeholder
    (``[EMAIL]``, ``[SSN]``, …), applied in declaration order
    (most-specific first).  Writes ``out_col`` (default: in place) —
    still a pure projection; the redacted corpus is a one-pass
    rewrite at any size.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    col: Column = F.col(text_col)
    for _name, (rx, repl) in patterns.items():
        col = F.regexp_replace(col, rx, repl)
    return df.withColumn(out_col or text_col, col)


def pii_audit(
    df: DataFrame,
    text_col: str = "text",
    by: str = "source",
    patterns: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-``by``-group release audit: documents scanned, documents
    with ANY match, and per-pattern match totals — the table a
    release review reads before approving a source.  One projection
    + one map-combinable groupBy.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    scanned = scan_pii(df, text_col, patterns)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("pii_total") > 0, 1).otherwise(0))
        .alias("n_docs_with_pii"),
        F.sum(F.when(F.col(text_col).isNull(), 1).otherwise(0))
        .alias("n_docs_null"),
    ]
    for name in patterns:
        aggs.append(F.sum(f"pii_{name}").alias(f"n_{name}"))
    return scanned.groupBy(by).agg(*aggs).orderBy(by)
