"""Timestamp-encoding robustness: the engine must return identical
results no matter how the test-data generator encoded ``events.ts``.

The generator has shipped three encodings across regenerations:
parquet TIMESTAMP(NANOS), tz-aware micros (``timestamp[us, tz=UTC]``),
and tz-naive micros (``timestamp[us]``, read by PySpark 4.x as
TIMESTAMP_NTZ — which broke ``unix_micros``-based queries in round 4).
``engine.load_table`` normalizes all of them to TIMESTAMP under the UTC
session timezone; this test locks that in against the next flip.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wire_spark.catalog import load_registry
from wire_spark.engine import load_table

SF_DIR = "/root/testdata/sf0.001"

#: ts-dependent catalog queries covering windows, CDC, sessionization,
#: dwell percentiles, and RANGE frames — the round-4 breakage surface.
_TS_QUERIES = (
    "window_range_frame_30m",
    "cdc_apply_state",
    "cdc_op_stats",
    "window_tumbling_hourly",
    "window_session_10m",
    "session_dwell_percentiles",
)


@pytest.fixture(scope="module")
def dual_encoding_dirs(tmp_path_factory):
    """Write events.parquet twice: tz-naive and tz-aware micros.

    Every other table is symlinked from the canonical sf dir so the
    catalog queries (which join other tables) run unmodified.
    """
    tbl = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    ts_idx = tbl.schema.get_field_index("ts")
    ts = tbl.column(ts_idx)

    naive_type = pa.timestamp("us")
    aware_type = pa.timestamp("us", tz="UTC")

    dirs = {}
    for label, typ in (("naive", naive_type), ("aware", aware_type)):
        d = tmp_path_factory.mktemp(f"events_{label}")
        cast = tbl.set_column(ts_idx, pa.field("ts", typ), ts.cast(typ))
        pq.write_table(cast, os.path.join(d, "events.parquet"))
        for name in os.listdir(SF_DIR):
            if name != "events.parquet":
                os.symlink(os.path.join(SF_DIR, name), os.path.join(d, name))
        dirs[label] = str(d)
    yield dirs
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)


def test_load_table_normalizes_ntz(spark, dual_encoding_dirs):
    for d in dual_encoding_dirs.values():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (d, df.dtypes)


@pytest.mark.parametrize("name", _TS_QUERIES)
def test_ts_queries_encoding_invariant(spark, dual_encoding_dirs, name):
    reg = load_registry()
    fn = reg[name].fn
    rows = {}
    for label, d in dual_encoding_dirs.items():
        df = fn(spark, d)
        cols = sorted(df.columns)
        rows[label] = [tuple(r) for r in df.select(*cols).collect()]
    assert rows["naive"], f"{name} returned no rows — vacuous invariance"
    assert rows["naive"] == rows["aware"], (
        f"{name} diverges between tz-naive and tz-aware encodings"
    )
