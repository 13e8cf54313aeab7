"""Streaming change-data-feed SOURCE over transactional tables
(operators/txn.py) via Spark 4's Python Data Source API:

    spark.dataSource.register(TxnCdfDataSource)
    (spark.readStream.format("txn_cdf")
          .option("path", table_path)
          .option("payload", "v")          # optional on 1-payload tables
          .option("startingVersion", "1")  # default 1
          .load())

The reference IS a change-stream pipeline (wire README.md:7,
sources/mongo.go change-stream source); this source closes the same
loop from the Spark-native store: a txn table becomes a first-class
`readStream` producer emitting the pipeline's CDC envelope
(resume_token, operation_type, document_id, full_document,
cluster_time — transforms/cdc.py CDC_SCHEMA field names), so the
existing consumers (`apply_cdc`, `fold_vector_delta` →
`merge_index_update`) run unchanged downstream of a table.

Streaming-contract mapping, in Spark's own terms:

- **Offsets are manifest versions.**  ``latestOffset`` is the newest
  committed version; a micro-batch covers ``(start, end]`` and emits
  the NET snapshot diff between the two versions (the
  ``txn_changes`` semantics: intermediate states overwritten within
  the window collapse — correct for last-writer-wins consumers,
  which is what `checkpoint_state` folds anyway).
- **Replay is deterministic by construction.**  Manifests and data
  files are immutable, so re-reading the same offset range after a
  crash yields byte-identical batches — the property a Structured
  Streaming source must provide for checkpoint recovery, inherited
  here from the commit protocol instead of implemented.  The vacuum
  retention window (`txn_vacuum` keep_versions) is therefore the
  source's replay horizon: keep at least as many versions as your
  checkpoint lag.
- **Partitions are moved buckets.**  The driver diffs the two
  manifests (O(n_buckets) JSON) and emits one ``InputPartition`` per
  bucket whose pointer moved, carrying the old/new parquet file
  lists.  Executors read ONLY those files with pyarrow and yield
  Arrow record batches — the per-batch work is O(changed buckets),
  never O(table), and rows never pass through Python one at a time.

Scope: the envelope ships ONE payload column as ``full_document``
(the table's single non-key column, or ``payload=``); change
classification compares that column (list payloads compare
element-wise).  Multi-payload tables stream each column as its own
feed or pre-pack a struct.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource, DataSourceStreamReader, InputPartition)


def ensure_registered(spark) -> None:
    """Idempotently register the data source with this session (the
    registry is session-scoped and re-registration raises)."""
    try:
        spark.dataSource.register(TxnCdfDataSource)
    except Exception as ex:
        if "already" not in str(ex).lower():
            raise


class _BucketDiffPartition(InputPartition):
    def __init__(self, key, payload, bucket, old_files, new_files,
                 end_version):
        self.key = key
        self.payload = payload
        self.bucket = bucket
        self.old_files = old_files
        self.new_files = new_files
        self.end_version = end_version


def _list_parquet(dirpath: str) -> list[str]:
    if not os.path.isdir(dirpath):
        return []
    return sorted(
        os.path.join(dirpath, f) for f in os.listdir(dirpath)
        if f.endswith(".parquet"))


class TxnCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("txn_cdf requires .option('path', <table>)")
        self._payload = options.get("payload")
        self._start = int(options.get("startingVersion", "1"))
        # resolved lazily from the manifest
        self._key = None

    # -- manifest helpers (driver side; plain local/posix fs, the
    #    same access layer operators/txn.py uses)
    def _versions(self):
        from wire_spark.operators.txn import _list_versions
        return _list_versions(self._path)

    def _manifest(self, v):
        from wire_spark.operators.txn import _read_manifest
        return _read_manifest(self._path, v)

    def _resolve_cols(self, m):
        from wire_spark.operators.upsert import BUCKET_COL
        key = m["key"]
        if self._payload is None:
            non_key = [f["name"] for f in m["schema"]["fields"]
                       if f["name"] not in (key, BUCKET_COL)]
            if len(non_key) != 1:
                raise ValueError(
                    f"table at {self._path} has payload columns "
                    f"{non_key}; pass .option('payload', <col>)")
            self._payload = non_key[0]
        self._key = key

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        vs = self._versions()
        if not vs:
            raise ValueError(f"no txn table at {self._path}")
        return {"version": vs[-1]}

    def partitions(self, start: dict, end: dict):
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return []
        m0, m1 = self._manifest(v0), self._manifest(v1)
        self._resolve_cols(m1)
        parts = []
        for b, cdir1 in m1["buckets"].items():
            cdir0 = m0["buckets"].get(b)
            if cdir0 == cdir1:
                continue
            sub = f"__bucket={int(b)}"
            old = (_list_parquet(os.path.join(self._path, cdir0, sub))
                   if cdir0 else [])
            new = (_list_parquet(os.path.join(self._path, cdir1, sub))
                   if cdir1 else [])
            parts.append(_BucketDiffPartition(
                self._key, self._payload, int(b), old, new, v1))
        return parts

    def read(self, partition: _BucketDiffPartition):
        # executor side: pyarrow-only (no SparkSession here) — read
        # the two file lists, outer-merge on the key in pandas, and
        # yield the envelope as Arrow record batches with EXPLICIT
        # types captured from the parquet footers (an all-delete
        # batch must still type full_document as the payload type,
        # not arrow's null type)
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        key, payload = partition.key, partition.payload
        types = {}

        def load(files):
            if not files:
                return None
            t = pa.concat_tables(
                [pq.read_table(f, columns=[key, payload]) for f in files])
            types.setdefault("key", t.schema.field(key).type)
            types.setdefault("payload", t.schema.field(payload).type)
            return t.to_pandas()

        old, new = load(partition.old_files), load(partition.new_files)
        if old is None and new is None:
            return iter(())
        template = old if old is not None else new
        empty = template.iloc[0:0]
        old = (old if old is not None else empty).rename(
            columns={payload: "__old"})
        new = (new if new is not None else empty).rename(
            columns={payload: "__new"})
        j = old.merge(new, on=key, how="outer", indicator=True)

        def eq(a, b):
            na_a, na_b = _is_na(a), _is_na(b)
            if na_a or na_b:
                return na_a and na_b
            try:
                return bool(a == b)
            except (TypeError, ValueError):  # array payloads
                return list(a) == list(b)

        def classify(row):
            if row["_merge"] == "right_only":
                return "insert"
            if row["_merge"] == "left_only":
                return "delete"
            return None if eq(row["__old"], row["__new"]) else "update"

        j["operation_type"] = j.apply(classify, axis=1) if len(j) else None
        j = j[j["operation_type"].notna()] if len(j) else j
        if len(j) == 0:
            return iter(())
        # deletes carry a NULL payload (the tombstone contract)
        docs = j["__new"].where(j["operation_type"] != "delete", None)
        schema = pa.schema([
            ("resume_token", pa.string()),
            ("operation_type", pa.string()),
            ("document_id", types["key"]),
            ("full_document", types["payload"]),
            ("cluster_time", pa.int64()),
        ])
        tbl = pa.Table.from_arrays([
            pa.array("t" + j[key].astype(str).str.zfill(18),
                     type=pa.string()),
            pa.array(j["operation_type"], type=pa.string()),
            pa.array(j[key], type=types["key"]),
            pa.array(docs, type=types["payload"]),
            pa.array([partition.end_version] * len(j), type=pa.int64()),
        ], schema=schema)
        return iter(tbl.to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack


def _is_na(x):
    import pandas as pd
    if x is None:
        return True
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


class TxnCdfDataSource(DataSource):
    """`format("txn_cdf")` — streaming change feed of a txn table."""

    @classmethod
    def name(cls) -> str:
        return "txn_cdf"

    def schema(self) -> str:
        # envelope schema; full_document's element type follows the
        # table's payload column (resolved from the newest manifest)
        path = self.options.get("path")
        if not path:
            raise ValueError("txn_cdf requires .option('path', <table>)")
        from wire_spark.operators.txn import _read_manifest, current_version
        from wire_spark.operators.upsert import BUCKET_COL
        v = current_version(path)
        if v is None:
            raise ValueError(f"no txn table at {path}")
        m = _read_manifest(path, v)
        key = m["key"]
        fields = {f["name"]: f for f in m["schema"]["fields"]}
        payload = self.options.get("payload")
        if payload is None:
            non_key = [n for n in fields if n not in (key, BUCKET_COL)]
            if len(non_key) != 1:
                raise ValueError(
                    f"table at {path} has payload columns {non_key}; "
                    "pass .option('payload', <col>)")
            payload = non_key[0]

        def ddl(f):
            t = f["type"]
            if isinstance(t, dict) and t.get("type") == "array":
                return f"array<{t['elementType']}>"
            return t if isinstance(t, str) else json.dumps(t)

        return (
            "resume_token string, operation_type string, "
            f"document_id {ddl(fields[key])}, "
            f"full_document {ddl(fields[payload])}, "
            "cluster_time long"
        )

    def streamReader(self, schema) -> TxnCdfStreamReader:
        return TxnCdfStreamReader(self.options)
