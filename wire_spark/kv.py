"""KV store + statement dialect: ``SET k v...`` / ``GET k`` / ``DELETE k``.

Re-expresses the reference's Raft-FSM keyspace and its 3-verb mini
query language (reference: internal/store/store.go:1633-1767 parse +
apply; :1300-1395 query) as a keyed DataFrame with last-writer-wins
resolution. Exact edge-case parity with the reference semantics:

- ``SET k``         -> value is the empty string
                       (store.go:1689-1692: joined rest-of-statement).
- ``SET k a  b``    -> value ``"a b"`` — tokens re-joined with single
                       spaces (store.go:1692 strings.Join of Fields).
- ``GET missing``   -> empty result set, NOT an error
                       (store.go:1335-1344).
- ``DELETE missing``-> still reports rows_affected=1 — idempotent
                       delete (store.go:1714-1730).
- Result shape      -> columns ``[key, value]`` typed ``[text, blob]``
                       (store.go:1373).

There is no Raft tier: Spark's driver owns the authoritative state and
durability comes from the table format (SURVEY.md §7.3). Writes append
``(key, value, seq, deleted)`` rows; reads resolve last-writer-wins by
the monotonic ``seq`` — the Spark-native analog of replaying the Raft
log, which makes the store trivially mergeable/compactable at scale
(compaction = keep max-seq row per key, an argmax aggregation).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)


class StatementError(ValueError):
    """Raised for malformed statements (unknown verb / missing key)."""


@dataclass
class ExecuteResult:
    rows_affected: int
    error: str | None = None


@dataclass
class QueryRows:
    """Result envelope mirroring the reference's QueryRows proto
    (internal/command/proto/command.proto:46-53)."""

    columns: list[str]
    types: list[str]
    values: list[list]

    def to_json_dict(self, associative: bool = False) -> dict:
        """JSON forms per internal/command/encoding/json.go:27-160."""
        if associative:
            return {
                "types": dict(zip(self.columns, self.types)),
                "rows": [dict(zip(self.columns, v)) for v in self.values],
            }
        return {"columns": self.columns, "types": self.types, "values": self.values}


def resolve_kv(log: DataFrame) -> DataFrame:
    """Collapse an append-only KV log to live ``(key, value)`` state.

    Last-writer-wins by ``seq`` (the reference's Raft log index analog,
    internal/new/store/store.go:266); tombstones drop the key. This is
    a pure argmax aggregation — one shuffle on ``key``, no window sort
    needed at scale, but we use max_by which Spark executes as a
    partial-aggregated max.
    """
    return (
        log.groupBy("key")
        .agg(
            F.max_by("value", "seq").alias("value"),
            F.max_by("deleted", "seq").alias("deleted"),
        )
        .filter(~F.col("deleted"))
        .select("key", "value")
    )


class KVStore:
    """In-session KV store speaking the reference's statement dialect.

    The log is split into a parquet-backed base (lazy DataFrame — never
    collected to the driver) plus a driver-side tail of rows appended
    since the last checkpoint/compaction. Statement traffic is
    control-plane-sized (pipeline configs, reference store.go usage);
    bulk keyed data belongs on the relational `resolve_kv` path, which
    is a pure max_by aggregation over any log-shaped table.
    """

    def __init__(self, spark: SparkSession, persist_path: str | None = None):
        self.spark = spark
        self.persist_path = persist_path
        self._base: DataFrame | None = None  # lazy parquet-backed log
        self._tail: list[Row] = []           # appends since last persist
        self._seq = 0
        self._lock = threading.Lock()
        # Resolved-state cache for point reads: built at most once per
        # append epoch (invalidated on every write), so N consecutive
        # GETs cost one resolve_kv pass instead of N. Driver-resident
        # by design — this store is control-plane-sized; bulk keyed
        # lookups belong on the relational `kv_point_lookup` path.
        self._resolved: dict[str, str | None] | None = None
        self._n_resolves = 0  # observability: resolves per epoch (tested)
        if persist_path:
            try:
                self._base = spark.read.schema(KV_SCHEMA).parquet(persist_path)
                # scalar aggregate, not a full collect — the log itself
                # stays distributed
                self._seq = self._base.agg(F.max("seq")).first()[0] or 0
            except Exception:
                self._base = None  # fresh store

    # -- statement surface ------------------------------------------

    @staticmethod
    def _parse_write(statement: str) -> tuple[str, str | None, bool] | str:
        """Parse SET/DELETE to (key, value, deleted), or an error
        string. Mirrors internal/store/store.go:1681-1731 —
        whitespace-tokenize; SET joins the value tokens with single
        spaces; DELETE is idempotent but still reports 1 row."""
        tokens = statement.split()
        if not tokens:
            return "empty statement"
        verb = tokens[0].upper()
        if verb == "SET":
            if len(tokens) < 2:
                return "SET requires a key"
            return (tokens[1], " ".join(tokens[2:]), False)
        if verb == "DELETE":
            if len(tokens) != 2:
                return "DELETE requires exactly one key"
            return (tokens[1], None, True)
        return f"unknown verb: {tokens[0]}"

    def execute(self, statement: str) -> ExecuteResult:
        """Apply a write statement: SET / DELETE."""
        parsed = self._parse_write(statement)
        if isinstance(parsed, str):
            return ExecuteResult(0, error=parsed)
        self._append(*parsed)
        return ExecuteResult(1)  # DELETE idempotent (store.go:1725-1730)

    def execute_many(
        self, statements: list[str], transaction: bool = False
    ) -> list[ExecuteResult]:
        """Apply a batch of write statements.

        The reference plumbs a ``transaction`` flag end-to-end
        (command.proto:24-28) but never enforces it
        (store.go:1314 ignores qr.Transaction); here it is real:
        with ``transaction=True`` the batch is all-or-nothing — every
        statement parses first, any error aborts with ZERO state
        change, and the writes land under one lock in one contiguous
        seq range (no interleaving with concurrent writers). With
        ``transaction=False`` statements apply independently and
        errors are reported per-statement (rqlite's default shape).
        """
        if not transaction:
            return [self.execute(s) for s in statements]
        parsed: list[tuple[str, str | None, bool]] = []
        for i, s in enumerate(statements):
            p = self._parse_write(s)
            if isinstance(p, str):
                return [
                    ExecuteResult(0, error=f"transaction aborted by statement {i}: {p}")
                ] * len(statements)
            parsed.append(p)
        with self._lock:
            for key, value, deleted in parsed:
                self._seq += 1
                self._tail.append(
                    Row(key=key, value=value, seq=self._seq, deleted=deleted)
                )
            self._resolved = None
        return [ExecuteResult(1)] * len(statements)

    def query(self, statement: str) -> QueryRows:
        """Run a read statement: GET <key>.

        Missing key -> empty QueryRows, not an error
        (store.go:1335-1344). Exactly two tokens required
        (store.go:1324-1330).
        """
        tokens = statement.split()
        if len(tokens) != 2 or tokens[0].upper() != "GET":
            raise StatementError(f"expected 'GET <key>', got: {statement!r}")
        key = tokens[1]
        resolved = self._resolved_state()
        values = [[key, resolved[key]]] if key in resolved else []
        return QueryRows(columns=["key", "value"], types=["text", "blob"], values=values)

    # -- queued (async) writes ---------------------------------------
    # rqlite write queue analog (internal/http/service.go:369-382,
    # :1106-1159): statements buffer up to `queue_capacity`, flush on
    # `queue_batch_size` or `queue_timeout` seconds, caller gets a
    # sequence number and may wait for it to be applied. In the
    # reference the queue drains through Raft; here it drains through
    # the same FSM-equivalent `execute`, applied in enqueue order.

    def start_queue(
        self,
        capacity: int = 1024,
        batch_size: int = 128,
        timeout: float = 0.1,
    ) -> None:
        import queue as _queue

        self._q: _queue.Queue = _queue.Queue(maxsize=capacity)
        self._q_applied = 0
        self._q_enqueued = 0
        self._q_cv = threading.Condition()
        self._q_stop = False

        def drain() -> None:
            import time as _time

            while True:
                batch: list[str] = []
                deadline = _time.monotonic() + timeout
                while len(batch) < batch_size:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        item = self._q.get(timeout=remaining)
                    except _queue.Empty:
                        break
                    if item is None:
                        # drain remainder then exit
                        for s in batch:
                            self.execute(s)
                        with self._q_cv:
                            self._q_applied += len(batch)
                            self._q_cv.notify_all()
                        return
                    batch.append(item)
                if batch:
                    for s in batch:
                        self.execute(s)
                    with self._q_cv:
                        self._q_applied += len(batch)
                        self._q_cv.notify_all()
                if self._q_stop and self._q.empty():
                    return

        self._q_thread = threading.Thread(target=drain, daemon=True)
        self._q_thread.start()

    def queue_execute(self, statement: str) -> int:
        """Enqueue a write; returns its sequence number (the rqlite
        queue sequence, service.go:1106-1159). The put and the seq
        increment happen under one lock so the returned number always
        matches actual queue order under concurrent producers (the
        drain thread never needs the condition to free queue space,
        so a full-queue put cannot deadlock)."""
        with self._q_cv:
            self._q.put(statement)
            self._q_enqueued += 1
            return self._q_enqueued

    def queue_wait(self, seq: int, timeout: float = 30.0) -> bool:
        """Block until the given sequence number has been applied
        (the ?wait flush path)."""
        with self._q_cv:
            return self._q_cv.wait_for(lambda: self._q_applied >= seq, timeout=timeout)

    def stop_queue(self) -> None:
        self._q_stop = True
        self._q.put(None)
        self._q_thread.join(timeout=30)

    # -- raw access (StoreInDatabase/GetFromDatabase analog,
    #    store.go:2036-2099 — bypasses the statement parser, so values
    #    keep arbitrary whitespace; used for config persistence) ------

    def put(self, key: str, value: str) -> None:
        self._append(key, value, deleted=False)

    def get(self, key: str) -> str | None:
        return self._resolved_state().get(key)

    # -- state ------------------------------------------------------

    def _resolved_state(self) -> dict[str, str | None]:
        """Live ``{key: value}`` snapshot, resolved at most once per
        append epoch (every write clears it). Repeated point reads
        between writes are dict lookups, not log replays."""
        with self._lock:
            if self._resolved is not None:
                return self._resolved
            epoch = self._seq
        resolved = {r.key: r.value for r in self.state().collect()}
        self._n_resolves += 1
        with self._lock:
            # another writer may have appended while we resolved —
            # only install the snapshot if the epoch is unchanged
            if self._seq == epoch:
                self._resolved = resolved
        return resolved

    def _append(self, key: str, value: str | None, deleted: bool) -> None:
        with self._lock:
            self._seq += 1
            self._tail.append(Row(key=key, value=value, seq=self._seq, deleted=deleted))
            self._resolved = None

    def log_df(self) -> DataFrame:
        # The tail is control-plane-sized (driver-resident appends), so
        # build it as ONE partition — the default createDataFrame path
        # slices local data defaultParallelism ways and every slice is
        # a Python-worker task (32 cold worker spawns to count an
        # empty store). An empty tail uses emptyRDD: zero tasks.
        sc = self.spark.sparkContext
        if self._tail:
            tail = self.spark.createDataFrame(
                sc.parallelize(self._tail, 1), schema=KV_SCHEMA
            )
        else:
            tail = self.spark.createDataFrame(sc.emptyRDD(), schema=KV_SCHEMA)
        return self._base.unionByName(tail) if self._base is not None else tail

    def state(self) -> DataFrame:
        return resolve_kv(self.log_df())

    def _swap_persist(self, df: DataFrame) -> None:
        """Write ``df`` as the new persisted log and re-point the lazy
        base at it. Write-to-tmp + rename because the plan being
        written may itself read the current files."""
        tmp = self.persist_path + "__compact_tmp"
        df.write.mode("overwrite").parquet(tmp)
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(self.persist_path)
        fs = dst.getFileSystem(hconf)
        if fs.exists(dst):
            fs.delete(dst, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst)
        self._base = self.spark.read.schema(KV_SCHEMA).parquet(self.persist_path)
        self._tail = []

    def checkpoint(self) -> None:
        """Persist the full log (the reference's snapshot analog,
        store.go:1561-1632) — a distributed parquet write; the
        driver-side tail empties into the base."""
        if self.persist_path:
            with self._lock:
                self._swap_persist(self.log_df())

    def compact(self) -> None:
        """Fold the log to live state (Raft log compaction analog).

        With a persist path this is fully distributed: resolve_kv (a
        max_by aggregation) -> parquet write -> lazy reload; the
        resolved rows NEVER materialize on the driver, so the store
        compacts at any table size. Without a persist path the store
        is driver-resident by construction (the tail list) and folds
        in memory.
        """
        with self._lock:
            folded = resolve_kv(self.log_df()).select(
                "key", "value",
                # compaction leaves exactly one row per key, so a
                # constant seq preserves last-writer-wins; the live
                # counter stays ahead, so later appends always win
                F.lit(1).cast("long").alias("seq"),
                F.lit(False).alias("deleted"),
            )
            if self.persist_path:
                self._swap_persist(folded)
            else:
                live = resolve_kv(self.log_df()).collect()
                self._tail = [
                    Row(key=r.key, value=r.value, seq=i + 1, deleted=False)
                    for i, r in enumerate(sorted(live, key=lambda x: x.key))
                ]
                self._base = None
                self._seq = len(self._tail)
            # logical state is unchanged by compaction, but the seq
            # epoch moved — drop the snapshot rather than reason about it
            self._resolved = None
