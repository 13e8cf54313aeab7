"""KV dialect semantics, mirroring the reference's FSM tests
(internal/store/store_test.go:114-507): SET/GET/DELETE incl. edge
cases — multi-word value re-joining, GET-miss empty result, idempotent
DELETE, QueryRows JSON encoding shapes."""

from __future__ import annotations

import pytest

from wire_spark.kv import KVStore, StatementError


@pytest.fixture()
def kv(spark):
    return KVStore(spark)


def test_set_get_roundtrip(kv):
    assert kv.execute("SET k1 v1").rows_affected == 1
    rows = kv.query("GET k1")
    assert rows.columns == ["key", "value"]
    assert rows.types == ["text", "blob"]
    assert rows.values == [["k1", "v1"]]


def test_set_multiword_value_rejoined_single_spaces(kv):
    # store.go:1692 — value tokens re-joined with single spaces
    kv.execute("SET k2 hello   big    world")
    assert kv.query("GET k2").values == [["k2", "hello big world"]]


def test_set_bare_key_empty_value(kv):
    # store.go:1689-1692 — SET with no value -> empty string
    kv.execute("SET k3")
    assert kv.query("GET k3").values == [["k3", ""]]


def test_get_missing_key_empty_not_error(kv):
    # store.go:1335-1344
    rows = kv.query("GET nope")
    assert rows.values == []
    assert rows.columns == ["key", "value"]


def test_delete_idempotent_reports_one(kv):
    # store.go:1714-1730 — DELETE of a missing key still reports 1
    assert kv.execute("DELETE ghost").rows_affected == 1
    kv.execute("SET k4 v4")
    assert kv.execute("DELETE k4").rows_affected == 1
    assert kv.query("GET k4").values == []


def test_last_writer_wins(kv):
    kv.execute("SET k5 first")
    kv.execute("SET k5 second")
    kv.execute("SET k5 third")
    assert kv.query("GET k5").values == [["k5", "third"]]


def test_unknown_verb_and_malformed(kv):
    assert kv.execute("UPSERT k v").error is not None
    assert kv.execute("").error is not None
    assert kv.execute("SET").error is not None
    with pytest.raises(StatementError):
        kv.query("GET")  # wrong arity (store.go:1324-1330)
    with pytest.raises(StatementError):
        kv.query("FETCH k")


def test_queryrows_json_shapes(kv):
    # internal/command/encoding/json.go:27-160 plain vs associative
    kv.execute("SET a 1")
    rows = kv.query("GET a")
    assert rows.to_json_dict() == {
        "columns": ["key", "value"],
        "types": ["text", "blob"],
        "values": [["a", "1"]],
    }
    assert rows.to_json_dict(associative=True) == {
        "types": {"key": "text", "value": "blob"},
        "rows": [{"key": "a", "value": "1"}],
    }


def test_compact_preserves_state(kv):
    kv.execute("SET x 1")
    kv.execute("SET y 2")
    kv.execute("SET x 3")
    kv.execute("DELETE y")
    kv.compact()
    assert kv.query("GET x").values == [["x", "3"]]
    assert kv.query("GET y").values == []


def test_persistence_roundtrip(spark, tmp_path):
    path = str(tmp_path / "kv_parquet")
    kv1 = KVStore(spark, persist_path=path)
    kv1.execute("SET durable yes")
    kv1.checkpoint()
    kv2 = KVStore(spark, persist_path=path)
    assert kv2.query("GET durable").values == [["durable", "yes"]]


def test_queued_writes_sequence_and_wait(kv):
    """rqlite queue semantics (service.go:369-382, :1106-1159):
    buffered statements, sequence numbers, wait-for-flush."""
    kv.start_queue(batch_size=4, timeout=0.05)
    try:
        seqs = [kv.queue_execute(f"SET qk{i} v{i}") for i in range(10)]
        assert seqs == list(range(1, 11))
        assert kv.queue_wait(seqs[-1], timeout=30)
        for i in range(10):
            assert kv.query(f"GET qk{i}").values == [[f"qk{i}", f"v{i}"]]
    finally:
        kv.stop_queue()


def test_queued_writes_apply_in_order(kv):
    kv.start_queue(batch_size=2, timeout=0.02)
    try:
        kv.queue_execute("SET ok first")
        kv.queue_execute("SET ok second")
        s = kv.queue_execute("SET ok third")
        assert kv.queue_wait(s, timeout=30)
        assert kv.query("GET ok").values == [["ok", "third"]]  # enqueue order
    finally:
        kv.stop_queue()


def test_execute_many_transaction_atomic(kv):
    """transaction=True is all-or-nothing: a malformed statement in
    the batch leaves state untouched (the reference plumbs the
    transaction flag, command.proto:24-28, but never enforces it —
    here it is enforced)."""
    kv.execute("SET base v0")
    bad_batch = ["SET a 1", "BOGUS x", "SET b 2"]
    res = kv.execute_many(bad_batch, transaction=True)
    assert all(r.error and "aborted" in r.error for r in res)
    state = {r.key: r.value for r in kv.state().collect()}
    assert "a" not in state and "b" not in state  # nothing applied
    assert state["base"] == "v0"

    ok = kv.execute_many(["SET a 1", "DELETE base", "SET b x y"], transaction=True)
    assert [r.rows_affected for r in ok] == [1, 1, 1]
    state = {r.key: r.value for r in kv.state().collect()}
    assert state == {"a": "1", "b": "x y"}


def test_execute_many_non_transactional_partial(kv):
    """Without the flag, statements apply independently and errors are
    per-statement."""
    res = kv.execute_many(["SET p 1", "BOGUS", "SET q 2"])
    assert res[0].rows_affected == 1
    assert res[1].error and "unknown verb" in res[1].error
    assert res[2].rows_affected == 1
    state = {r.key: r.value for r in kv.state().collect()}
    assert state["p"] == "1" and state["q"] == "2"


def test_resolved_state_cached_one_resolve_per_epoch(kv):
    # repeated point reads between writes must replay the log exactly
    # once (the resolved-state cache), not once per GET
    kv.execute("SET ck v1")
    kv.execute("SET ck2 v2")
    assert kv._n_resolves == 0
    for _ in range(5):
        assert kv.get("ck") == "v1"
        assert kv.query("GET ck2").values == [["ck2", "v2"]]
    assert kv._n_resolves == 1
    kv.execute("SET ck v9")  # new epoch -> exactly one more resolve
    assert kv.get("ck") == "v9"
    assert kv.get("ck2") == "v2"
    assert kv._n_resolves == 2
    kv.execute("DELETE ck2")
    assert kv.get("ck2") is None
    assert kv.query("GET ck2").values == []
    assert kv._n_resolves == 3
