"""Property-based KV dialect testing: any sequence of SET/DELETE/GET
statements agrees with a reference dict model (last-writer-wins with
tombstones), including after compaction and checkpoint/restore.

Extends the reference's example-based FSM tests
(internal/store/store_test.go:114-507) with generative coverage.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wire_spark.kv import KVStore

# keys/values are whitespace-free tokens (the dialect splits on
# whitespace; FIXTURES.md §1 notes keys are space-free by contract)
_token = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x024F),
    min_size=1,
    max_size=8,
)

_op = st.one_of(
    st.tuples(st.just("SET"), _token, st.lists(_token, min_size=0, max_size=3)),
    st.tuples(st.just("DELETE"), _token),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=1, max_size=12))
def test_kv_agrees_with_dict_model(spark, ops):
    kv = KVStore(spark)
    model: dict[str, str] = {}
    for op in ops:
        if op[0] == "SET":
            _, key, words = op
            res = kv.execute(" ".join(["SET", key, *words]))
            assert res.rows_affected == 1
            model[key] = " ".join(words)
        else:
            _, key = op
            res = kv.execute(f"DELETE {key}")
            assert res.rows_affected == 1  # idempotent (store.go:1725-1730)
            model.pop(key, None)

    # full-state agreement via the resolved relation
    state = {r.key: r.value for r in kv.state().collect()}
    assert state == model

    # point reads agree, incl. misses
    probe_keys = {op[1] for op in ops}
    for k in probe_keys:
        rows = kv.query(f"GET {k}").values
        if k in model:
            assert rows == [[k, model[k]]]
        else:
            assert rows == []

    # compaction preserves observable state
    kv.compact()
    assert {r.key: r.value for r in kv.state().collect()} == model


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=1, max_size=6))
def test_kv_checkpoint_restore_equivalence(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("kvprop") / "kv")
    kv = KVStore(spark, persist_path=path)
    for op in ops:
        kv.execute(" ".join([op[0], op[1], *(op[2] if op[0] == "SET" else [])]))
    kv.checkpoint()
    restored = KVStore(spark, persist_path=path)
    assert (
        sorted((r.key, r.value) for r in restored.state().collect())
        == sorted((r.key, r.value) for r in kv.state().collect())
    )
