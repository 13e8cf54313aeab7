"""variant_schema_profile: hostile-payload cross-engine parity and a
Python replay of the promote-vs-variant shredding decision.

The query is the schemaless ingest path (SURVEY §1.2): both engines
must agree on per-key type labels for every JSON shape — including
the ones that diverge between Spark's ``from_json → variant`` and
DuckDB's ``JSON → MAP(VARCHAR, JSON)`` route when handled naively
(uint64 past int64, duplicate keys, quote-bearing keys, malformed
fragments, non-object roots).
"""

from __future__ import annotations

import duckdb
import pytest

from wire_spark.catalog import load_registry
from wire_spark.oracle import compare_query

REGISTRY = load_registry()

# One payload per probed engine-divergence class.  Each tuple is
# (event_id, event_type, props).
_HOSTILE = [
    (1, "click", '{"k": 87}'),                       # plain int
    (2, "click", '{"k": -9223372036854775808}'),     # int64 min
    (3, "click", '{"k": 9223372036854775807}'),      # int64 max
    (4, "click", '{"k": 18446744073709551615}'),     # uint64: DuckDB UBIGINT, Spark DECIMAL(20,0) -> num
    (5, "click", '{"k": 99999999999999999999999}'),  # past uint64: num both
    (6, "click", '{"k": 95.7}'),                     # decimal -> num
    (7, "click", '{"k": 0.0}'),                      # Spark DECIMAL(1,0) -> num (not int)
    (8, "click", '{"k": 1e3}'),                      # exponent form -> num
    (9, "click", '{"k": "s"}'),                      # string
    (10, "click", '{"k": true}'),                    # bool
    (11, "click", '{"k": null}'),                    # JSON null -> 'null' label
    (12, "click", '{"k": [1,2]}'),                   # array
    (13, "click", '{"k": {"a": 1}}'),                # object
    (14, "view", '{"k":1,"k":2}'),                   # duplicate key: both engines keep both
    (15, "view", '{"a.b": 1, "x\\"y": 2}'),          # path-hostile keys (dot, quote)
    (16, "view", "not json"),                        # malformed -> excluded payload
    (17, "view", '{"k": 1'),                         # truncated -> excluded payload
    (18, "view", "42"),                              # valid non-object -> excluded payload
    (19, "view", "[1,2,3]"),                         # array root -> excluded payload
    (20, "view", '"str"'),                           # string root -> excluded payload
    (21, "view", ""),                                # empty string -> excluded payload
    (22, "view", "{}"),                              # empty object: counted in n_obj, no keys
    (23, "view", None),                              # NULL props -> excluded payload
    (24, "purchase", '{"k": 1}'),                    # polymorphic key across rows...
    (25, "purchase", '{"k": "one"}'),                # ...int + str -> promoted 'variant'
    (26, "purchase", '{"only_null": null}'),         # null-only key -> promoted 'void'
]


@pytest.fixture(scope="module")
def hostile_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 with events.props replaced by the hostile payload set."""
    from wire_spark.engine import load_table

    out = str(tmp_path_factory.mktemp("variant_hostile"))
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            df = spark.createDataFrame(
                [(i, et, p) for i, et, p in _HOSTILE],
                "event_id bigint, event_type string, props string",
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def test_hostile_payload_parity(spark, hostile_dir):
    con = duckdb.connect()
    for t in ["events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_dir}/{t}.parquet/*.parquet')"
        )
    q = REGISTRY["variant_schema_profile"]
    res = compare_query(
        spark, con, "variant_schema_profile", q.fn, q.oracle, hostile_dir
    )
    assert res.ok, str(res)


def test_shred_plan_replay(spark, hostile_dir):
    """Python replay of the decision columns on the hostile corpus."""
    q = REGISTRY["variant_schema_profile"]
    rows = {
        (r.event_type, r.key): r
        for r in q.fn(spark, hostile_dir).collect()
    }
    # click: 13 object payloads, key k present in all 13
    k = rows[("click", "k")]
    assert (k.n_payloads, k.n_obj, k.n_key) == (13, 13, 13)
    assert (k.n_int, k.n_num, k.n_str, k.n_bool) == (3, 5, 1, 1)
    assert (k.n_null, k.n_array, k.n_object) == (1, 1, 1)
    assert k.n_types == 6 and k.promoted == "variant"
    assert (k.int_min, k.int_max) == (-9223372036854775808, 9223372036854775807)
    assert k.coverage_bp == 10000
    # view: 10 payloads, 3 valid objects ({"k":1,"k":2}, the hostile-key
    # object, {}); duplicate keys count per occurrence
    vk = rows[("view", "k")]
    assert (vk.n_payloads, vk.n_obj, vk.n_key) == (10, 3, 2)
    assert vk.promoted == "int" and vk.coverage_bp == 6666
    assert rows[("view", 'a.b')].n_key == 1
    assert rows[("view", 'x"y')].promoted == "int"
    # purchase: polymorphic k -> variant; null-only key -> void
    pk = rows[("purchase", "k")]
    assert pk.n_types == 2 and pk.promoted == "variant"
    on = rows[("purchase", "only_null")]
    assert on.n_key == on.n_null == 1 and on.n_types == 0
    assert on.promoted == "void"
    assert on.int_min is None and on.int_max is None


def test_real_data_shape(spark, sf_dir):
    """On the real corpus every event type carries exactly {"k": int}."""
    q = REGISTRY["variant_schema_profile"]
    out = q.fn(spark, sf_dir).collect()
    assert len(out) == 5
    assert all(r.key == "k" and r.promoted == "int" for r in out)
    assert all(r.coverage_bp == 10000 and r.n_types == 1 for r in out)
