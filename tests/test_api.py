"""HTTP facade tests: the rqlite-style surface end-to-end over a real
socket (service.go route parity)."""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from wire_spark.api import WireService


@pytest.fixture()
def svc(spark):
    s = WireService(spark)
    port = s.serve()
    yield s, f"http://127.0.0.1:{port}"
    s.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _delete(url):
    req = urllib.request.Request(url, method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_readyz_and_status(svc):
    _, base = svc
    assert _get(base + "/readyz")[1] == {"ready": True}
    code, st = _get(base + "/status")
    assert code == 200 and "spark" in st and "store" in st


def test_execute_query_roundtrip(svc):
    _, base = svc
    code, res = _post(base + "/db/execute", ["SET greeting hello world", "SET n 1"])
    assert code == 200
    assert res["results"] == [{"rows_affected": 1}, {"rows_affected": 1}]

    _, q = _post(base + "/db/query", ["GET greeting", "GET missing"])
    assert q["results"][0] == {
        "columns": ["key", "value"], "types": ["text", "blob"],
        "values": [["greeting", "hello world"]],
    }
    assert q["results"][1]["values"] == []  # miss -> empty, not error

    _, qa = _post(base + "/db/query?associative", ["GET greeting"])
    assert qa["results"][0]["rows"] == [{"key": "greeting", "value": "hello world"}]


def test_key_endpoints_raw_path(svc):
    _, base = svc
    # raw put preserves arbitrary whitespace (StoreInDatabase path)
    _post(base + "/key", {"key": "cfg", "value": "a  b\tc"})
    assert _get(base + "/key?key=cfg")[1] == {"key": "cfg", "value": "a  b\tc"}
    _delete(base + "/key?key=cfg")
    assert _get(base + "/key?key=cfg")[1] == {"key": "cfg", "value": None}


def test_bad_statement_is_json_error(svc):
    _, base = svc
    _, res = _post(base + "/db/execute", ["UPSERT x 1"])
    assert "error" in res["results"][0]
    _, q = _post(base + "/db/query", ["FETCH x"])
    assert "error" in q["results"][0]


def test_connector_creates_and_runs_pipeline(svc, tmp_path):
    s, base = svc
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "a.json"), "w") as f:
        f.write(json.dumps({"id": 1, "word": "hi"}) + "\n")
    code, res = _post(
        base + "/connector",
        {
            "source": {"type": "file", "key": "api_pipe", "name": "in",
                       "config": {"path": in_dir}},
            "sink": {"type": "file", "key": "api_pipe", "name": "out",
                     "config": {"path": out_dir, "checkpoint": str(tmp_path / "ck")}},
            "available_now": True,
        },
    )
    assert code == 200
    assert res == {"key": "api_pipe", "pipeline": "in -> out"}
    # config persisted under 'config' (service.go:1870)
    assert s.kv.get("config") is not None
    for q in s.spark.streams.active:
        q.awaitTermination(60)
    rows = s.spark.read.json(out_dir).collect()
    assert [r.word for r in rows] == ["hi"]


def test_nodes_single_node_roster(svc, spark):
    # service.go:975-1022 analog: exactly one node (this driver),
    # keyed by the Spark application id, reachable + leader + voter —
    # the shape reference-built dashboards parse
    _, base = svc
    code, nodes = _get(base + "/nodes")
    assert code == 200
    assert list(nodes) == [spark.sparkContext.applicationId]
    rec = nodes[spark.sparkContext.applicationId]
    assert rec["reachable"] is True and rec["leader"] is True
    assert rec["voter"] is True
    assert rec["api_addr"] and rec["time"] >= 0


def test_debug_vars_counters_and_filter(svc):
    # service.go:1416-1436 analog: per-route expvar counters tick on
    # each hit; engine gauges present; ?key= filters to one variable
    _, base = svc
    _get(base + "/status")
    _get(base + "/status")
    _get(base + "/readyz")
    code, ev = _get(base + "/debug/vars")
    assert code == 200
    assert ev["num_status"] == 2
    assert ev["num_readyz"] == 1
    assert "active_streaming_queries" in ev and "kv_keys_live" in ev
    assert ev["uptime_seconds"] >= 0

    _, one = _get(base + "/debug/vars?key=num_status")
    assert one == {"num_status": 2}  # /debug/vars itself is not counted
    _, none = _get(base + "/debug/vars?key=no_such_var")
    assert none == {}


def test_boot_loads_records_idempotently(svc):
    # service.go:801-819 promises /boot but ships a 503 stub; our
    # analog loads {key,value} records through the LWW log, so a
    # replayed boot is a no-op and later live writes win
    _, base = svc
    recs = [{"key": "a", "value": "1"}, {"key": "b", "value": "2"}]
    code, res = _post(base + "/boot", recs)
    assert code == 200 and res == {"loaded": 2}
    assert _get(base + "/key?key=a")[1]["value"] == "1"

    _post(base + "/boot", recs)                     # replay: idempotent
    assert _get(base + "/key?key=a")[1]["value"] == "1"

    _post(base + "/key", {"key": "a", "value": "9"})  # live write wins
    assert _get(base + "/key?key=a")[1]["value"] == "9"
    _, ev = _get(base + "/debug/vars?key=num_boot")
    assert ev == {"num_boot": 2}
