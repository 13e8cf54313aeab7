"""CLI entry: the reference's daemon/CLI surface (cmd/main.go analog).

Usage:
    python -m wire_spark serve [--port 4001] [--sf-dir DIR]
        start the rqlite-style HTTP service (wire_spark/api.py)
    python -m wire_spark execute "SET k v" ["DELETE k" ...]
        run write statements against a session-local store
    python -m wire_spark query "GET k" [--associative]
        run read statements, print QueryRows JSON
    python -m wire_spark bench
        run the headline benchmark (same as bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="wire_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_serve = sub.add_parser("serve", help="start the HTTP service")
    p_serve.add_argument("--port", type=int, default=4001)

    p_exec = sub.add_parser("execute", help="run write statements")
    p_exec.add_argument("statements", nargs="+")

    p_query = sub.add_parser("query", help="run read statements")
    p_query.add_argument("statements", nargs="+")
    p_query.add_argument("--associative", action="store_true")

    sub.add_parser("bench", help="run the headline benchmark")

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import bench  # repo-root harness

        bench.main()
        return 0

    from wire_spark.engine import get_spark

    spark = get_spark("wire-spark-cli")

    if args.cmd == "serve":
        from wire_spark.api import WireService

        svc = WireService(spark)
        port = svc.serve(args.port)
        print(f"wire-spark service listening on http://127.0.0.1:{port}", flush=True)
        try:
            import threading

            threading.Event().wait()  # serve until interrupted
        except KeyboardInterrupt:
            svc.shutdown()
        return 0

    from wire_spark.kv import KVStore

    kv = KVStore(spark)
    if args.cmd == "execute":
        results = [vars(kv.execute(s)) for s in args.statements]
        print(json.dumps({"results": results}))
        return 0
    if args.cmd == "query":
        out = []
        for s in args.statements:
            try:
                out.append(kv.query(s).to_json_dict(associative=args.associative))
            except Exception as e:
                out.append({"error": str(e)})
        print(json.dumps({"results": out}))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
