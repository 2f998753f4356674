"""Command-line runner: ``python -m go_zoom_kinesis_spark <cmd>``.

The switching user's console entry point — run any registered query
from a shell, inspect the registry, or print a query's physical plan,
without writing a driver program.

  list [--grep PAT]        registered query names (one per line)
  run NAME [--sf DIR] [--limit N] [--json]
                           execute a query; table (default) or JSONL
  explain NAME [--sf DIR]  the formatted physical plan (the artifact
                           PLANS.md is generated from)
  oracle NAME              print the query's DuckDB oracle SQL

Exit code 2 for unknown names (with close-match suggestions).
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def _registry():
    from . import registry

    return registry.all_queries(), registry.all_oracle_sql()


def _resolve(name: str, queries: dict):
    if name in queries:
        return queries[name]
    close = difflib.get_close_matches(name, queries, n=5, cutoff=0.4)
    hint = f"; close matches: {', '.join(close)}" if close else ""
    print(f"unknown query {name!r}{hint}", file=sys.stderr)
    raise SystemExit(2)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="python -m go_zoom_kinesis_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="registered query names")
    p_list.add_argument("--grep", default=None)

    p_run = sub.add_parser("run", help="execute a registered query")
    p_run.add_argument("name")
    p_run.add_argument("--sf", default=DEFAULT_SF)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--json", action="store_true")

    p_exp = sub.add_parser("explain", help="formatted physical plan")
    p_exp.add_argument("name")
    p_exp.add_argument("--sf", default=DEFAULT_SF)

    p_or = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    p_or.add_argument("name")

    args = ap.parse_args(argv)
    queries, oracles = _registry()

    if args.cmd == "list":
        for name in sorted(queries):
            if args.grep is None or args.grep in name:
                print(name)
        return

    if args.cmd == "oracle":
        _resolve(args.name, queries)
        sql = oracles.get(args.name)
        if sql is None:
            print(f"{args.name} is declared rows-only (no oracle)", file=sys.stderr)
            raise SystemExit(1)
        print(sql.strip())
        return

    from .session import get_spark

    fn = _resolve(args.name, queries)
    spark = get_spark(app_name=f"gzk-cli-{args.cmd}")
    df = fn(spark, args.sf)

    if args.cmd == "explain":
        df.explain("formatted")
        return

    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=40)


if __name__ == "__main__":
    main()
