"""Command-line entry point — run any registry query standalone.

    python -m cdc_poc_spark list [--filter SUBSTR]
    python -m cdc_poc_spark run QUERY [--sf-dir DIR] [--limit N] [--json]
    python -m cdc_poc_spark explain QUERY [--sf-dir DIR]
    python -m cdc_poc_spark verify QUERY [--sf-dir DIR]

``run`` executes a query and prints rows; ``explain`` prints the formatted
physical plan (the scale-posture audit view); ``verify`` runs the query AND
its DuckDB oracle side-by-side through the differential harness.
"""

from __future__ import annotations

import argparse
import json
import sys

from .sources.testdata import DEFAULT_SF_DIR, sf_dir_from_env


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m cdc_poc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registry queries")
    lp.add_argument("--filter", default="", help="substring filter")

    for name in ("run", "explain", "verify"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=sf_dir_from_env(DEFAULT_SF_DIR))
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
            sp.add_argument("--json", action="store_true")

    args = p.parse_args(argv)

    from .plans.oracles import oracle_sql
    from .plans.registry import queries

    reg = queries()
    if args.cmd == "list":
        orc = oracle_sql()
        for name in reg:
            if args.filter in name:
                doc = " ".join((reg[name].__doc__ or "").split())
                kind = "sql-oracle" if name in orc else "rows-only "
                print(f"{name:34s} [{kind}] {doc[:90]}")
        return 0

    if args.query not in reg:
        near = [n for n in reg if args.query in n]
        print(f"unknown query {args.query!r}" + (f"; did you mean: {near}" if near else ""),
              file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"cdc-poc-spark-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "explain":
            reg[args.query](spark, args.sf_dir).explain("formatted")
        elif args.cmd == "run":
            df = reg[args.query](spark, args.sf_dir)
            if args.json:
                for row in df.limit(args.limit).collect():
                    print(json.dumps(row.asDict(), default=str))
            else:
                df.show(args.limit, truncate=False)
        else:  # verify
            from .plans import diffcheck

            con = diffcheck.duckdb_connection(args.sf_dir)
            r = diffcheck.compare_one(spark, con, args.query, args.sf_dir)
            print(("OK  " if r.ok else "FAIL"), r.name, r.spark_rows, r.oracle_rows,
                  r.detail, r.mismatches[:3])
            return 0 if r.ok else 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
