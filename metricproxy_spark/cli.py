"""Command-line front door: run any registered query from a shell.

    python -m metricproxy_spark list
    python -m metricproxy_spark run <query> [--sf-dir DIR] [--limit N]
                                   [--out PATH] [--explain]

`run` prints the result as a table (or writes parquet with --out);
`--explain` prints the formatted physical plan instead of executing —
the same plan-reading loop the repo's scale reviews use. The Spark
session is the package factory (AQE on, sized shuffle partitions).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="metricproxy_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run one registered query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=None)
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--out", default=None, help="write parquet here")
    runp.add_argument("--explain", action="store_true")
    runp.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)

    from metricproxy_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    if args.cmd == "list":
        for name in QUERIES:
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    from metricproxy_spark.io import DEFAULT_SF_DIR
    from metricproxy_spark.session import get_spark

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark(master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
