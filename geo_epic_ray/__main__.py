"""Engine CLI — the single-dispatcher replacement for the reference's
``geo_epic <module> <func>`` subprocess table (geoEpic/dispatcher.py:6-48).

    python -m geo_epic_ray flagship --n-docs 100000 --out /tmp/out
    python -m geo_epic_ray query geo_enrich_full --sf-dir /root/testdata/sf0.01
    python -m geo_epic_ray list-queries

Owns its Ray session (guarded init), unlike the library modules.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="geo_epic_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="run the flagship spatial pipeline")
    f.add_argument("--n-docs", type=int, default=100_000)
    f.add_argument("--out", default="/tmp/geo_epic_ray_out")
    f.add_argument("--skew", action="store_true")
    f.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="run one registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--num-cpus", type=int, default=None)

    sub.add_parser("list-queries", help="list registered queries")

    g = sub.add_parser(
        "ingest",
        help="validate + normalize an exported side table (the S8/S10 "
        "substitution: ogr2ogr/gdal_translate parquet exports in, "
        "workspace side-table layout out)",
    )
    g.add_argument("kind", choices=["soil", "weather-grid", "raster"])
    g.add_argument("path", help="exported parquet file")
    g.add_argument("--out", required=True, help="output directory")
    g.add_argument("--width", type=int, default=1000, help="raster width (raster kind)")
    g.add_argument("--height", type=int, default=1500, help="raster height (raster kind)")
    g.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "list-queries":
        from geo_epic_ray.pipelines.queries import ORACLES, QUERIES

        for name in sorted(QUERIES):
            print(f"{name}  [{'sql-oracle' if name in ORACLES else 'rows-only'}]")
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        if args.cmd == "flagship":
            from geo_epic_ray.pipelines.flagship import run_flagship, synthetic_documents

            report = run_flagship(
                synthetic_documents(args.n_docs),
                args.out,
                input_fingerprint=f"cli-n{args.n_docs}",
                skew=args.skew,
            )
            print(
                json.dumps(
                    {
                        "partitions": len(report),
                        "rows": int(report.rows.sum()),
                        "skipped": int(report.skipped.sum()),
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "query":
            from geo_epic_ray.pipelines.queries import QUERIES

            res = QUERIES[args.name](args.sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(20).to_string())
            print(f"... {len(df)} rows")
        elif args.cmd == "ingest":
            from geo_epic_ray.sources.ingest import INGESTERS

            fn = INGESTERS[args.kind]
            if args.kind == "raster":
                n = fn(args.path, args.out, args.width, args.height)
            else:
                n = fn(args.path, args.out)
            print(json.dumps({"kind": args.kind, "rows": int(n), "out": args.out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
