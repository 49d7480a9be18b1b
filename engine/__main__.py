"""CLI entry points: ``python -m engine <command>``.

The CLI (not the library) owns the Ray session — ``__ray_entry__`` and
every ``engine.*`` module stay init-free per the driver contract.

Commands:
  flagship     run (or resume) the full ingest→PIP→kNN→tile pipeline
  incremental  apply a changefile and recompute only touched partitions
  corpus       run prepare_corpus over a documents parquet dir
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if cpus:
            kwargs["num_cpus"] = cpus
        ray.init(**kwargs)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m engine")
    ap.add_argument("--cpus", type=int, default=0,
                    help="ray num_cpus (default: let Ray decide)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="ingest→PIP→kNN→tile, resumable")
    f.add_argument("images_dir")
    f.add_argument("out_dir")
    f.add_argument("--partitions", type=int, default=4)
    f.add_argument("--zoom", type=int, default=8)
    f.add_argument("--no-resume", action="store_true")
    f.add_argument("--run-id", default="cli")

    i = sub.add_parser("incremental",
                       help="changefile → recompute touched partitions")
    i.add_argument("images_dir")
    i.add_argument("out_dir")
    i.add_argument("changes_parquet",
                   help="parquet with the image schema + __op (U/D)")
    i.add_argument("--run-id", default="incr-cli")

    c = sub.add_parser("corpus", help="prepare_corpus over documents")
    c.add_argument("docs_parquet")
    c.add_argument("out_dir")

    args = ap.parse_args(argv)
    _init_ray(args.cpus or None)
    import ray

    try:
        if args.cmd == "flagship":
            from engine.pipeline.flagship import run_flagship

            res = run_flagship(
                args.images_dir, args.out_dir,
                target_partitions=args.partitions, zoom=args.zoom,
                resume=not args.no_resume, run_id=args.run_id)
        elif args.cmd == "incremental":
            import pyarrow.parquet as pq

            from engine.pipeline.incremental import run_incremental_update

            res = run_incremental_update(
                args.images_dir, args.out_dir,
                pq.read_table(args.changes_parquet), run_id=args.run_id)
        else:
            import ray.data

            from engine.pipeline.corpus import prepare_corpus

            ds = ray.data.read_parquet(
                args.docs_parquet, columns=["doc_id", "text"])
            out = prepare_corpus(ds).materialize()
            out.write_parquet(args.out_dir)
            res = {"rows": out.count(), "out_dir": args.out_dir}
        print(json.dumps(res, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
