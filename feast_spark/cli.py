"""CLI — the reference's `feast` command surface (cli.py +
repo_operations.py): apply a repo of Python definitions, materialize,
list registry objects.

    python -m feast_spark apply repo.py --registry registry.json
    python -m feast_spark materialize 2024-01-01 2024-02-01
    python -m feast_spark materialize-incremental 2024-02-01
    python -m feast_spark entities / feature-views

A "repo file" is a Python file whose module-level Entity / FeatureView /
FeatureService objects are applied (parse_repo,
repo_operations.py:94-111).
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from datetime import datetime

from feast_spark.entity import Entity
from feast_spark.feature_view import (
    FeatureService,
    FeatureView,
    OnDemandFeatureView,
)


def parse_repo(path: str) -> list:
    """Exec a repo definition file and collect declared objects."""
    spec = importlib.util.spec_from_file_location("__feast_repo__", path)
    if spec is None or spec.loader is None:
        raise ValueError(f"cannot load repo file {path!r}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    objs = []
    for v in vars(module).values():
        if isinstance(
            v, (Entity, FeatureView, FeatureService, OnDemandFeatureView)
        ):
            objs.append(v)
    return objs


def _store(args):
    from pyspark.sql import SparkSession

    from feast_spark.feature_store import FeatureStore, RepoConfig

    spark = (
        SparkSession.builder.master(args.master)
        .appName("feast_spark-cli")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return FeatureStore(
        spark,
        RepoConfig(
            project=args.project,
            registry_path=args.registry,
            online_store_path=args.online_path,
        ),
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="feast_spark")
    p.add_argument("--registry", default="registry.json")
    p.add_argument("--online-path", default="online_store")
    p.add_argument("--project", default="default")
    p.add_argument("--master", default="local[*]")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("apply", help="apply a repo definition file")
    sp.add_argument("repo_file")

    sp = sub.add_parser("materialize")
    sp.add_argument("start")
    sp.add_argument("end")
    sp.add_argument("--views", nargs="*", default=None)

    sp = sub.add_parser("materialize-incremental")
    sp.add_argument("end")
    sp.add_argument("--views", nargs="*", default=None)

    sp = sub.add_parser(
        "expire-online",
        help="TTL sweep: reclaim online rows older than each view's ttl",
    )
    sp.add_argument("--now", default=None,
                    help="ISO timestamp to expire against (default: now)")

    sub.add_parser("entities", help="list registry entities")
    sub.add_parser("feature-views", help="list registry feature views")
    sub.add_parser("registry-dump", help="print the raw registry JSON")
    sp = sub.add_parser(
        "registry-export",
        help="write the registry as reference-compatible "
        "feast.core.Registry protobuf bytes",
    )
    sp.add_argument("out_path")
    sub.add_parser(
        "teardown", help="delete the online store and registry (cli.py teardown)"
    )

    args = p.parse_args(argv)

    if args.cmd == "apply":
        store = _store(args)
        objs = parse_repo(args.repo_file)
        store.apply(objs)
        for o in objs:
            kind = type(o).__name__
            print(f"applied {kind} {o.name}")
        return 0
    if args.cmd == "materialize":
        store = _store(args)
        start = datetime.fromisoformat(args.start)
        end = datetime.fromisoformat(args.end)
        store.materialize(start, end, args.views)
        print(f"materialized [{start}, {end}) into online store")
        return 0
    if args.cmd == "materialize-incremental":
        store = _store(args)
        end = datetime.fromisoformat(args.end)
        store.materialize_incremental(end, args.views)
        print(f"materialized incrementally up to {end}")
        return 0
    if args.cmd == "expire-online":
        store = _store(args)
        now = datetime.fromisoformat(args.now) if args.now else None
        swept = store.expire_online_features(now=now)
        for view, n in sorted(swept.items()):
            print(f"{view}\texpired={n}")
        return 0
    if args.cmd == "entities":
        store = _store(args)
        for e in store.registry.list_entities():
            print(f"{e.name}\t{e.value_type.name}\t{e.join_key}")
        return 0
    if args.cmd == "feature-views":
        store = _store(args)
        for v in store.registry.list_feature_views():
            feats = ",".join(v.feature_names)
            print(f"{v.name}\tentities={','.join(v.entities)}\tfeatures={feats}")
        return 0
    if args.cmd == "registry-export":
        store = _store(args)
        payload = store.export_registry_proto(args.out_path)
        print(f"wrote {len(payload)} bytes to {args.out_path}")
        return 0
    if args.cmd == "registry-dump":
        import os

        if os.path.exists(args.registry):
            with open(args.registry) as f:
                print(f.read())
            return 0
        print(f"no registry at {args.registry}", file=sys.stderr)
        return 1
    if args.cmd == "teardown":
        import os
        import shutil

        if os.path.isdir(args.online_path):
            shutil.rmtree(args.online_path)
            print(f"removed online store {args.online_path}")
        if os.path.exists(args.registry):
            os.unlink(args.registry)
            print(f"removed registry {args.registry}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
