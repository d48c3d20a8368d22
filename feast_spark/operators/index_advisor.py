"""Index-health advisor: turn the stats tables into actions.

Every persisted index exposes a stats view (``bm25_index_stats``,
``ivf_index_stats``, ``ivfpq_index_stats``, ``minhash_index_stats``)
and SCALE.md's curves name the re-flatten knobs — "compact when epochs
pile up", "rebuild with more cells/buckets when volume or skew
drifts".  Those curves assume a human watches the stats;
:func:`index_advise` closes that monitoring loop: one call per index
path, dispatching on the manifest's kind stamp, returning the health
numbers AND the concrete parameter to rebuild with when a documented
bound is crossed.

The bounds are serving-cost arguments, not magic numbers:

- ``epoch_bound`` (default 8): every query lists O(epochs x probed
  dirs) paths; compaction resets the factor to 1 at the cost of one
  rewrite.  Object-store LIST latency makes this the first knob to hit
  in practice.
- ``target_cell_size`` (default 1024): probed-cell population is the
  bytes a vector query actually reads; the SCALE.md curves stay flat
  exactly while mean |cell| is held near the build-time target (the
  semdedup auto-k discipline).  Mean drift past 2x the target means
  the corpus outgrew the quantizer -> rebuild with ``total /
  target_cell_size`` cells.
- ``skew_bound`` (default 4.0, max/mean): a skewed cell/bucket
  dominates every query that probes it.  For vector indexes skew
  means the frozen quantizer no longer matches the distribution ->
  retrain (rebuild).  For BM25, term->bucket skew dilutes with MORE
  buckets only when it comes from hash collisions of distinct terms;
  a single hot term cannot be split, so the advice names both.
- ``target_bucket_postings`` (default 1_000_000): a BM25 query reads
  every posting in its terms' buckets; mean bucket volume past the
  target -> rebuild with the next power of two of ``total / target``
  buckets.

Driver-side cost: one aggregate per stats table (collected as ONE
row) plus tiny manifest/centroid reads — safe to run from a cron.

Reference parity: Feast has no index layer; training-data-pipeline
extension (SURVEY §2.6), the monitoring sibling of the lifecycle verbs
(append/compact/vacuum).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from feast_spark.io import epochs as epochs_io
from feast_spark.io.fs import LocalFS, StoreFS

__all__ = ["index_advise", "index_maintain"]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def index_advise(
    spark: SparkSession,
    path: str,
    fs: StoreFS | None = None,
    epoch_bound: int = 8,
    skew_bound: float = 4.0,
    target_cell_size: int = 1024,
    target_bucket_postings: int = 1_000_000,
    hot_bucket_bound: int = 1000,
) -> dict:
    """Health report + rebuild/compact recommendations for the
    persisted index at ``path`` (any kind — dispatches on the manifest
    stamp).  Returns ``{"kind", "n_epochs", "health": {...},
    "advice": [{"action", "reason", ...}, ...]}``; an empty ``advice``
    list means the index is inside every documented bound."""
    fs = fs or LocalFS()
    manifest = epochs_io.read_manifest(
        path, fs, required_keys=("epochs",), kind="index"
    )
    kind = manifest.get("kind", "ivf")
    n_epochs = len(manifest["epochs"])
    advice: list[dict] = []
    if n_epochs > epoch_bound:
        advice.append(
            {
                "action": "compact",
                "reason": (
                    f"{n_epochs} committed epochs > {epoch_bound}: every "
                    "query lists O(epochs x probed dirs) paths"
                ),
            }
        )

    if kind in ("ivf", "ivfpq"):
        from feast_spark.operators.similarity import read_centroid_dir

        if kind == "ivf":
            from feast_spark.operators.similarity import ivf_index_stats

            stats = ivf_index_stats(spark, path, fs)
            n_col = "n_vectors"
        else:
            from feast_spark.operators.pq_index import ivfpq_index_stats

            stats = ivfpq_index_stats(spark, path, fs)
            n_col = "n_codes"
        row = stats.select(
            F.max("skew_ratio").alias("skew"),
            F.sum(n_col).alias("total"),
        ).collect()[0]
        # resolve through _ivf_centroids_dir, not manifest["centroids"]:
        # legacy stampless IVF manifests (tolerated above) lack the
        # pointer and use the flat centroids/ dir
        from feast_spark.operators.similarity import _ivf_centroids_dir

        n_cells = len(read_centroid_dir(_ivf_centroids_dir(path, manifest), fs))
        total = int(row["total"] or 0)
        mean_cell = total / n_cells if n_cells else 0.0
        skew = float(row["skew"] or 0.0)
        health = {
            "total_vectors": total,
            "n_cells": n_cells,
            "mean_cell_size": round(mean_cell, 1),
            "skew_ratio": round(skew, 2),
        }
        if mean_cell > 2 * target_cell_size:
            advice.append(
                {
                    "action": "rebuild",
                    "param": "n_centroids",
                    "recommended": max(8, total // target_cell_size),
                    "reason": (
                        f"mean cell population {mean_cell:.0f} > "
                        f"2 x target {target_cell_size}: probed-cell read "
                        "volume grew past the build-time budget"
                    ),
                }
            )
        if skew > skew_bound:
            advice.append(
                {
                    "action": "rebuild",
                    "param": "n_centroids",
                    "recommended": max(8, total // target_cell_size),
                    "reason": (
                        f"cell skew {skew:.1f} (max/mean) > {skew_bound}: "
                        "the frozen quantizer no longer matches the "
                        "appended distribution — retrain"
                    ),
                }
            )
    elif kind == "bm25":
        import posixpath

        from feast_spark.operators.bm25 import bm25_index_stats

        row = (
            bm25_index_stats(spark, path, fs)
            .select(
                F.max("skew_ratio").alias("skew"),
                F.max("total_postings").alias("total"),
                F.max("n_docs").alias("n_docs"),
                F.max_by("bucket", "n_postings").alias("hot_bucket"),
                F.max("n_postings").alias("hot_n"),
            )
            .collect()[0]
        )
        n_buckets = int(manifest["n_term_buckets"])
        total = int(row["total"] or 0)
        mean_bucket = total / n_buckets if n_buckets else 0.0
        skew = float(row["skew"] or 0.0)
        health = {
            "total_postings": total,
            "n_docs": int(row["n_docs"] or 0),
            "n_term_buckets": n_buckets,
            "mean_bucket_postings": round(mean_bucket, 1),
            "skew_ratio": round(skew, 2),
        }
        if mean_bucket > target_bucket_postings:
            advice.append(
                {
                    "action": "rebuild",
                    "param": "n_term_buckets",
                    "recommended": _next_pow2(
                        max(n_buckets + 1, total // target_bucket_postings)
                    ),
                    "reason": (
                        f"mean bucket holds {mean_bucket:.0f} postings > "
                        f"target {target_bucket_postings}: per-query bucket "
                        "reads outgrew the build-time budget"
                    ),
                }
            )
        if skew > skew_bound:
            # profile the hottest bucket (one partition-pruned read,
            # one-row result): hash-collision skew dilutes with more
            # buckets, but a single hot TERM cannot be split — the
            # mechanical fix is to stop storing its postings
            # (build_bm25_index stopwords=; doc lengths keep counting
            # it, so every other term's score is bit-identical)
            top = (
                spark.read.option(
                    "basePath", posixpath.join(path, "postings")
                )
                .parquet(
                    *epochs_io.epoch_paths(
                        path, "postings", manifest["epochs"]
                    )
                )
                .filter(F.col("bucket") == int(row["hot_bucket"]))
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col("term").asc())
                .first()
            )
            hot_n = int(row["hot_n"] or 0)
            if top is not None and hot_n and top["n"] >= 0.5 * hot_n:
                advice.append(
                    {
                        "action": "rebuild",
                        "param": "stopwords",
                        "recommended": sorted(
                            set(manifest.get("stopwords", []))
                            | {top["term"]}
                        ),
                        "reason": (
                            f"bucket skew {skew:.1f} (max/mean) > "
                            f"{skew_bound} and one term ({top['term']!r}, "
                            f"{top['n']} of the hot bucket's {hot_n} "
                            "postings) dominates: more buckets cannot "
                            "split a single term — rebuild with it on "
                            "the stopword list (non-stopword scores are "
                            "unchanged by contract)"
                        ),
                    }
                )
            else:
                advice.append(
                    {
                        "action": "rebuild",
                        "param": "n_term_buckets",
                        "recommended": _next_pow2(n_buckets * 2),
                        "reason": (
                            f"bucket skew {skew:.1f} (max/mean) > "
                            f"{skew_bound} with no dominant term: "
                            "hash-collision skew — more buckets dilute it"
                        ),
                    }
                )
    elif kind == "minhash":
        import posixpath

        from feast_spark.operators.minhash_index import minhash_index_stats

        row = (
            minhash_index_stats(spark, path, fs)
            .select(
                F.sum("n_docs").alias("n_docs"),
                F.max("max_bucket_size").alias("max_bucket"),
            )
            .collect()[0]
        )
        max_bucket = int(row["max_bucket"] or 0)
        health = {
            "n_docs": int(row["n_docs"] or 0),
            "max_bucket_size": max_bucket,
        }
        # the query-time hot-bucket cap (default 1000) silently drops
        # over-cap buckets from candidate generation — an index whose
        # hottest bucket approaches it needs a diagnosis: WHICH profile?
        if max_bucket > hot_bucket_bound:
            params = manifest.get("params", {})
            bands = int(params.get("bands", 0) or 0)
            # one more aggregate, one row: how many buckets are even
            # mid-size?  A single boilerplate cluster of near-identical
            # docs lands in at most `bands` buckets (one per band);
            # hot-ish buckets across MANY distinct signatures mean the
            # banding itself is too coarse (the (1/b)^(1/r) similarity
            # threshold sits too low) and weakly-similar docs collide —
            # which a rebuild with fewer, wider bands fixes.
            mid = max(2, hot_bucket_bound // 10)
            n_mid = (
                spark.read.option(
                    "basePath", posixpath.join(path, "bands")
                )
                .parquet(
                    *epochs_io.epoch_paths(path, "bands", manifest["epochs"])
                )
                .groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("sz"))
                .filter(F.col("sz") >= mid)
                .count()
            )
            health["n_buckets_over_tenth_cap"] = int(n_mid)
            if bands and n_mid > 4 * bands:
                advice.append(
                    {
                        "action": "rebuild",
                        "param": "bands",
                        "recommended": max(1, bands // 2),
                        "reason": (
                            f"hottest LSH bucket holds {max_bucket} docs > "
                            f"the query-time cap ({hot_bucket_bound}) and "
                            f"{n_mid} buckets exceed a tenth of it — far "
                            f"more than the {bands} a boilerplate cluster "
                            "could fill: the banding is too coarse; "
                            "rebuild with half the bands (wider rows per "
                            "band raises the (1/b)^(1/r) similarity "
                            "threshold)"
                        ),
                    }
                )
            else:
                advice.append(
                    {
                        "action": "investigate",
                        "reason": (
                            f"hottest LSH bucket holds {max_bucket} docs > "
                            f"the query-time cap ({hot_bucket_bound}) in a "
                            "handful of buckets: near-identical "
                            "boilerplate is accumulating; dedup it out or "
                            "raise max_bucket_size consciously"
                        ),
                    }
                )
    else:
        raise ValueError(f"no advisor for index kind {kind!r} at {path}")
    return {
        "kind": kind,
        "n_epochs": n_epochs,
        "health": health,
        "advice": advice,
    }


_COMPACT = {
    "ivf": "feast_spark.operators.similarity:ivf_index_compact",
    "ivfpq": "feast_spark.operators.pq_index:ivfpq_index_compact",
    "bm25": "feast_spark.operators.bm25:bm25_index_compact",
    "minhash": "feast_spark.operators.minhash_index:minhash_index_compact",
}
_VACUUM = {
    "ivf": "feast_spark.operators.similarity:ivf_index_vacuum",
    "ivfpq": "feast_spark.operators.pq_index:ivfpq_index_vacuum",
    "bm25": "feast_spark.operators.bm25:bm25_index_vacuum",
    "minhash": "feast_spark.operators.minhash_index:minhash_index_vacuum",
}


def _resolve(spec: str):
    import importlib

    mod, name = spec.split(":")
    return getattr(importlib.import_module(mod), name)


def index_maintain(
    spark: SparkSession,
    path: str,
    fs: StoreFS | None = None,
    vacuum: bool = False,
    **bounds,
) -> dict:
    """The cron verb: run :func:`index_advise`, APPLY its mechanical
    recommendations, report the rest.

    - ``compact`` advice is applied (kind-dispatched ``*_index_compact``
      — query results are byte-identical by the compaction contract,
      and superseded epochs stay on disk, so applying it unattended is
      always safe for concurrent readers).
    - ``vacuum=True`` additionally reclaims manifest-unreferenced
      directories.  OFF by default on purpose: the vacuum contract
      (every ``*_index_vacuum`` docstring) requires readers of the
      PREVIOUS manifest to have drained, and an unattended cron cannot
      know that — turn it on only when your reader grace window is
      shorter than the maintenance interval.
    - ``rebuild``/``investigate`` advice is returned UNAPPLIED: a
      rebuild needs the source corpus and a retrain decision the store
      cannot make, and boilerplate accumulation needs a human.

    ``bounds`` pass through to :func:`index_advise`.  Returns a FRESH
    post-maintenance report (health/n_epochs/advice reflect the index
    as left behind, so ``advice`` is exactly what still needs a human)
    plus ``applied`` (actions taken) and ``vacuumed`` (removed dirs
    per sub-table); idempotent — a second run applies nothing."""
    fs = fs or LocalFS()
    report = index_advise(spark, path, fs, **bounds)
    applied: list[str] = []
    if any(a["action"] == "compact" for a in report["advice"]):
        _resolve(_COMPACT[report["kind"]])(spark, path, fs)
        applied.append("compact")
    vacuumed: dict = {}
    if vacuum:
        fn = _resolve(_VACUUM[report["kind"]])
        # ivf/bm25/minhash vacuums are driver-only (path, fs); the
        # ivfpq vacuum also sweeps model generations and takes spark
        vacuumed = (
            fn(spark, path, fs)
            if report["kind"] == "ivfpq"
            else fn(path, fs)
        )
        if any(v for v in vacuumed.values()):
            applied.append("vacuum")
    if applied:  # re-advise so the report describes the index we left
        report = index_advise(spark, path, fs, **bounds)
    return {**report, "applied": applied, "vacuumed": vacuumed}
