"""Runnable end-to-end demo: WARC crawl -> extracted text -> curated
corpus -> packed sequences -> WebDataset shards.

    python tools/demo_corpus_e2e.py [workdir]

Builds a synthetic 60-page crawl (with deliberate boilerplate, exact
dupes, and a low-quality page), then runs the real operator chain and
prints the per-stage survivor counts plus the emitted shard files —
the ingestion-to-training-sink path a reference user gains on
switch-over (the reference stops at feature retrieval).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="corpus_demo_"
    )
    os.makedirs(workdir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("corpus-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feast_spark.pipelines.corpus import CorpusConfig, build_corpus
    from feast_spark.sources.warc import read_warc, write_warc
    from feast_spark.sources.webdataset import write_webdataset

    # -- 1. synthesize a crawl ------------------------------------------
    nav = "home | products | about us | contact | careers | blog"
    footer = "copyright 2021 example industries - all rights reserved"
    body = (
        "the quick brown fox jumps over the lazy dog while the patient "
        "owl watches from a branch and the river keeps moving south"
    )
    pages = []
    for i in range(60):
        variant = i % 50  # 10 exact duplicates
        text = (
            f"<html><body><div>{nav}</div>"
            f"<p>{body} story number {variant} continues here with more "
            f"words about the valley and the mountain road.</p>"
            f"<div>{footer}</div></body></html>"
        )
        if i == 59:  # one junk page
            text = "<html><body>!!! ??? ... ###</body></html>"
        pages.append(
            {
                "record_id": f"<urn:uuid:{i}>",
                "target_uri": f"https://example.com/page/{i}",
                "warc_date": "2021-05-01T00:00:00Z",
                "content_type": "text/html; charset=utf-8",
                "http_status": 200,
                "text": text,
            }
        )
    warc_dir = os.path.join(workdir, "crawl")
    os.makedirs(warc_dir, exist_ok=True)
    for k in range(3):  # three shard files, CommonCrawl-style
        with open(os.path.join(warc_dir, f"part-{k}.warc.gz"), "wb") as f:
            f.write(write_warc(pages[k::3]))

    # -- 2. ingest + curate ---------------------------------------------
    docs = (
        read_warc(spark, warc_dir)
        .where(F.col("http_status") == 200)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("text"),
            F.lit("web").alias("source"),
        )
    )
    corpus, report = build_corpus(
        docs,
        config=CorpusConfig(
            html_input=True,
            boilerplate_min_docs=3,
            min_quality=0.3,
            min_tokens=10,
            near_dedup=False,
            pack_max_tokens=64,
            n_shards=4,
        ),
        report=True,
    )
    corpus = corpus.cache()
    print("stage survivors:")
    for stage, n in report.items():
        print(f"  {stage:<14} {n}")

    # -- 3. export train split as WebDataset shards ---------------------
    out_dir = os.path.join(workdir, "wds")
    paths = write_webdataset(
        corpus.where(F.col("split") == "train").withColumn(
            "meta",
            F.to_json(F.struct("split", "shard", "seq_id", "seq_pos")),
        ),
        out_dir,
        {"text": ".txt", "meta": ".json"},
        n_shards=2,
    )
    print("webdataset shards:")
    for p in paths:
        print(f"  {p}  ({os.path.getsize(p)} bytes)")
    sample = corpus.orderBy("doc_id").limit(1).collect()[0]
    print("sample doc:", repr(sample["text"][:90]))
    print(f"workdir: {workdir}")
    spark.stop()


if __name__ == "__main__":
    main()
