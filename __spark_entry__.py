"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implemented operators are inventoried in SURVEY.md §2; each entry here
cites the operator ids it covers.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.asof_join import AsOfJoinSpec, as_of_join
from feast_spark.operators.dedup import latest_per_key, time_range_filter
from feast_spark.sources.testdata import load_table

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _entity_and_feature_frames(spark: SparkSession, sf_dir: str):
    """purchases = the entity frame (the 'query'); views = the feature
    stream, keyed by user_id."""
    events = load_table(spark, sf_dir, "events")
    entity = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return entity, views, clicks


# ---------------------------------------------------------------------------
# queries (J1/J2/A1/A2/P1/P2/P3 ...)
# ---------------------------------------------------------------------------

def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — single-view point-in-time join with ttl (SURVEY §2.1)."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
            )
        ],
    ).select("event_id", "user_id", "ts", F.col("value").alias("view_value"))


def _per_call_snapshot_root(prefix: str, leaf: str) -> str:
    """A per-CALL unique scratch dir for gate queries that commit
    snapshot stores.  A DataFrame returned by an earlier call in this
    process may still be lazily evaluated after a later call, so a
    shared dir wiped on entry would yank its parquet files mid-read.
    Each call takes the next numbered subdir under a per-process base
    and reclaims every sibling except the newest prior one (kept
    alive for exactly that outstanding-DataFrame case), so repeated
    gate/test sweeps never hold more than two snapshot sets.  Holding
    DataFrames from >=2 calls back is unsupported — re-call the
    query instead."""
    import os
    import shutil
    import tempfile

    base = os.path.join(tempfile.gettempdir(), f"{prefix}_{os.getpid()}")
    os.makedirs(base, exist_ok=True)
    existing = sorted(
        d for d in os.listdir(base)
        if d.startswith("call_") and d[5:].isdigit()
    )
    seq = (int(existing[-1][5:]) + 1) if existing else 1
    for d in existing[:-1]:
        shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return os.path.join(base, f"call_{seq:08d}", leaf)


def q_pit_join_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + S7/S1 — the versioned-dataset read path under the hash
    gate (r15).  Two legs over a twice-committed training dataset:

    * commit 1: the full PIT join output, committed through
      ``RetrievalJob.to_dataset`` (datasets.py manifest-flip store —
      the rows a June model trained on);
    * commit 2: a RE-RUN with a perturbed entity frame (user_id % 5
      != 2) committed under the same root — the pipeline re-run that
      must not clobber what the first model read.

    Leg ``head_v2`` reads the manifest-resolved HEAD through a plain
    ``FileSource(path=root)`` (one committed snapshot, never a
    recursive v_* scan); leg ``asof_v1`` reads ``FileSource(path=root,
    as_of=1)`` — ``ManifestedParquetTable.path_as_of`` + the
    FileSource manifest resolution (data_source.py) replaying the
    archived first training set.  The oracle recomputes both PIT
    joins from the raw events.  Reference anchor: the golden
    retrieval snapshots of sdk/python/tests/test_historical_retrieval
    .py:270-345, with the commit discipline this repo adds."""
    from feast_spark.data_source import FileSource
    from feast_spark.feature_store import RetrievalJob

    v1 = q_pit_join(spark, sf_dir)
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    v2 = as_of_join(
        entity.filter(F.col("user_id") % 5 != 2),
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
            )
        ],
    ).select(
        "event_id", "user_id", "ts", F.col("value").alias("view_value")
    )
    root = _per_call_snapshot_root("fs_gate_ds", "trainset")
    RetrievalJob(v1).to_dataset(root)
    RetrievalJob(v2).to_dataset(root)
    head = FileSource(path=root).load(spark)
    pinned = FileSource(path=root, as_of=1).load(spark)
    cols = ["event_id", "user_id", "ts", "view_value"]
    return head.select(F.lit("head_v2").alias("leg"), *cols).unionAll(
        pinned.select(F.lit("asof_v1").alias("leg"), *cols)
    )


def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 + audit layer — the r15 dataset diff CLASSIFICATION under
    the hash gate (r16): two derived commits of the documents table
    under one manifest root —

    * commit 1 (version A): ``doc_id % 7 != 3``;
    * commit 2 (version B): ``doc_id % 11 != 4`` with the text
      UPPERCASED for ``doc_id % 13 == 0`` (a content perturbation on
      keys present in both);

    then ``datasets.diff_dataset_frame(a=1, b=2, key_cols=[doc_id])``
    — one row per differing key with status added/removed/changed,
    computed from md5 row fingerprints folded per key by the
    commutative (sum, xor, count) aggregate.  The oracle recomputes
    both versions from the raw table and classifies with a FULL OUTER
    JOIN + IS DISTINCT FROM (EXCEPT-ALL discipline; a doc whose text
    has no lowercase letters — or is NULL — is unchanged by the
    perturbation and must classify as same on both sides)."""
    from feast_spark.datasets import commit_dataset, diff_dataset_frame

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ver_a = docs.filter(F.col("doc_id") % 7 != 3)
    ver_b = docs.filter(F.col("doc_id") % 11 != 4).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.upper(F.col("text"))
        ).otherwise(F.col("text")),
    )
    root = _per_call_snapshot_root("fs_gate_diff", "docdiff")
    commit_dataset(ver_a, root)
    commit_dataset(ver_b, root)
    return diff_dataset_frame(spark, root, 1, 2, key_cols=["doc_id"])


def q_pit_join_no_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — as-of join, unbounded lower bound (ttl=None)."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
            )
        ],
    ).select("event_id", "user_id", "ts", F.col("value").alias("view_value"))


def q_pit_join_multiview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — multi-view composition with full_feature_names prefixes (P2)."""
    entity, views, clicks = _entity_and_feature_frames(spark, sf_dir)
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
                prefix="views",
            ),
            AsOfJoinSpec(
                feature_df=clicks,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=7),
                prefix="clicks",
            ),
        ],
    ).select("event_id", "user_id", "ts", "views__value", "clicks__value")


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — latest-per-key dedup (materialization pull-latest)."""
    events = load_table(spark, sf_dir, "events")
    return latest_per_key(
        events.select("user_id", "event_type", "ts", "value"),
        ["user_id", "event_type"],
        "ts",
    )


def q_latest_per_key_created(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 — created_timestamp tie-break: union the events with a
    doctored copy at the SAME event_ts but later created_ts; the copy
    must win."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    v1 = events.withColumn("created", F.lit(1).cast("long"))
    v2 = events.withColumn("value", F.col("value") * 2).withColumn(
        "created", F.lit(2).cast("long")
    )
    both = v1.unionByName(v2)
    return latest_per_key(both, ["user_id"], "ts", created_col="created")


def q_time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — half-open time-range filter [start, end)."""
    from datetime import datetime

    events = load_table(spark, sf_dir, "events")
    return time_range_filter(
        events.select("event_id", "ts", "user_id", "value"),
        "ts",
        start=datetime(2024, 1, 10),
        end=datetime(2024, 1, 20),
    )


def q_field_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2 — field_mapping rename + feature selection."""
    from feast_spark.data_source import FileSource

    src = FileSource(
        path=f"{sf_dir}/customer.parquet",
        field_mapping={"c_custkey": "customer_id", "c_acctbal": "balance"},
    )
    df = src.load(spark)
    return df.select("customer_id", "balance", "c_mktsegment")


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep min doc_id per normalized-text fingerprint."""
    from feast_spark.operators.docdedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").select("doc_id", "lang", "n_chars")


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: fingerprint, multiplicity, surviving id."""
    from feast_spark.operators.docdedup import exact_dup_groups

    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs, "doc_id", "text")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (inverted shingle index)."""
    from feast_spark.operators.docdedup import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified, in portable
    mode: md5-based 32-bit base hash + (a*x+b)%p signatures + raw
    band-string buckets — the ENTIRE scale-path pipeline (shingle ->
    signature -> banding -> capped-bucket candidate join -> exact
    Jaccard verify) value-checked against the oracle, which reproduces
    the same signatures in SQL.  ``q_minhash_fast`` (xxhash64
    signatures, Spark-only) is the throughput path bench.py times."""
    from feast_spark.operators.docdedup import minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, portable=True
    )


def q_minhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 fast path of minhash_dedup_pairs (bench-only: the
    signatures are Spark-specific, so correctness is gated via the
    portable twin ``minhash_lsh_dedup`` + pytest recall pins)."""
    from feast_spark.operators.docdedup import minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3, with the
    md5-based 60-bit hash — bit-for-bit reproducible cross-engine, so
    the full fingerprint pipeline (shingle -> hash -> majority bits ->
    capped quadrant blocking -> Hamming) is value-checked against the
    oracle.  xxhash64 stays the library's fast default."""
    from feast_spark.operators.docdedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    out = simhash_pairs(docs, "doc_id", "text", max_hamming=3, portable=True)
    return out.withColumn("hamming", F.col("hamming").cast("long"))


def q_resample_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid resampling + gap fill (operators/resample.py): hourly
    per-user buckets over the events table — sum/count aggregates plus
    a forward-filled latest value on a DENSE per-key grid (gap buckets
    materialize and carry state), the regularization step upstream of
    lag/rolling features.  Events are aggregated in ONE shuffle at the
    output grain; the grid explode and ffill window run on output-
    sized data only."""
    from feast_spark.operators.resample import resample

    events = load_table(spark, sf_dir, "events")
    out = resample(
        events,
        ["user_id"],
        "ts",
        3600,
        {
            "total": ("value", "sum"),
            "n": ("value", "count"),
            "last_v": ("value", "last"),
        },
        fill="ffill",
    )
    return out.select(
        "user_id",
        "bucket_ts",
        F.round("total", 6).alias("total"),
        "n",
        F.round("last_v", 6).alias("last_v"),
    )


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id<5."""
    from feast_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, round_digits=None
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path; rows-only — recall pytest-asserted)."""
    from feast_spark.operators.similarity import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem: the general
    hash-agg path (partial combine, O(groups) shuffle) feeding derived
    feature tables at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_order_enrich_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim enrichment: orders joined to customer + nation with
    explicit broadcast of the dims — the star-schema join that must
    never shuffle the fact side."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            "c_name",
            F.col("n_name").alias("nation_name"),
        )
    )


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact (lineitem) against three
    broadcast dims (supplier -> nation -> region), revenue per nation.
    The fact side never shuffles before the final small agg."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension rollup over part: per-type price stats (min/max/avg)."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.avg("p_retailprice").alias("avg_price"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization of the events table (1-hour gap):
    one row per (user, session) with start/end/count.  Streaming twin:
    feast_spark.streaming.stateful.sessionize_stream."""
    from datetime import timedelta

    from feast_spark.operators.sessionize import sessionize_batch

    events = load_table(spark, sf_dir, "events")
    return sessionize_batch(
        events.select("user_id", "ts"), ["user_id"], "ts", timedelta(hours=1)
    )


def q_window_agg_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly rollup of events per user: the derived-feature
    path (raw events -> PIT-joinable stats view, emit ts = window end)."""
    from datetime import timedelta

    from feast_spark.operators.window_agg import tumbling_window_agg

    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        events.select("user_id", "ts", "value"),
        ["user_id"],
        "ts",
        timedelta(hours=1),
        {
            "n_events": ("count", "value"),
            "sum_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
        },
    )


def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day per-event aggregates (RANGE frame, one shuffle)."""
    from datetime import timedelta

    from feast_spark.operators.window_agg import rolling_window_agg

    events = load_table(spark, sf_dir, "events")
    return rolling_window_agg(
        events.select("event_id", "user_id", "ts", "value"),
        ["user_id"],
        "ts",
        timedelta(days=7),
        {"sum_7d": ("sum", "value"), "n_7d": ("count", "value")},
    )


def q_rollup_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end derived-feature pipeline: hourly rollup of raw view
    events becomes a feature view (event_ts = window end), PIT-joined
    onto purchase entities with a 2-day ttl — the full
    raw-events -> features -> training-frame path in one plan."""
    from datetime import timedelta

    from feast_spark.operators.window_agg import tumbling_window_agg

    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    roll = tumbling_window_agg(
        views,
        ["user_id"],
        "ts",
        timedelta(hours=1),
        {"n_events": ("count", "value"), "sum_value": ("sum", "value")},
    ).select("user_id", "event_ts", "n_events", "sum_value")
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=roll,
                join_keys=["user_id"],
                timestamp_col="event_ts",
                features=["n_events", "sum_value"],
                ttl=timedelta(days=2),
            )
        ],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("n_events").alias("n_views_1h"),
        F.col("sum_value").alias("sum_views_1h"),
    )


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (cos >= 0.35) — the ground
    truth the LSH near-dup path is calibrated against."""
    from feast_spark.operators.similarity import exact_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return exact_cosine_pairs(emb, "vec_id", "embedding", threshold=0.35)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram decontamination (operators/contamination.py —
    the GPT-3 appendix-C / PaLM benchmark-leakage guard): per-eval-doc
    distinct 5-gram overlap against the training corpus (train =
    doc_id % 3 != 0, eval = doc_id % 3 == 0 — the planted near-dups
    straddle the split, so SOME contamination is certain).  Portable
    string shingles so the DuckDB oracle re-derives the identical
    n-gram sets.  The eval shingle frame broadcasts: the train corpus
    never shuffles (tests/test_plan_hygiene.py pins the plan)."""
    from feast_spark.operators.contamination import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 3 == 0),
        "doc_id",
        "text",
        n=5,
        portable=True,
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-quantized ANN (second scale path) with the engine-portable
    md5-selected quantizer, so the full assign/probe/re-rank pipeline
    is value-checked against the oracle (which re-derives the identical
    centroids in SQL).  k-means training (``ivf_train_centroids``) is
    pytest-pinned separately — its centroids depend on float summation
    order and are not cross-engine stable."""
    from feast_spark.operators.similarity import ivf_ann_topk, md5_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = md5_centroids(emb, "vec_id", "embedding", n_centroids=16)
    return ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, centroids=cents
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score per document (single
    materialized token pass)."""
    from feast_spark.functions.text import with_quality_features

    docs = load_table(spark, sf_dir, "documents")
    return with_quality_features(docs, "text").select(
        "doc_id", "n_chars_q", "n_tokens", "mean_token_len", "punct_ratio",
        "stopword_ratio", "distinct_ratio", "quality_score",
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID (deterministic argmax)."""
    from feast_spark.functions.text import with_lang_id

    docs = load_table(spark, sf_dir, "documents")
    return with_lang_id(docs, "text").select("doc_id", "lang_pred")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feast_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feast_spark.functions.text import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data hygiene, text.scrub_pii): a chain
    of six JVM regexp_replace passes in precedence order (email, url,
    ipv4, ssn, card, phone).  The synthetic documents corpus is
    word-salad with no real PII, so deterministic spans derived from
    doc_id are appended first — both engines build the identical
    string, then the oracle applies the byte-identical patterns (built
    programmatically from text.PII_PATTERNS so they cannot drift), so
    the hash match verifies the whole regex chain cross-engine."""
    from feast_spark.functions.text import scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"), F.lit("@example.com"),
        F.lit(" via https://crawl"), (d % 50).cast("string"),
        F.lit(".example.org/p?u="), d.cast("string"),
        F.lit(" from 10."), (d % 200).cast("string"),
        F.lit(".0."), (d % 250).cast("string"),
        F.lit(" ssn 123-45-"), F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" card 4111 1111 1111 1111 call (415) 555-01"),
        F.lpad((d % 100).cast("string"), 2, "0"),
    )
    return docs.select("doc_id", scrub_pii(synth).alias("scrubbed"))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / context-window chunking (text.chunk_documents): fixed
    100-char windows with 20-char overlap; sequence+posexplode+substr,
    one codegen stage, zero shuffle (plan-pinned in test_text.py)."""
    from feast_spark.functions.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", size=100, overlap=20)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals (Gopher-style quality filters):
    top-token / top-bigram / dup-bigram fractions via one gram explode
    and two aggregations (text.repetition_stats)."""
    from feast_spark.functions.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (operators/bm25.py): top-15 docs for a
    3-term query, Lucene idf variant — query-term filter inside the
    token explode (shuffle carries only query-term postings), corpus
    stats broadcast, TakeOrderedAndProject top-k (plan-pinned in
    test_bm25.py).  The lexical channel of hybrid_topk."""
    from feast_spark.operators.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", ["spark", "window", "merge"], k=15)


def q_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup profile under the hash gate
    (operators/substr_dedup.py duplicate_substring_stats — the
    distributed formulation of Lee et al. 2022's ExactSubstr via
    winnowing fingerprints, Schleimer et al. SIGMOD 2003): per doc,
    the selected-fingerprint count, how many of those fingerprints
    are shared with other documents, and the duplicated fraction —
    the filter-mode signal.  Portable md5 mode lets the DuckDB oracle
    replay the ENTIRE selection -> detection -> profile pipeline
    bit-for-bit: same md5-prefix 32-bit hash, same leftmost-min
    window tie-break, same distinct-(pos,fp) projection.
    k=24/window=10 guarantees detection of verbatim runs >= 33 chars
    at ~2/11 selection density — long enough that only genuinely
    duplicated boilerplate (not common word bigrams) populates
    n_dup_fps (~30% of the synthetic corpus)."""
    from feast_spark.operators.substr_dedup import duplicate_substring_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicate_substring_stats(
        docs, "doc_id", "text", k=24, window=10, portable=True
    )


def q_pit_join_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with a composite entity key (l_orderkey, l_suppkey) and an
    integer created-tiebreak column (A2 on l_linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    entity = (
        li.filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") + F.expr("INTERVAL 5 DAYS")).alias("query_ts"),
        )
        .distinct()
    )
    feats = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber",
        "l_quantity", "l_extendedprice",
    )
    return as_of_join(
        entity,
        "query_ts",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["l_orderkey", "l_suppkey"],
                timestamp_col="l_shipdate",
                features=["l_quantity", "l_extendedprice"],
                created_col="l_linenumber",
                ttl=timedelta(days=30),
            )
        ],
    ).select("l_orderkey", "l_suppkey", "query_ts", "l_quantity", "l_extendedprice")


def q_pit_join_key_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 where the entity_df key column name differs from the feature
    table's (key_mapping / entity selections, BQ:565-568)."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    entity = entity.withColumnRenamed("user_id", "uid")
    return as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=views,
                join_keys=["uid"],
                timestamp_col="ts",
                features=["value"],
                ttl=timedelta(days=2),
                key_mapping={"uid": "user_id"},
            )
        ],
    ).select("event_id", "uid", "ts", F.col("value").alias("view_value"))


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: JSON field extraction from the events
    props column (derived-feature path)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def q_entity_row_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/F1/F2 — deterministic synthetic row key: md5 over cast+concat
    of the key columns (the BQ entity_row_unique_id construction)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.md5(
            F.concat_ws(
                "|", F.col("user_id").cast("string"), F.col("event_id").cast("string")
            )
        ).alias("row_key"),
    )


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus facade (pipelines/corpus.build_corpus), fully
    oracle-gated: featurize -> quality/token filter -> exact dedup ->
    MinHash+LSH near-dup resolution (portable md5 signatures) ->
    n-gram decontamination against an eval slice -> deterministic
    hash split -> mixture-by-source token budgeting.  Every stage is
    the driver-gated operator (corpus_clean, dup_groups_resolved,
    hash_split, corpus_mix composed in one lazy plan); the oracle
    replays the whole chain as one multi-CTE DuckDB query."""
    from feast_spark.pipelines.corpus import CorpusConfig, build_corpus

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 29 == 0).select("doc_id", "text")
    out = build_corpus(
        docs,
        eval_df=eval_df,
        config=CorpusConfig(
            portable_hashes=True,
            split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
            budgets={"src0": 800, "src1": 400, "src2": 100000, "src3": 1200},
            n_shards=4,
        ),
    )
    return out.select(
        "doc_id", "source", "lang_pred",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "quality_score", "split",
    )


def q_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-surface — top-k by aggregate with deterministic tie-break.
    Plan must be TakeOrderedAndProject (driver-side heap merge of
    per-partition top-k), never a global sort: at 100 TB a full sort of
    the agg output is an extra shuffle; top-k is partial-agg + bounded
    per-partition heaps."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped star join + top-k: broadcast the filtered
    customer dim, shuffle-join orders↔lineitem on orderkey, partial agg
    before the limit. Date predicates push to both parquet scans."""
    cutoff = "1998-06-01"
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP(region, nation) revenue — subtotals and a
    grand total in one pass (Expand + single hash agg; Catalyst's Expand
    multiplies rows 3x pre-shuffle but keeps ONE exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: CUBE(returnflag, linestatus) over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: per-day COUNT(DISTINCT user) + row count.
    Catalyst plans this as a two-phase expand-agg (partial distinct on
    (day,user) then final) — no driver-side set."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def q_doc_len_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of document length per language
    (training-corpus length profiling). Exact `percentile` (sort-based
    per group) is fine at per-language group counts; at petabyte scale
    swap to approx_percentile with the same call shape."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
        F.expr("percentile(n_chars, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no order in 2001+. Expressed as
    left_anti so AQE picks broadcast-anti when the filtered right
    side's distinct keys are small; the date filter pushes to the
    orders parquet scan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_buyers_never_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (EXCEPT DISTINCT): users who purchased but never clicked
    in the last third of the month. Spark plans EXCEPT as a left-anti
    over pre-aggregated distinct sides — same single-shuffle shape as
    the oracle's EXCEPT."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-20").cast("timestamp"))
    ).select("user_id")
    return buyers.subtract(clickers)


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning pipeline: quality features ->
    language ID -> quality/token-band filter -> exact dedup (keep min
    doc_id per normalized fingerprint).

    Featurize-filter-THEN-dedup is result-identical to dedup-first
    (every member of an exact-dup group has the same text, hence the
    same scores and the same filter outcome) but the one shuffle now
    carries only (doc_id, lang, counts, score, fingerprint) — fixed
    width — instead of document bodies, and filtered-out docs never
    reach the exchange at all.  At crawl scale that is the difference
    between shuffling the corpus and shuffling a table of longs."""
    from feast_spark.functions.text import with_lang_id, with_quality_features
    from feast_spark.operators.docdedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    scored = with_lang_id(with_quality_features(docs, "text"), "text")
    passing = scored.filter(
        (F.col("quality_score") >= 0.5)
        & (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 5000)
    )
    return exact_dedup(
        passing,
        "doc_id",
        "text",
        select=["lang_pred", "n_tokens", "quality_score"],
    ).select("doc_id", "lang_pred", "n_tokens", "quality_score")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of the events table (nulls /
    distincts / min-max) — the pre-flight stats pass of a training
    pipeline."""
    from feast_spark.operators.profile import profile_table

    ev = load_table(spark, sf_dir, "events")
    return profile_table(ev, ["user_id", "event_type", "value"])


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5(doc_id) —
    stable under repartitioning and corpus growth (a doc's split never
    changes when new docs arrive)."""
    from feast_spark.functions.split import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def q_dup_groups_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup DEDUP (not just pair emission): MinHash+LSH
    pairs (portable mode, same pipeline as ``minhash_lsh_dedup``) are
    transitively closed into components via the large-star/small-star
    contraction, and per component only the min-id document survives.
    The oracle recomputes the same pair graph in SQL and closes it with
    a recursive CTE — so the whole chain (shingle -> signature ->
    banding -> verify -> connected components -> keep-representative)
    is value-checked cross-engine."""
    from feast_spark.operators.components import resolve_dup_groups
    from feast_spark.operators.docdedup import minhash_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, portable=True
    )
    return resolve_dup_groups(
        docs.select("doc_id", "source"), pairs, "doc_id"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: md5-ordered docs chunked into
    512-token training sequences within 8 hash shards (no global
    sort)."""
    from feast_spark.functions.text import token_count
    from feast_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    )
    return pack_sequences(
        docs, "doc_id", "n_tokens", max_tokens=512, n_shards=8
    ).select(
        "doc_id", "shard", "seq_id", F.col("seq_pos").cast("long").alias("seq_pos")
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-by-source token budgeting: per source keep the longest
    md5-ordered prefix that fits the token budget (exact per-shard
    budget split; never overshoots)."""
    from feast_spark.functions.text import token_count
    from feast_spark.operators.packing import corpus_mix

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    )
    return corpus_mix(
        docs,
        "doc_id",
        "n_tokens",
        "source",
        budgets={"src0": 800, "src1": 400, "src2": 100000, "src3": 1200},
        n_shards=4,
    ).select("doc_id", "source", "n_tokens")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES with
    md5-derived uniforms), k=100 by n_chars weight — distributed
    top-k, no RNG state, reproducible across engines."""
    from feast_spark.operators.packing import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", k=100).select(
        "doc_id", "source", "n_chars"
    )


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling under the hash gate
    (operators/dsir.py, Xie et al. 2023): select the 120 raw documents
    whose hashed unigram+bigram distribution best matches the
    German-language slice — log importance weights over md5-bucket
    histograms, Gumbel top-k on the shared md5 randomness discipline.
    Gated on the SELECTED SET (doc_id, lang, source): the per-doc
    weights are float sums in shuffle order (pinned to 1e-9 vs the
    DuckDB twin in tests/test_dsir.py), but the selection is exact
    because the Gumbel-key gaps at the k-boundary dwarf summation-order
    noise by many orders of magnitude."""
    from feast_spark.operators.dsir import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "de")
    return dsir_resample(
        docs, target, n_docs=120, n_max=2, n_buckets=512, seed=""
    ).select("doc_id", "lang", "source")


def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: views attributed to the purchase whose
    1-day window [purchase_ts, purchase_ts + 1d) contains them, then
    per-purchase attribution stats (left join: purchases with no
    attributed views keep a 0 count)."""
    from feast_spark.operators.interval_join import interval_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("win_end"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(
        views, purchases, ["user_id"], "ts", "win_start", "win_end", how="inner"
    )
    per_purchase = joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum("value").alias("view_value"),
    )
    return (
        purchases.select("purchase_id", "user_id")
        .join(per_purchase, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            "view_value",
        )
    )


def q_pit_join_list_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with an ArrayType feature column — list-typed values must ride
    through the as-of join unchanged (ValueType *_LIST parity,
    type_map.py:177-271). The array survives the join; the final
    projection unpacks it to scalar elements because the driver's
    pandas canonicalizer cannot hash list cells."""
    entity, views, _ = _entity_and_feature_frames(spark, sf_dir)
    feats = views.withColumn(
        "vals", F.array(F.col("value"), F.col("value") * 2)
    ).drop("value")
    joined = as_of_join(
        entity,
        "ts",
        [
            AsOfJoinSpec(
                feature_df=feats,
                join_keys=["user_id"],
                timestamp_col="ts",
                features=["vals"],
                ttl=timedelta(days=2),
            )
        ],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("vals").getItem(0).alias("val0"),
        F.col("vals").getItem(1).alias("val1"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 20 docs per language, chosen by
    md5 order — the balanced-mini-corpus primitive."""
    from feast_spark.functions.split import sample_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_per_group(docs, ["lang"], "doc_id", 20).select(
        "doc_id", "lang", "source"
    )


def q_sql_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — arbitrary SQL subquery as a feature source
    (get_table_query_string parity, bigquery.py:794-799): register the
    parquet table as a view, declare the source as SQL, field-map it."""
    from feast_spark.data_source import SparkSqlSource

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    src = SparkSqlSource(
        query="""
            SELECT o_custkey, o_orderstatus,
                   SUM(o_totalprice) AS total_spend,
                   COUNT(*) AS n_orders
            FROM orders_v GROUP BY o_custkey, o_orderstatus
        """,
        field_mapping={"o_custkey": "customer_id"},
    )
    return src.load(spark).select(
        "customer_id", "o_orderstatus", "total_spend", "n_orders"
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-table star join: revenue by nation where the
    customer and supplier share a nation (join condition across two
    dimension paths). Dims broadcast; the only shuffle joins the two
    fact tables on orderkey."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user conversion funnel: first view -> first click at/after
    that view -> first purchase at/after that click. Three chained
    whole-partition window mins over the SAME user_id partitioning
    (Catalyst plans one Exchange + one Sort for the chain) — no
    per-user arrays, so a hot user with 10M events costs sort space,
    not memory."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    ev = ev.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    ev = ev.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    ev = ev.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    return ev.select(
        "user_id", "first_view", "first_click", "first_purchase"
    ).distinct()


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigrams by occurrence (NON-distinct within a
    doc, unlike the dedup shingles): explode -> count -> top-k. The
    shuffle carries (bigram, partial count) after map-side combine;
    the limit is TakeOrderedAndProject."""
    from feast_spark.functions.text import (
        explode_computed,
        normalize_text,
        tokens,
    )
    from feast_spark.operators.docdedup import widen_parallelism

    docs = load_table(spark, sf_dir, "documents")
    toks = widen_parallelism(docs.select("text")).select(
        tokens(normalize_text(F.col("text"))).alias("t")
    )
    bigrams = explode_computed(
        toks,
        [],
        F.when(
            F.size("t") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, 2)),
            ),
        ).otherwise(F.array()),
        "bigram",
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction (operators/cdc.py apply_changelog —
    MERGE INTO semantics as ONE hash aggregate, shuffle O(distinct
    keys)): the events stream as a changelog where 'error' rows are
    deletes, newest change per user wins, deleted users vanish.
    event_id is the created/tie-break column (unique, so the result is
    deterministic under any ts ties)."""
    from feast_spark.operators.cdc import apply_changelog

    ev = load_table(spark, sf_dir, "events")
    changes = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    return apply_changelog(
        None, changes, ["user_id"], "ts", op_col="op", created_col="event_id"
    )


def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag/delta features (operators/window_agg.py
    with_lag_features): previous and second-previous value per user in
    time order plus deltas — one window shuffle shared by all four
    output columns, deterministic via the event_id tiebreak."""
    from feast_spark.operators.window_agg import with_lag_features

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return with_lag_features(
        ev, ["user_id"], "ts", ["value"], lags=[1, 2], tiebreak_col="event_id"
    )


def q_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (operators/fuzzy_join.py edit_distance_join):
    all cross-range customer-name pairs within Levenshtein distance 1,
    via q-gram blocking + count filter + length-band short channel —
    exact, no cross join (the oracle IS the cross join)."""
    from feast_spark.operators.fuzzy_join import edit_distance_join

    cust = load_table(spark, sf_dir, "customer")
    left = cust.filter(F.col("c_custkey") < 300).select("c_custkey", "c_name")
    right = cust.filter(
        (F.col("c_custkey") >= 300) & (F.col("c_custkey") < 600)
    ).select("c_custkey", "c_name")
    return edit_distance_join(
        left, right, "c_custkey", "c_name", "c_custkey", "c_name", max_dist=1
    )


def q_decayed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed per-user aggregates
    (operators/timeseries.py decayed_agg): half-life-weighted sum and
    count at a fixed evaluation time — ONE map-side-combined groupBy,
    shuffle O(keys); values rounded to 6 decimals on both engines (the
    weights go through pow(), where libm implementations may differ in
    the last ulp)."""
    from feast_spark.operators.timeseries import decayed_agg

    ev = load_table(spark, sf_dir, "events")
    out = decayed_agg(
        ev,
        ["user_id"],
        "ts",
        "value",
        half_life=timedelta(days=7),
        at_time="2024-01-25 00:00:00",
    )
    return out.select(
        "user_id",
        F.round("decayed_sum", 6).alias("decayed_sum"),
        F.round("decayed_count", 6).alias("decayed_count"),
    )


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch rollup (operators/sketches.py): build per-(type, day)
    sketches, then answer the per-type distinct-user question by
    UNIONING the day sketches — the materialize-once-answer-forever
    read path that touches O(groups) sketch rows, never the events.
    At gate cardinalities (~150 users) the DataSketches HLL is in its
    exact (coupon) regime, so the estimate equals COUNT(DISTINCT)
    exactly and the hash gate applies; the error-bound regime at real
    cardinalities is pinned by tests/test_sketches.py."""
    from feast_spark.operators.sketches import (
        build_distinct_sketches,
        estimate_distinct,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    sk = build_distinct_sketches(ev, "user_id", ["event_type", "day"])
    return estimate_distinct(sk, ["event_type"])


_HYBRID_QVEC = [((i * 37) % 19) / 19.0 for i in range(64)]
# DuckDB literal twin of the hybrid query vector (repr round-trips the
# exact doubles, so both engines score the identical vector)
_QVEC_SQL = "[" + ", ".join(repr(x) for x in _HYBRID_QVEC) + "]"


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval (operators/bm25.py hybrid_topk):
    BM25 top-50 and cosine top-50 channels fused by reciprocal rank
    (RRF, rank-based so the score scales never need normalizing); both
    channels are TakeOrderedAndProject top-k plans over one narrow
    pass each, the fusion is a full-outer join of two 50-row lists."""
    from feast_spark.operators.bm25 import hybrid_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return hybrid_topk(
        docs, emb, ["spark", "merge"], _HYBRID_QVEC, k=10, fetch_k=50
    )


def q_bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index BM25 full lifecycle (operators/bm25.py
    build_bm25_index / bm25_index_append / bm25_index_compact /
    bm25_index_topk): build the term-bucketed postings index on two
    thirds of the corpus, epoch-append the rest (O(new docs); exact
    per-epoch long stats sum to the corpus totals), compact the epochs
    into one, then serve the query reading ONLY its terms' bucket
    directories — partition pruning makes per-query cost O(query-term
    postings).  The oracle is the FULL-corpus BM25 SQL, so the gate
    proves append+compact land exactly where a single build would.

    r13 second leg: the SAME index is also queried ``as_of=1`` — the
    archived BUILD commit (io/epochs.py manifest history) — and must
    score bit-identically to a corpus that never contained the
    appended third (the two-thirds oracle leg).  Time travel's
    archived-manifest resolution, historical epoch list AND historical
    corpus stats are all under the hash gate."""
    import tempfile

    from feast_spark.operators.bm25 import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_topk,
        build_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="fs_gate_bm25_") + "/idx"
    build_bm25_index(
        docs.filter(F.col("doc_id") % 3 != 0), path, "doc_id", "text",
        n_term_buckets=16,
    )
    bm25_index_append(spark, path, docs.filter(F.col("doc_id") % 3 == 0))
    bm25_index_compact(spark, path)
    head = bm25_index_topk(spark, path, ["hash", "scan", "filter"], k=15)
    asof = bm25_index_topk(
        spark, path, ["hash", "scan", "filter"], k=15, as_of=1
    )
    return head.select(F.lit("head").alias("leg"), "doc_id", "bm25").unionAll(
        asof.select(F.lit("asof_build").alias("leg"), "doc_id", "bm25")
    )


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality metrics (operators/retrieval_eval.py
    ndcg_at_k): graded nDCG@10 of a deterministic ranked table —
    per-nation suppliers ranked by account balance — against graded
    qrels (balance > 5000 relevant, > 8000 gain 2).  The metric
    reduces (query, doc) pairs immediately: two equi-joins + one
    aggregate per query, evaluation cost independent of corpus size."""
    from pyspark.sql import Window

    from feast_spark.operators.retrieval_eval import ndcg_at_k

    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    j = sup.join(nat, sup["s_nationkey"] == nat["n_nationkey"])
    results = j.select(
        F.col("n_nationkey").alias("query_id"),
        F.col("s_suppkey").alias("doc_id"),
        F.row_number()
        .over(
            Window.partitionBy("n_nationkey").orderBy(
                F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
            )
        )
        .alias("rank"),
    )
    qrels = j.filter(F.col("s_acctbal") > 5000).select(
        F.col("n_nationkey").alias("query_id"),
        F.col("s_suppkey").alias("doc_id"),
        F.when(F.col("s_acctbal") > 8000, 2.0).otherwise(1.0).alias(
            "relevance"
        ),
    )
    out = ndcg_at_k(results, qrels, k=10, rel_col="relevance")
    return out.select(
        "query_id",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round("ndcg", 6).alias("ndcg"),
    )


def q_online_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end online serving under the hash gate, TWO legs
    (feature_store.py materialize -> online snapshot ->
    get_online_features with full field statuses).

    leg='head': latest value per user materialized to 2024-01-25,
    served at 2024-01-26 with a 36h ttl, so users idle since
    01-24 12:00 report OUTSIDE_MAX_AGE with the stale value withheld,
    unknown users report NOT_FOUND, and the rest serve PRESENT — the
    reference's FieldStatus contract (ServingService.proto:96-115)
    replayed against a DuckDB latest-per-key + ttl-cutoff oracle.

    leg='asof' (r14): the store is materialized TWICE — first to
    2024-01-20 (snapshot commit seq 1), then to 2024-01-25 (seq 2, the
    head state above, an upsert over seq 1) — and the second call
    serves ``get_online_features(as_of=1, now=2024-01-21)``: the
    manifest commit log (io/manifest.py path_as_of) must resolve the
    FIRST materialization's snapshot, and ttl statuses classify
    against the replayed clock (cutoff 2024-01-19 12:00), so a value
    fresh THEN is PRESENT even though it is stale at head.  The oracle
    leg replays latest-per-key below the 01-20 cutoff.  Mirrors the
    reference's same-value-at-same-timestamp consistency discipline
    (sdk/python/tests/test_offline_online_store_consistency.py:
    318-363), here replayed at a past instant.

    An on-demand feature view (value_scaled = value*10+1, spark-mode
    transform) is served in BOTH requests, putting the ODFV serving
    half under the hash gate too: its input is the post-status value,
    so withheld/absent values yield NULL.  The request batches
    (152 rows each) are driver-side by design — serving requests are
    request-sized."""
    import tempfile
    from datetime import datetime

    from feast_spark import (
        Entity,
        Feature,
        FeatureStore,
        FeatureView,
        FileSource,
        OnDemandFeatureView,
        RepoConfig,
        ValueType,
    )

    tmp = tempfile.mkdtemp(prefix="fs_gate_online_")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_type"
    )
    src = f"{tmp}/events_src.parquet"
    ev.write.parquet(src)
    st = FeatureStore(
        spark,
        RepoConfig(
            project="gate",
            registry_path=f"{tmp}/registry.json",
            online_store_path=f"{tmp}/online",
        ),
    )
    st.apply(
        [
            Entity(name="user", join_key="user_id", value_type=ValueType.INT64),
            FeatureView(
                name="user_latest",
                entities=["user"],
                ttl=timedelta(hours=36),
                batch_source=FileSource(
                    path=src, event_timestamp_column="ts"
                ),
            ),
            OnDemandFeatureView(
                name="value_scaled_view",
                sources=["user_latest:value"],
                features=[Feature(name="value_scaled", dtype=ValueType.DOUBLE)],
                transform=lambda df: df.withColumn(
                    "value_scaled", F.col("value") * 10.0 + 1.0
                ),
                mode="spark",
            ),
        ]
    )
    # two snapshot commits: seq 1 = state as of the 01-20 cutoff,
    # seq 2 = head (an upsert over seq 1 — latest event_ts wins, so
    # the merged snapshot equals a single materialize to 01-25)
    st.materialize(datetime(2024, 1, 1), datetime(2024, 1, 20))
    st.materialize(datetime(2024, 1, 1), datetime(2024, 1, 25, 0, 0, 0, 500000))
    entity_rows = [{"user_id": i} for i in range(152)]
    refs = ["user_latest:value", "value_scaled_view:value_scaled"]
    legs = []
    for leg, kw in (
        ("head", {"now": datetime(2024, 1, 26)}),
        ("asof", {"now": datetime(2024, 1, 21), "as_of": 1}),
    ):
        resp = st.get_online_features(
            refs, entity_rows, full_field_statuses=True, **kw
        )
        legs.extend(
            (
                leg,
                i,
                resp["value"][i],
                resp["__statuses"]["value"][i],
                resp["value_scaled"][i],
            )
            for i in range(152)
        )
    return spark.createDataFrame(
        legs,
        "leg STRING, user_id BIGINT, value DOUBLE, status STRING, "
        "value_scaled DOUBLE",
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (operators/graph.py) over the supplier<->customer
    trade graph (distinct (l_suppkey, o_custkey) pairs via orders,
    customers offset by 1e6 into their own id space, both directions
    as arcs so every node has out-degree), fixed 3 iterations
    (tol=None — the mode the numpy differential also pins).  The
    oracle unrolls the same power iteration as chained CTEs with the
    identical FP op order ((1 - d) + d*dangling, share = rank/deg),
    so ranks agree to the last ulp before the shared ROUND(.., 6)."""
    from feast_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pairs = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    out = pagerank(edges, max_iter=3, tol=None)
    return out.select("node", F.round("rank", 6).alias("rank"))


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric feature drift (operators/drift.py feature_drift) of
    events.value split at 2024-01-15, per event_type grain: exact
    8-bin [0, 100) histograms (+ under/overflow) on each side, then
    PSI / JS divergence / TVD / KS in one pass of JVM array folds.
    The histograms are exact longs, so every statistic reproduces
    bit-for-bit in the width_bucket SQL twin before the shared
    ROUND(.., 6)."""
    from feast_spark.operators.drift import feature_drift

    ev = load_table(spark, sf_dir, "events")
    split = "2024-01-15 00:00:00"
    ref = ev.filter(F.col("ts") < split)
    cur = ev.filter(F.col("ts") >= split)
    return feature_drift(
        ref, cur, "value", lo=0.0, hi=100.0,
        grain_cols=["event_type"], n_bins=8,
    )


def q_dedup_against_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup against the persisted minhash index
    (operators/minhash_index.py), full lifecycle under one oracle:
    build the portable-signature index on part of the corpus
    (doc_id % 10 != 0, % 3 != 1), epoch-append the rest of the corpus,
    then dedup the held-out slice (doc_id % 10 == 0) against it.  The
    oracle is the FULL-corpus portable MinHash SQL restricted to pairs
    with a slice side — so the gate proves (a) append lands exactly
    where a single build would and (b) index-vs-slice candidate
    generation + capped buckets + exact-Jaccard verify equal the
    one-shot corpus pipeline's."""
    import tempfile

    from feast_spark.operators.minhash_index import (
        build_minhash_index,
        dedup_against_index,
        minhash_index_append,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    path = tempfile.mkdtemp(prefix="fs_gate_mhidx_") + "/idx"
    build_minhash_index(
        corpus.filter(F.col("doc_id") % 3 != 1), path,
        "doc_id", "text", portable=True,
    )
    minhash_index_append(spark, path, corpus.filter(F.col("doc_id") % 3 == 1))
    head = dedup_against_index(spark, path, new, threshold=0.5)
    # r14 second leg: as_of=1 (the archived BUILD commit) must flag
    # exactly what a past ingestion run checking against the
    # build-only corpus flagged — historical params + epoch list on
    # the index read are under the hash gate (minhash_index.py:252)
    asof = dedup_against_index(spark, path, new, threshold=0.5, as_of=1)
    cols = ["id_a", "id_b", "jaccard"]
    return head.select(F.lit("head").alias("leg"), *cols).unionAll(
        asof.select(F.lit("asof_build").alias("leg"), *cols)
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup pair search (operators/semdedup.py
    semantic_dedup_pairs) with the engine-portable md5-selected
    quantizer (similarity.md5_centroids — the ann_ivf pattern), so the
    whole pipeline is value-checked cross-engine: the oracle re-derives
    the identical 16 centroids in SQL, assigns every vector (argmin
    L2, ties -> lowest cell), applies the max_cluster_size cap (40 —
    chosen to actually TRIGGER at sf0.01, dropping one 41-vector
    cell, so the cap semantics are under the hash gate too), expands
    within-cell pairs, and exact-cosine-verifies at cos >= 0.3.
    k-means training (the quality path) stays pytest-pinned — its
    centroids depend on float summation order and are not
    cross-engine stable."""
    from feast_spark.operators.semdedup import semantic_dedup_pairs
    from feast_spark.operators.similarity import md5_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = md5_centroids(emb, "vec_id", "embedding", n_centroids=16)
    return semantic_dedup_pairs(
        emb, "vec_id", "embedding", threshold=0.3,
        centroids=cents, max_cluster_size=40,
    )


def q_hybrid_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-index hybrid serving stack under the hash gate
    (operators/bm25.py hybrid_index_topk): BOTH channels served from
    persisted indexes built through their append lifecycle — BM25
    postings built on two thirds of the corpus then epoch-appended
    (the bm25_index_topk gate pattern), IVF vectors built on two
    thirds of the embeddings then epoch-appended — and queried at
    n_probe = n_centroids, where the cell-pruned vector channel is
    EXACTLY the brute cosine scan (every cell probed; the k-means
    quantizer's engine-instability is irrelevant because the union of
    all cells is the corpus).  The oracle is the inline hybrid's
    full-corpus SQL (BM25 math + exact cosine + RRF arithmetic), so
    the gate proves index builds + appends + pruned serving land
    exactly where a corpus-scan hybrid does.  Embeddings are cast to
    double before the IVF build: hybrid_index_topk adopts the index's
    stored element type for its query-vector frame, and a float32
    index would truncate the query vector and perturb round-4 cosines
    off the oracle's exact-double literal.

    r12: the append goes through the PAIRED verb
    (operators/paired_index.py hybrid_index_append), so the shared
    corpus_epoch stamp — and the per-query alignment check
    hybrid_index_topk now runs (on_corpus_mismatch default "fail") —
    are themselves under the hash gate.

    r14 second leg: the remaining third is appended in TWO paired
    appends, the pair seqs are captured after the FIRST, and the same
    stack is queried ``as_of=(b1, v1)`` — both channels must replay
    the corpus as of that paired commit (everything except the
    doc_id % 6 == 3 slice), and the per-query alignment check must
    validate the ARCHIVED pair stamps (paired_index.py), not head's.
    The oracle leg is the same full hybrid SQL over that sub-corpus,
    so historical epoch resolution + historical stamp alignment on
    BOTH channels are under the hash gate."""
    import tempfile

    from feast_spark.io import epochs as epochs_io
    from feast_spark.io.fs import LocalFS
    from feast_spark.operators.bm25 import (
        build_bm25_index,
        hybrid_index_topk,
    )
    from feast_spark.operators.paired_index import hybrid_index_append
    from feast_spark.operators.similarity import build_ivf_index

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: x.cast("double")
        ).alias("embedding"),
    )
    base = tempfile.mkdtemp(prefix="fs_gate_hybrid_")
    bpath, vpath = base + "/bm25", base + "/ivf"
    build_bm25_index(
        docs.filter(F.col("doc_id") % 3 != 0), bpath, "doc_id", "text",
        n_term_buckets=16,
    )
    build_ivf_index(
        emb.filter(F.col("vec_id") % 3 != 0), vpath, n_centroids=8, iters=2
    )
    # %3==0 splits into %6==0 (first paired append) and %6==3 (second)
    hybrid_index_append(
        spark, bpath, vpath,
        docs.filter(F.col("doc_id") % 6 == 0),
        emb.filter(F.col("vec_id") % 6 == 0),
    )
    fs = LocalFS()
    b1 = epochs_io.read_manifest(bpath, fs)["commit_seq"]
    v1 = epochs_io.read_manifest(vpath, fs)["commit_seq"]
    hybrid_index_append(
        spark, bpath, vpath,
        docs.filter(F.col("doc_id") % 6 == 3),
        emb.filter(F.col("vec_id") % 6 == 3),
    )
    head = hybrid_index_topk(
        spark, bpath, None, ["spark", "merge"], _HYBRID_QVEC,
        k=10, fetch_k=50, vec_index_path=vpath, n_probe=8,
    )
    asof = hybrid_index_topk(
        spark, bpath, None, ["spark", "merge"], _HYBRID_QVEC,
        k=10, fetch_k=50, vec_index_path=vpath, n_probe=8,
        as_of=(b1, v1),
    )
    cols = ["id", "lex_rank", "vec_rank", "rrf"]
    return head.select(F.lit("head").alias("leg"), *cols).unionAll(
        asof.select(F.lit("asof_append").alias("leg"), *cols)
    )


def q_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVFPQ ADC serving under the hash gate
    (operators/pq_index.py): build the index on two thirds of the
    embeddings with the engine-portable frozen models (md5_centroids
    coarse quantizer + pq.md5_codebooks PQ codebooks — no float
    arithmetic in either selection), epoch-append the rest under the
    FROZEN models, then serve 5 queries at n_probe=3 reading only
    probed cells' CODE rows.  The oracle re-derives centroids AND
    codebooks in SQL, re-encodes the corpus (per-subspace argmin L2,
    ties -> lowest code — numpy argmin's first-occurrence on the
    Spark side), probes, and sums the same per-subspace ADC terms.
    Cross-engine FP honesty: the numpy kernel evaluates the expanded
    quadratic form with pairwise summation while the SQL twin folds
    (a-b)^2 sequentially, so unrounded ADC values agree to ~1e-12
    relative, NOT bitwise.  Ranks are therefore computed on UNROUNDED
    ADC on both sides (rounding pre-rank would collapse genuinely
    distinct values into rank-flipping ties) and can flip only for
    candidates within that ~1e-12 band — i.e. exact ties, which only
    identical code rows produce and which break by neighbor id on
    both engines; the displayed distance is rounded to 4 for the
    value hash.  Same risk class as the round-4 cosine and BM25
    fetch-k boundaries every retrieval gate carries."""
    import tempfile

    from pyspark.sql import Window

    from feast_spark.operators.pq import md5_codebooks
    from feast_spark.operators.pq_index import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_index_topk,
    )
    from feast_spark.operators.similarity import md5_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = md5_centroids(emb, "vec_id", "embedding", n_centroids=8)
    books = md5_codebooks(
        emb, "vec_id", "embedding", m_subspaces=8, k_codes=16
    )
    path = tempfile.mkdtemp(prefix="fs_gate_ivfpq_") + "/idx"
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 != 0), path,
        centroids=cents, codebooks=books,
    )
    ivfpq_index_append(spark, path, emb.filter(F.col("vec_id") % 3 == 0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )

    def _ranked(df, leg):
        return df.select(
            F.lit(leg).alias("leg"),
            "query_id",
            "neighbor_id",
            F.round("adc_dist", 4).alias("adc_dist"),
            F.row_number().over(w).alias("rank"),
        )

    head = ivfpq_index_topk(
        spark, path, emb.filter(F.col("vec_id") < 5), n_probe=3, k=10
    )
    # r13 second leg: as_of=1 (the archived BUILD commit) must rank
    # against a corpus that never contained the appended third — the
    # historical epoch list on the codes scan is under the hash gate
    asof = ivfpq_index_topk(
        spark, path, emb.filter(F.col("vec_id") < 5), n_probe=3, k=10,
        as_of=1,
    )
    return _ranked(head, "head").unionAll(_ranked(asof, "asof_build"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pit_join_multiview(spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # r15: pit_join's gate slot runs the TWO-LEG dataset-lifecycle
        # variant (same J1 join both legs, plus commit/as_of replay);
        # bench.py still times the plain q_pit_join for series
        # comparability
        "pit_join": q_pit_join_dataset,
        "pit_join_multiview": q_pit_join_multiview,
        # r16: latest_per_key_created rotated to
        # tests/test_rotated_relational.py (A1 is exercised by every
        # PIT query + the rotated latest_per_key oracle; A2's
        # created-ts tie-break keeps its original oracle there) to
        # gate the r15 dataset-diff classification
        "dataset_diff": q_dataset_diff,
        "dsir_resample": q_dsir_resample,
        "retrieval_ndcg": q_retrieval_ndcg,
        "pii_scrub": q_pii_scrub,
        "dedup_exact": q_dedup_exact,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "resample_grid": q_resample_grid,
        "ann_topk_cosine": q_ann_topk_cosine,
        "contamination": q_contamination,
        "ann_ivf": q_ann_ivf,
        "sessionize": q_sessionize,
        "pricing_summary": q_pricing_summary,
        "doc_chunks": q_doc_chunks,
        "window_agg_hourly": q_window_agg_hourly,
        "rolling_7d": q_rolling_7d,
        "rollup_pit_join": q_rollup_pit_join,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "repetition_stats": q_repetition_stats,
        "substr_dedup": q_substr_dedup,
        "json_props": q_json_props,
        "corpus_pipeline": q_corpus_pipeline,
        "shipping_priority": q_shipping_priority,
        "dup_groups_resolved": q_dup_groups_resolved,
        "pack_sequences": q_pack_sequences,
        "customers_no_orders": q_customers_no_orders,
        "weighted_sample": q_weighted_sample,
        "corpus_clean": q_corpus_clean,
        "table_profile": q_table_profile,
        "attribution_join": q_attribution_join,
        "stratified_sample": q_stratified_sample,
        "sql_source": q_sql_source,
        "corpus_mix": q_corpus_mix,
        "funnel": q_funnel,
        "top_ngrams": q_top_ngrams,
        "cdc_merge": q_cdc_merge,
        "lag_features": q_lag_features,
        "edit_distance_join": q_edit_distance_join,
        "decayed_agg": q_decayed_agg,
        "sketch_distinct": q_sketch_distinct,
        "bm25_index_topk": q_bm25_index_topk,
        "online_serving": q_online_serving,
        "pagerank": q_pagerank,
        "drift_psi": q_drift_psi,
        "dedup_against_index": q_dedup_against_index,
        "semdedup": q_semdedup,
        "hybrid_index_topk": q_hybrid_index_topk,
        "ivfpq_index_topk": q_ivfpq_index_topk,
    }
    # NB: exactly 50 entries — the driver records at most 50 queries
    # (r02 registered 52, recorded 50).  The former simhash_portable /
    # minhash_portable entries ARE the gated simhash_pairs /
    # minhash_lsh_dedup now; the xxhash64 fast paths stay in the
    # library (bench.py times q_minhash_fast).
    # Round 4 rotated four relational twins out to make room for the
    # corpus-assembly ops while keeping exactly 50: cube_flags (CUBE;
    # rollup_revenue still gates grouping sets), buyers_never_click
    # (anti-join; customers_no_orders remains), local_supplier_volume
    # (multi-join agg; nation_revenue remains), doc_len_percentiles
    # (table_profile remains).  The q_* functions stay in the library.
    # Round 8 rotated four double-covered slots for the new hygiene/
    # retrieval ops: field_mapping (P1 stays gated via
    # pit_join_key_mapping), part_type_stats (dimension rollup;
    # pricing_summary remains), token_count (n_tokens is literally a
    # text_quality output column), doc_fingerprint (the identical
    # normalized-md5 identity IS dedup_exact's oracle mechanism).
    # All four keep their original oracles in
    # tests/test_rotated_relational.py.
    # Round 9 rotated eight double-covered slots so the rounds-7/8
    # pytest-only operators get hard gates: pit_join_no_ttl +
    # pit_join_key_mapping (J1/P1 stay gated via pit_join,
    # pit_join_composite_key, pit_join_multiview, rollup_pit_join,
    # pit_join_list_feature), nation_revenue + order_enrich +
    # topk_revenue (join/agg/top-k shapes stay gated via
    # shipping_priority, rollup_revenue, funnel, attribution_join),
    # dedup_groups (0-row twin; dup_groups_resolved gates the whole
    # minhash->CC->resolve chain), hash_split (same md5-prefix idiom
    # as stratified_sample/weighted_sample), distinct_daily_users
    # (sketch_distinct now gates distinct counting via the HLL
    # rollup).  In their place: cdc_merge, lag_features,
    # edit_distance_join, decayed_agg, sketch_distinct, hybrid_rrf,
    # bm25_index_topk, online_serving.  All eight rotated queries keep
    # their original oracles in tests/test_rotated_relational.py.
    # Round 9 rotated time_range_filter out (P3 half-open range
    # semantics stay gated through every ttl'd PIT query and the
    # window aggregates) for retrieval_ndcg; bm25_index_topk now also
    # exercises bm25_index_append + bm25_index_compact under the same
    # full-corpus oracle.  simhash_pairs rotated out for resample_grid
    # (the near-dup pair family stays gated via minhash_lsh_dedup,
    # ngram_jaccard_pairs and dup_groups_resolved).
    # Round 10 rotated three double-covered slots so the round-9
    # pytest-only operators get hard gates: ngram_jaccard_pairs (the
    # shingle->Jaccard verify mechanism is gated inside
    # minhash_lsh_dedup and now dedup_against_index), ann_lsh (the ANN
    # family keeps ann_topk_cosine + ann_ivf + embed_near_dup gated),
    # rollup_revenue (grouping-sets semantics stay pytest-checked next
    # to the rotated cube_flags; pricing_summary/shipping_priority/
    # funnel keep the relational agg shapes gated).  In their place:
    # pagerank (fixed-iteration power method vs a chained-CTE SQL
    # twin), drift_psi (PSI/JS/TVD/KS over exact histograms vs a
    # width_bucket twin), dedup_against_index (portable-signature
    # index build -> append -> slice dedup vs the full-corpus MinHash
    # SQL restricted to slice-side pairs).  All three rotated queries
    # keep their original oracles in tests/test_rotated_relational.py.
    # Round 11 rotated three double-covered slots so the round-10
    # all-index serving stack and SemDeDup get hard gates:
    # pit_join_composite_key + pit_join_list_feature (J1 stays gated
    # via pit_join, pit_join_multiview, rollup_pit_join,
    # attribution_join — composite-key/list-typed variants keep their
    # DuckDB oracles in the rotated suite) and hybrid_rrf (the inline
    # hybrid; its BM25 math, exact-cosine channel and _rrf_fuse fusion
    # are all gated INSIDE the new hybrid_index_topk, which runs the
    # same oracle SQL against the persisted-index serving path).  In
    # their place: semdedup (md5-frozen quantizer ->
    # assign/cap/pair/verify vs a full SQL twin), hybrid_index_topk
    # (both-channel index lifecycle at n_probe=all vs the corpus-scan
    # hybrid SQL), ivfpq_index_topk (md5-frozen quantizer+codebooks ->
    # build/append/ADC-serve vs a full re-encode SQL twin).  All three
    # rotated queries keep their original oracles in
    # tests/test_rotated_relational.py.
    # Round 12 rotated bm25_topk (inline corpus-scan BM25: its
    # tokenizer (_bm25_doc_tables) and scorer (_score_postings) are
    # the SAME functions gated inside bm25_index_topk, whose oracle is
    # the identical full-corpus SQL; the hybrid gates fuse it again)
    # for substr_dedup — the last major dedup family without a
    # CORRECTNESS row (exact/minhash/semantic/incremental-index were
    # already gated).  bm25_topk keeps its original oracle in
    # tests/test_rotated_relational.py.
    # Round 13 rotated latest_per_key (A1: the SAME operators/dedup.
    # latest_per_key function stays gated inside latest_per_key_created
    # — tie-break superset over a unioned frame — and its argmax shape
    # inside every PIT query) for dsir_resample — the only operator
    # family introduced since r9 without a CORRECTNESS row.
    # latest_per_key keeps its original oracle in
    # tests/test_rotated_relational.py and stays a headline bench slot
    # via re-registration in bench.py/tools/dump_plans.py.
    # Round 15 rotated embed_near_dup (its exact-cosine-pair math is
    # double-covered: the same cosine identity is gated inside
    # ann_topk_cosine and semdedup's verify stage) for contamination —
    # the benchmark-leakage guard every LLM training pipeline runs,
    # previously pytest-only.  embed_near_dup keeps its original
    # oracle in tests/test_rotated_relational.py.  The pit_join slot
    # grew the r15 dataset-lifecycle second leg (q_pit_join_dataset);
    # the plain q_pit_join stays a headline bench slot via
    # re-registration in bench.py/tools/dump_plans.py.


# Shared DuckDB fragments for the text oracles (mirror feast_spark.functions.text)
_NORM_TEXT = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_NORM_MD5 = f"md5({_NORM_TEXT})"
_SW_EN = "'the','a','and','of','to','in','is','it'"
_SW_ES = "'el','la','de','que','y','en','los','se'"
_SW_DE = "'der','die','und','das','ist','von','mit','den'"
_SW_FR = "'le','la','de','et','les','des','un','une'"

# DuckDB twins of the corpus-assembly idioms (mirror operators/packing.py
# and functions/split.py: whitespace token count, md5 ordering key, 32-bit
# md5-prefix hash used for shards/buckets/uniform draws)
_TOK_CNT = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
)
_MD5_ID = "md5(CAST(doc_id AS VARCHAR))"
_H32_ID = "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"

def _bm25_oracle(terms: list[str], k: int, doc_filter: str = "") -> str:
    """DuckDB twin of bm25_topk / bm25_index_topk (identical scoring by
    construction — operators/bm25.py _score_postings): Lucene-idf BM25
    term-for-term.  ``doc_filter`` restricts the corpus (the time-travel
    leg scores against the docs committed AT a given index commit)."""
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    return f"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array({_NORM_TEXT}, '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0 {doc_filter}
),
lens AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array({_NORM_TEXT}, '\\s+')) END
           AS len_d
  FROM documents WHERE TRUE {doc_filter}
),
stats AS (SELECT count(*) AS n_docs, avg(len_d) AS avg_len FROM lens),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tk
  WHERE term IN ({tl}) GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - dfreq.df_t + 0.5)
                 / (dfreq.df_t + 0.5) + 1.0)
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75
                  + 0.75 * lens.len_d / stats.avg_len)) ) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT {k}
"""


# All oracle timestamps are CAST to µs-precision TIMESTAMP up front so the
# comparison domain matches Spark's (which truncates the parquet ns column).
_PIT_ORACLE = """
WITH entity AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase' {entity_pred}
), feat AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'view'
), ranked AS (
  SELECT e.event_id, e.user_id, e.ts,
         f.value, f.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY f.ts DESC) rn
  FROM entity e
  LEFT JOIN feat f
    ON e.user_id = f.user_id AND f.ts <= e.ts {ttl_pred}
)
SELECT event_id, user_id, ts,
       CASE WHEN fts IS NULL THEN NULL ELSE value END AS view_value
FROM ranked WHERE rn = 1
"""


def _minhash_portable_oracle(
    num_hashes: int = 32, bands: int = 8, max_bucket_size: int = 1000,
    doc_filter: str = "TRUE",
) -> str:
    """SQL twin of minhash_dedup_pairs(portable=True): same (a, b)
    params, same 32-bit md5 base, same band strings, same hot-bucket
    cap — so the candidate set (not just the verified output) agrees
    cross-engine.  ``doc_filter`` restricts the corpus (the r14
    dedup_against_index as_of leg replays a historical sub-corpus;
    signatures are per-doc, so sub-corpus pairs equal full-corpus
    pairs among those docs while the bucket cap stays untriggered)."""
    from feast_spark.operators.docdedup import minhash_params

    rpb = num_hashes // bands
    seeds = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(num_hashes))
    )
    return f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array({_NORM_TEXT}, '\\s+') AS toks
  FROM documents WHERE ({doc_filter})
), sh AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      ELSE list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))
      END) AS shingles
  FROM tk
), post AS (
  SELECT doc_id AS doc, unnest(shingles) AS s FROM sh
), h AS (
  SELECT doc, CAST(CONCAT('0x', substr(md5(s), 1, 8)) AS BIGINT) AS hv
  FROM post
), seeds(i, a, b) AS (
  VALUES {seeds}
), sig AS (
  SELECT doc, i, MIN((a * hv + b) % 2147483647) AS mh
  FROM h CROSS JOIN seeds GROUP BY doc, i
), bd0 AS (
  SELECT doc, i // {rpb} AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sigs
  FROM sig GROUP BY doc, i // {rpb}
), bd AS (
  SELECT * FROM bd0
  QUALIFY COUNT(*) OVER (PARTITION BY band, sigs) <= {max_bucket_size}
), cand AS (
  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
  FROM bd a JOIN bd b ON a.band = b.band AND a.sigs = b.sigs AND a.doc < b.doc
), ver AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS common,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, common / (na + nb - common) AS jaccard
FROM ver WHERE common / (na + nb - common) >= 0.5
"""


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """SQL twin of graph.pagerank(max_iter=iters, tol=None) over the
    supplier<->customer trade graph: the power iteration unrolled as
    chained CTEs, with the operator's exact FP op order — deg as a
    summed double, share = rank/deg, base = ((1 - d) + d*dangling)
    * teleport, contributions summed per dst — so both engines agree
    to the last ulp before ROUND(.., 6).  (Dangling mass is
    structurally 0 here — both arc directions exist — but the term is
    kept so the oracle mirrors the operator, not the dataset.)"""
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT l_suppkey AS s, o_custkey + 1000000 AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
), deg AS (
  SELECT src, SUM(1.0) AS deg FROM edges GROUP BY src
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), r0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    for k in range(1, iters + 1):
        sql += f""", d{k} AS (
  SELECT COALESCE(SUM(rank), 0.0) AS m FROM r{k - 1}
  WHERE node NOT IN (SELECT src FROM deg)
), c{k} AS (
  SELECT e.dst AS node, SUM(r.rank / d.deg) AS inm
  FROM edges e
  JOIN r{k - 1} r ON e.src = r.node
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
), r{k} AS (
  SELECT nd.node,
         ((1.0 - {damping}) + {damping} * (SELECT m FROM d{k}))
           * (1.0 / (SELECT n FROM nn))
         + {damping} * COALESCE(ct.inm, 0.0) AS rank
  FROM nodes nd LEFT JOIN c{k} ct ON nd.node = ct.node
)"""
    sql += f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{iters}
"""
    return sql


def _dup_groups_oracle() -> str:
    """SQL twin of resolve_dup_groups over the portable MinHash pairs:
    the recursive CTE computes the full transitive closure (min
    reachable id per node — exactly the component labels the
    large-star/small-star contraction converges to), then documents
    whose id is not their component's min are dropped."""
    return f"""
WITH RECURSIVE
pairs AS ({_minhash_portable_oracle()}),
e(u, v) AS (
  SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT reach.node, e.v FROM reach JOIN e ON e.u = reach.r
),
losers AS (
  SELECT node FROM (
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
  ) WHERE node <> component
)
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (SELECT node FROM losers)
"""


def _cos_sql(a: str, b: str) -> str:
    """Sequential-fold cosine — bit-identical to feast_spark's
    zip_with/aggregate dot (both engines fold left-to-right)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
        f" / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x * x))))"
    )


def _l2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _ann_lsh_oracle(
    dims: int = 64, planes: int = 12, probe_hamming: int = 2, k: int = 10
) -> str:
    """SQL twin of lsh_ann_topk: the deterministic ±1 hyperplanes are
    embedded as literal lists, so signatures — and therefore the
    candidate set — agree cross-engine."""
    from feast_spark.operators.similarity import hyperplane_sign

    terms = []
    for p in range(planes):
        h = ", ".join(str(hyperplane_sign(p, d)) for d in range(dims))
        dotp = f"list_sum(list_transform(list_zip(e, [{h}]), p -> p[1] * p[2]))"
        terms.append(f"(CASE WHEN {dotp} > 0 THEN {1 << p} ELSE 0 END)")
    sig_expr = "\n      + ".join(terms)
    return f"""
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), sig AS (
  SELECT vec_id, e,
    CAST({sig_expr} AS BIGINT) AS s
  FROM ac
), q AS (
  SELECT * FROM sig WHERE vec_id < 5
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_cos_sql('q.e', 'c.e')}, 4) AS cos
  FROM q, sig c
  WHERE c.vec_id <> q.vec_id
    AND bit_count(xor(q.s, c.s)) <= {probe_hamming}
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _ann_ivf_oracle(n_centroids: int = 16, n_probe: int = 4, k: int = 10) -> str:
    """SQL twin of ivf_ann_topk with the md5-selected quantizer: the
    centroid set, cell assignment (argmin L2, ties -> lowest cell),
    probe set, and cosine re-rank are all re-derived in SQL."""
    return f"""
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
         e AS ce
  FROM ac
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {n_centroids}
), corp AS (
  SELECT vec_id, e, cell FROM (
    SELECT c.vec_id, c.e, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY {_l2_sql('c.e', 'ct.ce')}, ct.cell) AS rn
    FROM ac c CROSS JOIN cent ct
  ) t WHERE rn = 1
), qp AS (
  SELECT vec_id AS query_id, e AS qe, cell FROM (
    SELECT qv.vec_id, qv.e, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                              ORDER BY {_l2_sql('qv.e', 'ct.ce')}, ct.cell) AS rn
    FROM ac qv CROSS JOIN cent ct WHERE qv.vec_id < 5
  ) t WHERE rn <= {n_probe}
), cand AS (
  SELECT qp.query_id, corp.vec_id AS neighbor_id,
         ROUND({_cos_sql('qp.qe', 'corp.e')}, 4) AS cos
  FROM qp JOIN corp USING (cell)
  WHERE corp.vec_id <> qp.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _semdedup_oracle(
    n_centroids: int = 16, cap: int = 40, threshold: float = 0.3
) -> str:
    """SQL twin of semantic_dedup_pairs with the md5-selected frozen
    quantizer: centroid set, cell assignment (argmin L2, ties ->
    lowest cell), the max_cluster_size cap (over-cap cells dropped
    whole, the QUALIFY mirror of the Spark count-window filter),
    within-cell (id_a < id_b) pair expansion, and the exact-cosine
    verify are all re-derived in SQL."""
    cos = _cos_sql("a.e", "b.e")
    return f"""
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
         e AS ce
  FROM ac
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {n_centroids}
), corp AS (
  SELECT vec_id, e, cell FROM (
    SELECT c.vec_id, c.e, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY {_l2_sql('c.e', 'ct.ce')}, ct.cell) AS rn
    FROM ac c CROSS JOIN cent ct
  ) t WHERE rn = 1
  QUALIFY COUNT(*) OVER (PARTITION BY cell) <= {cap}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cos}, 6) AS cos
FROM corp a JOIN corp b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE ROUND({cos}, 6) >= {threshold}
"""


def _ivfpq_oracle(
    n_centroids: int = 8,
    m_subspaces: int = 8,
    sub: int = 8,
    k_codes: int = 16,
    n_probe: int = 3,
    k: int = 10,
    n_queries: int = 5,
    corpus_filter: str = "",
) -> str:
    """SQL twin of the persisted IVFPQ index with md5-frozen models:
    re-derives the coarse quantizer AND the per-subspace codebooks
    (pq.md5_codebooks: the rank-j md5-selected vector's m-th slice is
    code j of book m), re-encodes the corpus (per-subspace argmin L2,
    ties -> lowest code), probes each query's n_probe nearest cells,
    and sums the per-subspace ADC terms.  Ranks are over UNROUNDED
    ADC (+ neighbor-id tie-break) exactly as the Spark side ranks —
    rounding only the displayed distance.  ``corpus_filter`` restricts
    which vectors the index CONTAINS (the time-travel leg: frozen
    models are md5-derived from the full table on both sides, so only
    the stored corpus differs at a historical commit)."""
    sel_n = max(n_centroids, k_codes)

    def _sl(e: str, mref: str) -> str:
        return f"list_slice({e}, {mref} * {sub} + 1, ({mref} + 1) * {sub})"

    return f"""
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), sel AS (
  SELECT e, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS r
  FROM ac
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {sel_n}
), cent AS (
  SELECT CAST(r AS INT) AS cell, e AS ce FROM sel WHERE r < {n_centroids}
), cb AS (
  SELECT CAST(ms.m AS INT) AS m, CAST(sel.r AS INT) AS code,
         list_slice(sel.e, ms.m * {sub} + 1, (ms.m + 1) * {sub}) AS cv
  FROM sel CROSS JOIN (SELECT unnest(range(0, {m_subspaces})) AS m) ms
  WHERE sel.r < {k_codes}
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT c.vec_id, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
                              ORDER BY {_l2_sql('c.e', 'ct.ce')}, ct.cell) AS rn
    FROM ac c CROSS JOIN cent ct {corpus_filter}
  ) t WHERE rn = 1
), enc AS (
  SELECT vec_id, m, code FROM (
    SELECT c.vec_id, cb.m, cb.code,
           ROW_NUMBER() OVER (
             PARTITION BY c.vec_id, cb.m
             ORDER BY {_l2_sql(_sl('c.e', 'cb.m'), 'cb.cv')}, cb.code) AS rn
    FROM ac c CROSS JOIN cb
  ) t WHERE rn = 1
), qp AS (
  SELECT vec_id AS qid, e AS qe, cell FROM (
    SELECT qv.vec_id, qv.e, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                              ORDER BY {_l2_sql('qv.e', 'ct.ce')}, ct.cell) AS rn
    FROM ac qv CROSS JOIN cent ct WHERE qv.vec_id < {n_queries}
  ) t WHERE rn <= {n_probe}
), adc AS (
  SELECT qp.qid, a.vec_id AS nid,
         SUM({_l2_sql(_sl('qp.qe', 'enc.m'), 'cb.cv')}) AS dist
  FROM qp
  JOIN assign a USING (cell)
  JOIN enc ON enc.vec_id = a.vec_id
  JOIN cb ON cb.m = enc.m AND cb.code = enc.code
  GROUP BY qp.qid, a.vec_id
), ranked AS (
  SELECT qid, nid, dist,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
  FROM adc
)
SELECT qid AS query_id, nid AS neighbor_id, ROUND(dist, 4) AS adc_dist,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {k}
"""


def _hybrid_oracle(
    doc_filter: str = "TRUE", vec_filter: str = "TRUE",
    leg: str | None = None,
) -> str:
    """SQL twin of the hybrid lexical+vector retrieval: full-corpus
    BM25 top-50 (the _bm25_oracle math), exact cosine top-50 against
    the _QVEC_SQL double literal, RRF fusion at rrf_k=60.  One oracle,
    two Spark counterparts: the inline hybrid_topk (rotated, pinned in
    tests/test_rotated_relational.py) and the driver-gated
    hybrid_index_topk at n_probe=all, whose persisted-index channels
    must land exactly where this corpus scan does.

    ``doc_filter``/``vec_filter`` restrict the corpus (the r14 as_of
    leg replays a historical sub-corpus — corpus stats included, so
    the filter sits inside the stats CTEs); ``leg`` prepends a literal
    leg column for two-leg UNION gates."""
    leg_col = f"'{leg}' AS leg, " if leg else ""
    return f"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array({_NORM_TEXT}, '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0 AND ({doc_filter})
),
lens AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array({_NORM_TEXT}, '\\s+')) END
           AS len_d
  FROM documents WHERE ({doc_filter})
),
stats AS (SELECT count(*) AS n_docs, avg(len_d) AS avg_len FROM lens),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tk
  WHERE term IN ('merge', 'spark') GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - dfreq.df_t + 0.5)
                 / (dfreq.df_t + 0.5) + 1.0)
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75
                  + 0.75 * lens.len_d / stats.avg_len)) ) AS bm25
  FROM tf
  JOIN dfreq USING (term)
  JOIN lens USING (doc_id)
  CROSS JOIN stats
  GROUP BY 1
),
lexk AS (
  SELECT doc_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
           AS lex_rank
  FROM (SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT 50) t
),
ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE ({vec_filter})
),
qv AS (SELECT {_QVEC_SQL} AS e),
pairs AS (
  SELECT c.vec_id AS id,
         ROUND(list_sum(list_transform(list_zip(qv.e, c.e), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(qv.e, x -> x * x)))
            * sqrt(list_sum(list_transform(c.e, x -> x * x)))), 4) AS cos
  FROM ac c, qv WHERE c.vec_id <> -1
),
veck AS (
  SELECT id,
         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, id ASC) AS INTEGER)
           AS vec_rank
  FROM (SELECT id, cos FROM pairs ORDER BY cos DESC, id ASC LIMIT 50) t
),
fused AS (
  SELECT COALESCE(l.id, v.id) AS id, l.lex_rank, v.vec_rank,
         COALESCE(1.0 / (60 + l.lex_rank), 0.0)
         + COALESCE(1.0 / (60 + v.vec_rank), 0.0) AS rrf
  FROM lexk l FULL JOIN veck v ON l.id = v.id
)
SELECT {leg_col}id, lex_rank, vec_rank, rrf
FROM fused ORDER BY rrf DESC, id ASC LIMIT 10
"""


def _pii_scrub_oracle() -> str:
    """DuckDB mirror of q_pii_scrub, with the regexp_replace chain
    built from text.PII_PATTERNS itself so the oracle patterns are
    byte-identical to the Spark ones (no drift possible).  DuckDB
    needs the explicit 'g' flag (Java regexp_replace is global by
    default); single quotes inside patterns are SQL-doubled."""
    from feast_spark.functions.text import PII_PATTERNS

    expr = "t"
    for _name, pat, token in PII_PATTERNS:
        expr = (
            f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}',"
            f" '{token}', 'g')"
        )
    return f"""
WITH synth AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              || ' via https://crawl' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.org/p?u=' || CAST(doc_id AS VARCHAR)
              || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 250 AS VARCHAR)
              || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' card 4111 1111 1111 1111 call (415) 555-01'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS t
  FROM documents
)
SELECT doc_id, {expr} AS scrubbed FROM synth
"""


def _dsir_oracle(
    n_docs: int = 120, n_buckets: int = 512, lang: str = "de"
) -> str:
    """DuckDB twin of q_dsir_resample (operators/dsir.py): replays the
    full pipeline — hashed unigram+bigram md5 buckets, smoothed
    target/raw log-ratios, per-doc summed log weights, the md5-uniform
    Gumbel key with the same open-interval clamp — then selects the
    same top-``n_docs`` set.  Weight sums differ from Spark only by
    float summation order (~1e-12 relative, pinned in tests/
    test_dsir.py); the k-boundary key gap is orders of magnitude wider,
    so the selected set hashes identically."""
    bucket = f"CAST(CONCAT('0x', substr(md5(g), 1, 8)) AS BIGINT) % {n_buckets}"

    def cte(pred: str) -> str:
        # unigrams + bigrams over the normalized tokens, every
        # occurrence kept (bag semantics); blank/NULL docs contribute
        # nothing (unnest of NULL/[] emits no rows)
        return f"""
  SELECT doc_id, {bucket} AS bucket FROM (
    SELECT doc_id, unnest(
      CASE WHEN length(trim(text)) = 0 THEN []
           ELSE regexp_split_to_array({_NORM_TEXT}, '\\s+') END
      || CASE WHEN length(trim(text)) = 0 THEN []
           WHEN len(regexp_split_to_array({_NORM_TEXT}, '\\s+')) < 2 THEN []
           ELSE list_transform(
             range(1, len(regexp_split_to_array({_NORM_TEXT}, '\\s+'))),
             i -> array_to_string(
               regexp_split_to_array({_NORM_TEXT}, '\\s+')[i:i+1], ' '))
      END) AS g
    FROM documents {pred})
"""

    return f"""
WITH rb AS ({cte("")}),
tb AS ({cte(f"WHERE lang = '{lang}'")}),
hr AS (SELECT bucket, COUNT(*) AS cr FROM rb GROUP BY bucket),
ht AS (SELECT bucket, COUNT(*) AS ct FROM tb GROUP BY bucket),
tot AS (SELECT (SELECT SUM(cr) FROM hr) AS tr,
               (SELECT SUM(ct) FROM ht) AS tt),
doc AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM rb GROUP BY 1, 2),
ratio AS (
  SELECT COALESCE(hr.bucket, ht.bucket) AS bucket,
         ln((COALESCE(ct, 0) + 1.0) / (tt + {n_buckets}))
       - ln((COALESCE(cr, 0) + 1.0) / (tr + {n_buckets})) AS log_ratio
  FROM hr FULL OUTER JOIN ht ON hr.bucket = ht.bucket CROSS JOIN tot
),
w AS (
  SELECT r.doc_id,
         COALESCE(SUM(d.cnt * ratio.log_ratio), 0.0) AS log_weight
  FROM documents r
  LEFT JOIN doc d ON r.doc_id = d.doc_id
  LEFT JOIN ratio ON d.bucket = ratio.bucket
  GROUP BY r.doc_id
),
keyed AS (
  SELECT doc_id,
         log_weight - ln(-ln(LEAST(({_H32_ID} + 1.0) / 4294967296.0,
                                   1.0 - POWER(2.0, -33)))) AS key
  FROM w
),
sel AS (SELECT doc_id FROM keyed ORDER BY key DESC, doc_id ASC LIMIT {n_docs})
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN sel USING (doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        # two legs (r15): head_v2 = the re-run's PIT join (perturbed
        # entity frame, committed second — what the manifest-resolved
        # HEAD serves); asof_v1 = the full PIT join (committed first —
        # what FileSource(as_of=1) replays from the archived snapshot)
        "pit_join": (
            "SELECT 'head_v2' AS leg, * FROM (\n"
            + _PIT_ORACLE.format(
                ttl_pred="AND f.ts >= e.ts - INTERVAL 2 DAY",
                entity_pred="AND user_id % 5 <> 2",
            )
            + ")\nUNION ALL\nSELECT 'asof_v1' AS leg, * FROM (\n"
            + _PIT_ORACLE.format(
                ttl_pred="AND f.ts >= e.ts - INTERVAL 2 DAY",
                entity_pred="",
            )
            + ")"
        ),
        "pit_join_multiview": """
WITH entity AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
),
v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'click'),
rv AS (
  SELECT e.event_id, v.value, v.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY v.ts DESC) rn
  FROM entity e
  LEFT JOIN v ON e.user_id = v.user_id AND v.ts <= e.ts
             AND v.ts >= e.ts - INTERVAL 2 DAY
),
rc AS (
  SELECT e.event_id, c.value, c.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY c.ts DESC) rn
  FROM entity e
  LEFT JOIN c ON e.user_id = c.user_id AND c.ts <= e.ts
             AND c.ts >= e.ts - INTERVAL 7 DAY
)
SELECT e.event_id, e.user_id, e.ts,
       CASE WHEN rv.fts IS NULL THEN NULL ELSE rv.value END AS views__value,
       CASE WHEN rc.fts IS NULL THEN NULL ELSE rc.value END AS clicks__value
FROM entity e
LEFT JOIN rv ON rv.event_id = e.event_id AND rv.rn = 1
LEFT JOIN rc ON rc.event_id = e.event_id AND rc.rn = 1
""",
        "dsir_resample": _dsir_oracle(),
        # r16: classifies the diff between two derived commits of the
        # documents table (version predicates mirror q_dataset_diff);
        # IS DISTINCT FROM keeps NULL-text and all-uppercase docs in
        # the 'same' bucket, like the fingerprint comparison
        "dataset_diff": """
WITH a AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3
),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 4
),
j AS (
  SELECT a.doc_id AS ad, b.doc_id AS bd, a.text AS at, b.text AS bt
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT COALESCE(ad, bd) AS doc_id,
       CASE WHEN ad IS NULL THEN 'added'
            WHEN bd IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM j
WHERE ad IS NULL OR bd IS NULL OR at IS DISTINCT FROM bt
""",
        "resample_grid": """
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600)::BIGINT * 3600 AS b
  FROM events WHERE ts IS NOT NULL
),
per_bucket AS (
  SELECT user_id, b,
         SUM(value) AS total,
         COUNT(value) AS n,
         LAST(value ORDER BY ts, value) AS last_v
  FROM ev GROUP BY user_id, b
),
bounds AS (
  SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM per_bucket
  GROUP BY user_id
),
grid AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, 3600)) AS b FROM bounds
),
joined AS (
  SELECT g.user_id, g.b, p.total, p.n, p.last_v
  FROM grid g LEFT JOIN per_bucket p USING (user_id, b)
)
SELECT user_id,
       CAST(to_timestamp(b) AS TIMESTAMP) AS bucket_ts,
       ROUND(LAST_VALUE(total IGNORE NULLS) OVER w, 6) AS total,
       LAST_VALUE(n IGNORE NULLS) OVER w AS n,
       ROUND(LAST_VALUE(last_v IGNORE NULLS) OVER w, 6) AS last_v
FROM joined
WINDOW w AS (PARTITION BY user_id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        "retrieval_ndcg": """
WITH j AS (
  SELECT n_nationkey, s_suppkey, s_acctbal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
results AS (
  SELECT n_nationkey AS query_id, s_suppkey AS doc_id,
         ROW_NUMBER() OVER (PARTITION BY n_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank
  FROM j
),
qrels AS (
  SELECT n_nationkey AS query_id, s_suppkey AS doc_id,
         CASE WHEN s_acctbal > 8000 THEN 2.0 ELSE 1.0 END AS g
  FROM j WHERE s_acctbal > 5000
),
dcg AS (
  SELECT r.query_id, SUM(q.g / LOG2(r.rank + 1)) AS v
  FROM results r JOIN qrels q USING (query_id, doc_id)
  WHERE r.rank <= 10 GROUP BY r.query_id
),
ideal AS (
  SELECT query_id, g,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY g DESC, doc_id ASC) AS ir
  FROM qrels
),
idcg AS (
  SELECT query_id, SUM(g / LOG2(ir + 1)) AS v
  FROM ideal WHERE ir <= 10 GROUP BY query_id
)
SELECT a.query_id,
       ROUND(COALESCE(dcg.v, 0), 6) AS dcg,
       ROUND(COALESCE(idcg.v, 0), 6) AS idcg,
       ROUND(CASE WHEN COALESCE(idcg.v, 0) > 0
                  THEN COALESCE(dcg.v, 0) / idcg.v ELSE 0 END, 6) AS ndcg
FROM (SELECT DISTINCT query_id FROM qrels) a
LEFT JOIN dcg USING (query_id) LEFT JOIN idcg USING (query_id)
""",
        "pii_scrub": _pii_scrub_oracle(),
        "dedup_exact": f"""
WITH fp AS (
  SELECT doc_id, lang, n_chars, {_NORM_MD5} AS f FROM documents
)
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) rn
  FROM fp
) WHERE rn = 1
""",
        "ann_topk_cosine": """
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), q AS (
  SELECT * FROM ac WHERE vec_id < 5
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
            * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM q, ac c
  WHERE c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       SUM(l_extendedprice) AS sum_base_price,
       SUM(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
       AVG(l_quantity) AS avg_qty,
       AVG(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "doc_chunks": """
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(1, length(text) - 20), 80))
           AS chunk_start
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id,
       CAST((chunk_start - 1) // 80 AS BIGINT) AS chunk_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       substring(text, chunk_start, 100) AS chunk,
       CAST(length(substring(text, chunk_start, 100)) AS BIGINT)
         AS n_chunk_chars
FROM s
""",
        "window_agg_hourly": """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
)
SELECT user_id,
       COUNT(value) AS n_events,
       SUM(value) AS sum_value,
       AVG(value) AS avg_value,
       date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS event_ts
FROM e
GROUP BY user_id, date_trunc('hour', ts)
""",
        "rollup_pit_join": """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type
  FROM events
), roll AS (
  SELECT user_id,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS fts,
         COUNT(value) AS n_events, SUM(value) AS sum_value
  FROM e WHERE event_type = 'view'
  GROUP BY user_id, date_trunc('hour', ts)
), entity AS (
  SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'
), ranked AS (
  SELECT en.event_id, en.user_id, en.ts,
         r.n_events, r.sum_value, r.fts,
         ROW_NUMBER() OVER (PARTITION BY en.event_id
                            ORDER BY r.fts DESC) AS rn
  FROM entity en
  LEFT JOIN roll r
    ON en.user_id = r.user_id
   AND r.fts <= en.ts
   AND r.fts >= en.ts - INTERVAL 2 DAYS
)
SELECT event_id, user_id, ts,
       CASE WHEN fts IS NULL THEN NULL ELSE n_events END AS n_views_1h,
       CASE WHEN fts IS NULL THEN NULL ELSE sum_value END AS sum_views_1h
FROM ranked WHERE rn = 1
""",
        "rolling_7d": """
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
)
SELECT event_id, user_id, ts, value,
       SUM(value) OVER w AS sum_7d,
       COUNT(value) OVER w AS n_7d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
""",
        "sessionize": """
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
), b AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 3600
              THEN 1 ELSE 0 END AS brk
  FROM e
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM b
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY 1, 2
""",
        # with_shingles twin for n=5: distinct word 5-grams of the
        # normalized text; < 5 tokens -> one whole-text shingle
        "contamination": """
WITH tk AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(trim(text)) = 0
              THEN []::VARCHAR[]
              ELSE regexp_split_to_array(
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                     '\\s+')
         END AS toks
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(toks) < 5
         THEN [array_to_string(toks, ' ')]
         ELSE list_transform(range(1, len(toks) - 3),
                             i -> array_to_string(toks[i:i+4], ' '))
    END)) AS sh
  FROM tk
), tr AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 3 <> 0),
ev AS (SELECT doc_id, sh FROM sh WHERE doc_id % 3 = 0)
SELECT ev.doc_id,
       count(*)::BIGINT AS total_ngrams,
       sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS contaminated_ngrams,
       sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*)
           AS contamination_frac
FROM ev LEFT JOIN tr ON ev.sh = tr.sh
GROUP BY ev.doc_id
""",
        "text_quality": f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(length(text) AS BIGINT) AS n_chars_q,
         length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
           AS punct
  FROM documents
), f AS (
  SELECT doc_id, n_chars_q,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, s -> length(s))) / len(toks)
              ELSE 0.0 END AS mean_token_len,
         CASE WHEN n_chars_q > 0 THEN punct / n_chars_q ELSE 0.0 END
           AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, s -> s IN ({_SW_EN}))) / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / len(toks)
              ELSE 0.0 END AS distinct_ratio
  FROM t
)
SELECT doc_id, n_chars_q, n_tokens, mean_token_len, punct_ratio,
       stopword_ratio, distinct_ratio,
       (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
         * 0.25
       + stopword_ratio * 0.25
       + distinct_ratio * 0.25
       + (1.0 - punct_ratio) * 0.25 AS quality_score
FROM f
""",
        "lang_id": f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_EN}))) / len(toks) ELSE 0.0 END AS s_en,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_ES}))) / len(toks) ELSE 0.0 END AS s_es,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_DE}))) / len(toks) ELSE 0.0 END AS s_de,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_FR}))) / len(toks) ELSE 0.0 END AS s_fr
  FROM t
)
SELECT doc_id, CASE
  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
  WHEN s_es > s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
  WHEN s_de > s_en AND s_de > s_es AND s_de >= s_fr THEN 'de'
  ELSE 'fr' END AS lang_pred
FROM s
""",
        "repetition_stats": f"""
WITH tk AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(trim(text)) = 0
              THEN []::VARCHAR[]
              ELSE regexp_split_to_array({_NORM_TEXT}, '\\s+')
         END AS toks
  FROM documents
),
uni AS (SELECT doc_id, unnest(toks) AS g FROM tk),
ucnt AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
uagg AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_token_frac
  FROM ucnt GROUP BY 1
),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                             i -> array_to_string(toks[i:i+1], ' '))
         ELSE [] END) AS g
  FROM tk
),
bcnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bagg AS (
  SELECT doc_id,
         max(c)::DOUBLE / sum(c) AS top_bigram_frac,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)
             AS dup_bigram_frac
  FROM bcnt GROUP BY 1
)
SELECT d.doc_id,
       coalesce(u.top_token_frac, 0.0) AS top_token_frac,
       coalesce(b.top_bigram_frac, 0.0) AS top_bigram_frac,
       coalesce(b.dup_bigram_frac, 0.0) AS dup_bigram_frac
FROM documents d
LEFT JOIN uagg u USING (doc_id)
LEFT JOIN bagg b USING (doc_id)
""",
        "substr_dedup": """
WITH h AS (
  SELECT doc_id,
    CASE WHEN length(text) < 24
      THEN [CAST(CONCAT('0x', substr(md5(text), 1, 8)) AS BIGINT)]
      ELSE list_transform(range(1, length(text) - 24 + 2),
           i -> CAST(CONCAT('0x', substr(md5(substr(text, i, 24)), 1, 8))
                AS BIGINT))
    END AS hs
  FROM documents
), sel AS (
  SELECT doc_id, unnest(
    list_transform(range(1, greatest(len(hs) - 10, 0) + 2),
      j -> {'pos': j - 2 + list_position(hs[j:j+9], list_min(hs[j:j+9])),
            'fp': list_min(hs[j:j+9])})) AS s
  FROM h
), fps AS (
  SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM sel
), dup AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
), per_doc AS (
  SELECT f.doc_id,
         COUNT(*) AS n_fps,
         SUM(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
  FROM fps f LEFT JOIN dup d ON f.fp = d.fp
  GROUP BY f.doc_id
)
SELECT doc.doc_id,
       CAST(COALESCE(p.n_fps, 0) AS BIGINT) AS n_fps,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_fps,
       CASE WHEN COALESCE(p.n_fps, 0) > 0
            THEN CAST(p.n_dup AS DOUBLE) / CAST(p.n_fps AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM documents doc LEFT JOIN per_doc p ON doc.doc_id = p.doc_id
""",
        "json_props": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
        # The full build_corpus chain replayed as one multi-CTE query:
        # exact dedup -> quality/lang featurize+filter -> portable
        # MinHash/LSH pairs -> recursive-CTE closure -> keep min id ->
        # 8-gram decontamination vs the doc_id%29 eval slice -> md5
        # hash split -> per-(source, shard) budget mix.
        "corpus_pipeline": """
WITH RECURSIVE
dd AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
           ROW_NUMBER() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) ORDER BY doc_id) rn
    FROM documents
  ) WHERE rn = 1
), t AS (
  SELECT doc_id, text, source,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(length(text) AS BIGINT) AS n_chars_q,
         length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
           AS punct
  FROM dd
), f AS (
  SELECT doc_id, text, source, toks, n_chars_q,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN n_chars_q > 0 THEN punct / n_chars_q ELSE 0.0 END
           AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, s -> s IN ('the','a','and','of','to','in','is','it'))) / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / len(toks)
              ELSE 0.0 END AS distinct_ratio
  FROM t
), q AS (
  SELECT doc_id, text, source, toks, n_tokens,
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
           * 0.25
         + stopword_ratio * 0.25
         + distinct_ratio * 0.25
         + (1.0 - punct_ratio) * 0.25 AS quality_score
  FROM f
), s AS (
  SELECT doc_id, text, source, n_tokens, quality_score,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) / len(toks) ELSE 0.0 END AS s_en,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','los','se'))) / len(toks) ELSE 0.0 END AS s_es,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ('der','die','und','das','ist','von','mit','den'))) / len(toks) ELSE 0.0 END AS s_de,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ('le','la','de','et','les','des','un','une'))) / len(toks) ELSE 0.0 END AS s_fr
  FROM q
), clean AS (
  SELECT doc_id, text, source, n_tokens, quality_score,
    CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         WHEN s_es > s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
         WHEN s_de > s_en AND s_de > s_es AND s_de >= s_fr THEN 'de'
         ELSE 'fr' END AS lang_pred
  FROM s
  WHERE quality_score >= 0.5 AND n_tokens BETWEEN 10 AND 5000
), tk AS (
  SELECT doc_id, regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+') AS toks
  FROM clean
), sh AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      ELSE list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))
      END) AS shingles
  FROM tk
), post AS (
  SELECT doc_id AS doc, unnest(shingles) AS s FROM sh
), h AS (
  SELECT doc, CAST(CONCAT('0x', substr(md5(s), 1, 8)) AS BIGINT) AS hv
  FROM post
), seeds(i, a, b) AS (
  VALUES (0, 176754203, 42560440), (1, 1000676753, 594932982), (2, 908095735, 71666532), (3, 896336333, 662989442), (4, 241247635, 461502928), (5, 391441865, 34778318), (6, 133072879, 534045436), (7, 901094789, 238077914), (8, 340112395, 705377000), (9, 397905153, 367232934), (10, 899253735, 282367380), (11, 881784893, 749762610), (12, 879663491, 70219520), (13, 142072633, 652862846), (14, 318196447, 865403692), (15, 1030877685, 968547210), (16, 439334395, 719660568), (17, 599570545, 267593302), (18, 481933015, 303205316), (19, 907242157, 529748450), (20, 192473459, 999202864), (21, 631833769, 202943022), (22, 938387919, 762679132), (23, 702825061, 562641722), (24, 542512107, 293225800), (25, 266051553, 876597510), (26, 562037703, 932343284), (27, 93411613, 829945746), (28, 711923043, 392328544), (29, 485452313, 748288734), (30, 229876927, 1013548940), (31, 42176213, 893839082)
), sig AS (
  SELECT doc, i, MIN((a * hv + b) % 2147483647) AS mh
  FROM h CROSS JOIN seeds GROUP BY doc, i
), bd0 AS (
  SELECT doc, i // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sigs
  FROM sig GROUP BY doc, i // 4
), bd AS (
  SELECT * FROM bd0
  QUALIFY COUNT(*) OVER (PARTITION BY band, sigs) <= 1000
), cand AS (
  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
  FROM bd a JOIN bd b ON a.band = b.band AND a.sigs = b.sigs AND a.doc < b.doc
), ver AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS common,
         len(sa.shingles) AS na, len(sb.shingles) AS nb
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
), pairs AS (
  SELECT id_a, id_b FROM ver WHERE common / (na + nb - common) >= 0.5
),
e(u, v) AS (
  SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT u, u FROM e
  UNION
  SELECT reach.node, e.v FROM reach JOIN e ON e.u = reach.r
),
losers AS (
  SELECT node FROM (
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
  ) WHERE node <> component
),
surv AS (
  SELECT * FROM clean WHERE doc_id NOT IN (SELECT node FROM losers)
),
tr8 AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks8) < 8 THEN [array_to_string(toks8, ' ')]
      ELSE list_transform(range(1, len(toks8) - 6),
                          i -> array_to_string(toks8[i:i+7], ' '))
      END) AS shingles
  FROM (
    SELECT doc_id, regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+') AS toks8
    FROM surv
  )
), trx AS (
  SELECT doc_id AS train_id, unnest(shingles) AS s FROM tr8
), trf AS (
  SELECT train_id, s FROM trx
  QUALIFY COUNT(*) OVER (PARTITION BY s) <= 1000
), ev8 AS (
  SELECT
    list_distinct(
      CASE WHEN len(toks8) < 8 THEN [array_to_string(toks8, ' ')]
      ELSE list_transform(range(1, len(toks8) - 6),
                          i -> array_to_string(toks8[i:i+7], ' '))
      END) AS shingles
  FROM (
    SELECT regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+') AS toks8
    FROM documents WHERE doc_id % 29 = 0
  )
), evs AS (
  SELECT DISTINCT unnest(shingles) AS s FROM ev8
), hits AS (
  SELECT DISTINCT train_id FROM trf JOIN evs USING (s)
), decont AS (
  SELECT * FROM surv WHERE doc_id NOT IN (SELECT train_id FROM hits)
), splitd AS (
  SELECT *, CASE WHEN b < 80 THEN 'train'
                 WHEN b < 90 THEN 'val'
                 ELSE 'test' END AS split
  FROM (
    SELECT *, CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 100 AS b
    FROM decont
  )
), mixbase AS (
  SELECT doc_id, source, lang_pred, n_tokens, quality_score, split,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS ord
  FROM splitd WHERE source IN ('src0', 'src1', 'src2', 'src3')
), mixc AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CASE source WHEN 'src0' THEN 200 WHEN 'src1' THEN 100
                     WHEN 'src2' THEN 25000 WHEN 'src3' THEN 300 END
           AS budget
  FROM mixbase
)
SELECT doc_id, source, lang_pred, n_tokens, quality_score, split
FROM mixc WHERE cum <= budget
""",
        "shipping_priority": """
SELECT l_orderkey,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        "dup_groups_resolved": _dup_groups_oracle(),
        "pack_sequences": f"""
WITH d AS (
  SELECT doc_id, {_TOK_CNT} AS n_tokens,
         {_H32_ID} % 8 AS shard, {_MD5_ID} AS ord
  FROM documents
), c AS (
  SELECT doc_id, shard, ord,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // 512 AS bin
  FROM d
)
SELECT doc_id, shard, CONCAT(shard, '-', bin) AS seq_id,
       ROW_NUMBER() OVER (PARTITION BY shard, bin ORDER BY ord, doc_id) - 1
         AS seq_pos
FROM c
""",
        "customers_no_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
""",
        "weighted_sample": f"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         -ln(({_H32_ID} + 1.0) / 4294967296.0) / n_chars AS key
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
) ORDER BY key, doc_id LIMIT 100
""",
        "corpus_clean": f"""
WITH dd AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY {_NORM_MD5} ORDER BY doc_id) rn
    FROM documents
  ) WHERE rn = 1
), t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(length(text) AS BIGINT) AS n_chars_q,
         length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
           AS punct
  FROM dd
), f AS (
  SELECT doc_id, toks, n_chars_q,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN n_chars_q > 0 THEN punct / n_chars_q ELSE 0.0 END
           AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, s -> s IN ({_SW_EN}))) / len(toks)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) / len(toks)
              ELSE 0.0 END AS distinct_ratio
  FROM t
), q AS (
  SELECT doc_id, toks, n_tokens,
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
           * 0.25
         + stopword_ratio * 0.25
         + distinct_ratio * 0.25
         + (1.0 - punct_ratio) * 0.25 AS quality_score
  FROM f
), s AS (
  SELECT doc_id, n_tokens, quality_score,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_EN}))) / len(toks) ELSE 0.0 END AS s_en,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_ES}))) / len(toks) ELSE 0.0 END AS s_es,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_DE}))) / len(toks) ELSE 0.0 END AS s_de,
    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> x IN ({_SW_FR}))) / len(toks) ELSE 0.0 END AS s_fr
  FROM q
)
SELECT doc_id, CASE
  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
  WHEN s_es > s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
  WHEN s_de > s_en AND s_de > s_es AND s_de >= s_fr THEN 'de'
  ELSE 'fr' END AS lang_pred,
  n_tokens, quality_score
FROM s
WHERE quality_score >= 0.5 AND n_tokens BETWEEN 10 AND 5000
""",
        "table_profile": """
SELECT 'user_id' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT user_id) AS n_distinct,
       CAST(MIN(user_id) AS DOUBLE) AS min_num,
       CAST(MAX(user_id) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM events
UNION ALL
SELECT 'event_type', COUNT(*),
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT event_type),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(event_type), MAX(event_type)
FROM events
UNION ALL
SELECT 'value', COUNT(*),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT value),
       CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM events
""",
        "attribution_join": """
WITH p AS (
  SELECT event_id AS purchase_id, user_id,
         CAST(ts AS TIMESTAMP) AS win_start,
         CAST(ts AS TIMESTAMP) + INTERVAL 1 DAY AS win_end
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'view'
), agg AS (
  SELECT p.purchase_id,
         COUNT(*) AS n_views,
         SUM(v.value) AS view_value
  FROM v JOIN p
    ON v.user_id = p.user_id
   AND v.ts >= p.win_start AND v.ts < p.win_end
  GROUP BY p.purchase_id
)
SELECT p.purchase_id, p.user_id,
       COALESCE(agg.n_views, 0) AS n_views,
       agg.view_value
FROM p LEFT JOIN agg ON p.purchase_id = agg.purchase_id
""",
        "stratified_sample": """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 20
""",
        "sql_source": """
SELECT o_custkey AS customer_id, o_orderstatus,
       SUM(o_totalprice) AS total_spend,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey, o_orderstatus
""",
        "corpus_mix": f"""
WITH d AS (
  SELECT doc_id, source, {_TOK_CNT} AS n_tokens,
         {_H32_ID} % 4 AS shard, {_MD5_ID} AS ord
  FROM documents
  WHERE source IN ('src0', 'src1', 'src2', 'src3')
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CASE source WHEN 'src0' THEN 200 WHEN 'src1' THEN 100
                     WHEN 'src2' THEN 25000 WHEN 'src3' THEN 300 END
           AS budget
  FROM d
)
SELECT doc_id, source, n_tokens FROM c WHERE cum <= budget
""",
        "funnel": """
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
), fv AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM e GROUP BY user_id
), fc AS (
  SELECT e.user_id,
         MIN(CASE WHEN e.event_type = 'click' AND e.ts >= fv.first_view
                  THEN e.ts END) AS first_click
  FROM e JOIN fv USING (user_id) GROUP BY e.user_id
), fp AS (
  SELECT e.user_id,
         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= fc.first_click
                  THEN e.ts END) AS first_purchase
  FROM e JOIN fc USING (user_id) GROUP BY e.user_id
)
SELECT fv.user_id, fv.first_view, fc.first_click, fp.first_purchase
FROM fv JOIN fc USING (user_id) JOIN fp USING (user_id)
""",
        "minhash_lsh_dedup": _minhash_portable_oracle(),
        "pagerank": _pagerank_oracle(),
        "dedup_against_index": f"""
SELECT 'head' AS leg, id_a, id_b, jaccard
FROM ({_minhash_portable_oracle()})
WHERE id_a % 10 = 0 OR id_b % 10 = 0
UNION ALL
SELECT 'asof_build' AS leg, id_a, id_b, jaccard
FROM ({_minhash_portable_oracle(
    doc_filter="doc_id % 10 = 0 OR doc_id % 3 <> 1")})
WHERE id_a % 10 = 0 OR id_b % 10 = 0
""",
        "drift_psi": """
WITH r AS (
  SELECT event_type,
         CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 9
              ELSE CAST(FLOOR((value - 0.0) / ((100.0 - 0.0) / 8)) AS INT) + 1
         END AS b
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
    AND value IS NOT NULL
), c AS (
  SELECT event_type,
         CASE WHEN value < 0.0 THEN 0 WHEN value >= 100.0 THEN 9
              ELSE CAST(FLOOR((value - 0.0) / ((100.0 - 0.0) / 8)) AS INT) + 1
         END AS b
  FROM events
  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
    AND value IS NOT NULL
), grains AS (
  SELECT DISTINCT event_type FROM r
  INTERSECT
  SELECT DISTINCT event_type FROM c
), bins AS (
  SELECT CAST(range AS INT) AS b FROM range(0, 10)
), gb AS (
  SELECT g.event_type, bins.b FROM grains g CROSS JOIN bins
), rc AS (
  SELECT event_type, b, COUNT(*) AS n FROM r GROUP BY 1, 2
), cc AS (
  SELECT event_type, b, COUNT(*) AS n FROM c GROUP BY 1, 2
), j AS (
  SELECT gb.event_type, gb.b,
         COALESCE(rc.n, 0) AS rn, COALESCE(cc.n, 0) AS cn
  FROM gb
  LEFT JOIN rc ON gb.event_type = rc.event_type AND gb.b = rc.b
  LEFT JOIN cc ON gb.event_type = cc.event_type AND gb.b = cc.b
), tots AS (
  SELECT event_type, SUM(rn) AS rtot, SUM(cn) AS ctot
  FROM j GROUP BY event_type
), props AS (
  SELECT j.event_type, j.b,
         GREATEST(rn * 1.0 / t.rtot, 1e-06) AS p,
         GREATEST(cn * 1.0 / t.ctot, 1e-06) AS q,
         t.rtot, t.ctot
  FROM j JOIN tots t ON j.event_type = t.event_type
), cdf AS (
  SELECT event_type, b, p, q, rtot, ctot,
         SUM(p - q) OVER (PARTITION BY event_type ORDER BY b) AS d
  FROM props
)
SELECT event_type,
       CAST(MAX(rtot) AS BIGINT) AS ref_n,
       CAST(MAX(ctot) AS BIGINT) AS cur_n,
       ROUND(SUM((p - q) * ln(p / q)), 6) AS psi,
       ROUND(SUM(0.5 * p * ln(2 * p / (p + q))
               + 0.5 * q * ln(2 * q / (p + q))), 6) AS js_div,
       ROUND(0.5 * SUM(ABS(p - q)), 6) AS tvd,
       ROUND(MAX(ABS(d)), 6) AS ks
FROM cdf
GROUP BY event_type
""",
        "ann_ivf": _ann_ivf_oracle(),
        "top_ngrams": f"""
WITH tk AS (
  SELECT regexp_split_to_array({_NORM_TEXT}, '\\s+') AS toks FROM documents
), bg AS (
  SELECT unnest(
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                             i -> array_to_string(toks[i:i+1], ' '))
         ELSE [] END) AS bigram
  FROM tk
)
SELECT bigram, COUNT(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 50
""",
        "cdc_merge": """
WITH ch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
  FROM events
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch
)
SELECT user_id, ts, event_id, value FROM r WHERE rn = 1 AND op = 'upsert'
""",
        "lag_features": """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       LAG(value, 1) OVER w AS value_lag1,
       value - LAG(value, 1) OVER w AS value_delta1,
       LAG(value, 2) OVER w AS value_lag2,
       value - LAG(value, 2) OVER w AS value_delta2
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
""",
        "edit_distance_join": """
SELECT a.c_custkey AS c_custkey_l, b.c_custkey AS c_custkey_r,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a, customer b
WHERE a.c_custkey < 300 AND b.c_custkey >= 300 AND b.c_custkey < 600
  AND levenshtein(a.c_name, b.c_name) <= 1
""",
        "decayed_agg": """
SELECT user_id,
       ROUND(SUM(value * POWER(0.5, (epoch(TIMESTAMP '2024-01-25 00:00:00')
           - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))), 6) AS decayed_sum,
       ROUND(SUM(POWER(0.5, (epoch(TIMESTAMP '2024-01-25 00:00:00')
           - epoch(CAST(ts AS TIMESTAMP))) / (7*86400.0))), 6) AS decayed_count
FROM events
WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-25 00:00:00'
GROUP BY user_id
""",
        "sketch_distinct": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
""",
        "semdedup": _semdedup_oracle(),
        # two legs like bm25_index_topk: head (build on 2/3 + append
        # 1/3) vs the full-corpus oracle, and as_of= the archived build
        # commit vs the 2/3-corpus oracle — historical epoch lists on
        # the vector side (codes scan) under the hash gate; the frozen
        # models are corpus-split-independent (md5 over the full table)
        "ivfpq_index_topk": f"""
SELECT 'head' AS leg, query_id, neighbor_id, adc_dist, rank FROM (
{_ivfpq_oracle()}
)
UNION ALL
SELECT 'asof_build' AS leg, query_id, neighbor_id, adc_dist, rank FROM (
{_ivfpq_oracle(corpus_filter="WHERE c.vec_id % 3 != 0")}
)
""",
        "hybrid_index_topk": (
            "SELECT * FROM (\n"
            + _hybrid_oracle(leg="head")
            + "\n) UNION ALL SELECT * FROM (\n"
            + _hybrid_oracle(
                doc_filter="doc_id % 6 <> 3",
                vec_filter="vec_id % 6 <> 3",
                leg="asof_append",
            )
            + "\n)"
        ),
        # two legs: head (full corpus after build->append->compact) and
        # the as_of time-travel read of the BUILD commit (2/3 corpus) —
        # the archived-manifest resolution itself is under the hash gate
        "bm25_index_topk": f"""
SELECT 'head' AS leg, doc_id, bm25 FROM (
{_bm25_oracle(["hash", "scan", "filter"], 15)}
)
UNION ALL
SELECT 'asof_build' AS leg, doc_id, bm25 FROM (
{_bm25_oracle(["hash", "scan", "filter"], 15,
              doc_filter="AND doc_id % 3 != 0")}
)
""",
        "online_serving": """
WITH u AS (SELECT CAST(range AS BIGINT) AS user_id FROM range(0, 152)),
l AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-25 00:00:00.5'
),
last AS (SELECT user_id, ts, value FROM l WHERE rn = 1),
l1 AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
  FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
),
last1 AS (SELECT user_id, ts, value FROM l1 WHERE rn = 1)
SELECT 'head' AS leg, u.user_id,
       CASE WHEN last.user_id IS NOT NULL
                 AND last.ts >= TIMESTAMP '2024-01-24 12:00:00'
            THEN last.value END AS value,
       CASE WHEN last.user_id IS NULL THEN 'NOT_FOUND'
            WHEN last.ts < TIMESTAMP '2024-01-24 12:00:00'
              THEN 'OUTSIDE_MAX_AGE'
            ELSE 'PRESENT' END AS status,
       CASE WHEN last.user_id IS NOT NULL
                 AND last.ts >= TIMESTAMP '2024-01-24 12:00:00'
            THEN last.value * 10.0 + 1.0 END AS value_scaled
FROM u LEFT JOIN last ON u.user_id = last.user_id
UNION ALL
SELECT 'asof' AS leg, u.user_id,
       CASE WHEN last1.user_id IS NOT NULL
                 AND last1.ts >= TIMESTAMP '2024-01-19 12:00:00'
            THEN last1.value END AS value,
       CASE WHEN last1.user_id IS NULL THEN 'NOT_FOUND'
            WHEN last1.ts < TIMESTAMP '2024-01-19 12:00:00'
              THEN 'OUTSIDE_MAX_AGE'
            ELSE 'PRESENT' END AS status,
       CASE WHEN last1.user_id IS NOT NULL
                 AND last1.ts >= TIMESTAMP '2024-01-19 12:00:00'
            THEN last1.value * 10.0 + 1.0 END AS value_scaled
FROM u LEFT JOIN last1 ON u.user_id = last1.user_id
""",
    }
