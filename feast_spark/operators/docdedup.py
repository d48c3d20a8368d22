"""Document deduplication for training-data pipelines.

Four families, all DataFrame-native:

* exact dedup        — md5 fingerprint groupBy (one shuffle on the hash)
* n-gram Jaccard     — exact near-dup pairs via shingle inverted index
                       (explode -> self-join on shingle -> agg).  The
                       *exact* formulation; quadratic only within a
                       shingle's posting list, with a frequency cap to
                       bound hot shingles (standard trick).
* MinHash + LSH      — the 100 TB scale path: fixed-size signature per
                       doc (H xxhash64 min-hashes), banded into buckets;
                       candidate pairs only form inside a bucket.  One
                       shuffle on (band, bucket-hash).  Candidates are
                       then verified with exact Jaccard.
* SimHash            — 64-bit sign-sum fingerprint; near-dups = small
                       Hamming distance.  Bit arithmetic stays JVM-side.

Everything is built-ins (split/transform/filter/aggregate/xxhash64) —
no Python UDFs, so Tungsten codegen applies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from feast_spark.functions.text import (
    explode_computed,
    fingerprint_md5,
    normalize_text_sql,
    posexplode_computed,
    sql_ident,
    tokens_sql,
)


# Candidate-frame persists are intra-query (the returned plan reads
# them), so they cannot be unpersisted before the caller's action —
# but a long-lived serving/driver session calling these operators
# repeatedly would otherwise accumulate CacheManager entries (storage
# blocks are LRU-evictable under memory pressure, but each entry also
# competes with other caches and stays matchable against future
# plans).  Bounded FIFO: past _PERSIST_MAX live frames the OLDEST is
# unpersisted — by then its query has long since materialized; a
# caller re-executing an ancient frame simply recomputes it.
_PERSIST_MAX = 32
_PERSISTED: list[DataFrame] = []
_PERSIST_LOCK = __import__("threading").Lock()


def _persist(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK-persist an intermediate that the downstream plan
    references more than once (self-joins, candidate verification).

    Without it the expensive shingle/signature expressions are *compiled
    and executed* once per reference (2-4x); with it they run once and
    the reuses read the cached columnar blocks.  Storage blocks are
    LRU-evicted under memory pressure; the bounded FIFO above
    additionally unpersists the oldest frames so repeated calls in a
    long-lived session never accumulate unbounded CacheManager
    entries."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    evict: list[DataFrame] = []
    with _PERSIST_LOCK:  # serving coalescers call operators concurrently
        _PERSISTED.append(out)
        while len(_PERSISTED) > _PERSIST_MAX:
            evict.append(_PERSISTED.pop(0))
    for old in evict:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # owning session already stopped
    return out


def widen_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition UP to the session's default parallelism
    when the input scan is genuinely SMALL — never down.

    Shingling/minhashing is CPU-bound; a small parquet file arrives as
    ONE input split (maxPartitionBytes), which would serialize the whole
    pipeline on one core.  The file count is read from the scan metadata
    (``inputFiles`` — no job, no plan-to-RDD conversion); at 100 TB the
    input has far more files than cores and this is a no-op.

    Few files does NOT imply few splits: Spark byte-range-splits large
    files at ``maxPartitionBytes`` boundaries, so 10 x 10 GB files
    already scan as ~800 tasks — repartitioning THEM would shuffle the
    whole corpus for nothing.  So when the file count is below the
    target, the sizes are checked too (driver-side ``getFileStatus``
    on <= cores files — cheap) and the repartition only fires when the
    total is under ``target * maxPartitionBytes`` (i.e. the scan
    cannot reach the target split count on its own).  Unsizable
    sources fall back to file count alone."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    try:
        # resolved to plain bytes by the session (conf.get may return
        # the raw user string, e.g. "128MB")
        max_split = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:
        max_split = 134217728
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        if total >= target * max_split:
            # byte-range splitting already yields >= target splits
            return df
    except Exception:
        pass  # unsizable (exotic FS): keep the file-count heuristic
    return df.repartition(target)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep: str = "min",
    select: list[str] | None = None,
) -> DataFrame:
    """Keep one representative per identical (normalized) text: the
    min/max id wins.

    groupBy(fingerprint).agg(min_by(row, id)): hash aggregation with
    MAP-SIDE PARTIAL COMBINE — each task reduces to one survivor per
    fingerprint before the shuffle, so shuffle volume is O(distinct
    texts), not O(rows).  A window formulation would ship every
    duplicate through the exchange; at 100 TB with near-dup-heavy crawl
    data that is most of the corpus.

    ``select`` limits the columns carried through the shuffle (id_col
    is always included).  When downstream only needs text-DERIVED
    columns (scores, language, token counts — identical across an
    exact-dup group by construction), compute them map-side first and
    dedup the narrow projection: the exchange then ships fixed-width
    rows instead of document bodies."""
    pick = F.min_by if keep == "min" else F.max_by
    cols = list(df.columns) if select is None else list(
        dict.fromkeys([id_col, *select])
    )
    fp = df.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    picked = fp.groupBy("__fp").agg(
        pick(F.struct(*[F.col(c) for c in cols]), F.col(id_col)).alias("__row")
    )
    return picked.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(fingerprint, n_dups, min_id) for every text occurring >1 times."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def with_shingles(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct word n-grams of the normalized text, as an array column.

    The token array is materialized in its OWN projection first: inlining
    it into the per-shingle lambda would re-run the regex tokenizer once
    per shingle (O(len^2) per document — measured 15x slower at sf0.1).
    CollapseProject keeps the multi-referenced expensive alias separate.
    """
    df = df.withColumn(
        "__sh_toks", F.expr(tokens_sql(normalize_text_sql(sql_ident(text_col))))
    )
    # guard: fewer than n tokens -> single shingle of the whole text
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN size(__sh_toks) < {n} "
            "THEN array(concat_ws(' ', __sh_toks)) "
            "ELSE array_distinct(transform("
            f"sequence(0, greatest(size(__sh_toks) - {n}, 0)), "
            f"i -> concat_ws(' ', slice(__sh_toks, i + 1, {n})))) END"
        ),
    ).drop("__sh_toks")


def with_hashed_shingles(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct word n-grams as xxhash64 longs WITHOUT materializing
    the n-gram strings: each shingle is xxhash64 over the n-token
    slice array directly (HashExpression recurses into arrays), so no
    concat buffers are ever allocated.  ~20% faster steady-state and
    ~4x faster cold than shingle-strings-then-hash at sf0.1 — the fast
    dedup path's dominant stage.  Two distinct n-grams collide with
    p ~ 2^-64, so Jaccard over these sets equals string-shingle
    Jaccard; portable/oracle mode keeps strings (md5 needs them)."""
    df = df.withColumn(
        "__sh_toks", F.expr(tokens_sql(normalize_text_sql(sql_ident(text_col))))
    )
    # guard: fewer than n tokens -> single shingle of the whole doc
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN size(__sh_toks) < {n} "
            "THEN array(xxhash64(__sh_toks)) "
            "ELSE array_distinct(transform("
            f"sequence(0, greatest(size(__sh_toks) - {n}, 0)), "
            f"i -> xxhash64(slice(__sh_toks, i + 1, {n})))) END"
        ),
    ).drop("__sh_toks")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted index)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs (id_a < id_b).

    Plan: explode (id, shingle) distinct -> drop shingles occurring in
    more than ``max_shingle_freq`` docs (they generate quadratic join
    fan-out and carry no discriminative signal) -> self-join on shingle
    -> count common -> jaccard = common / (|A| + |B| - common).
    Shuffles: one on shingle (the join), one on the pair (the agg).

    The hot-shingle cap is a count AGGREGATE (map-side partial combine
    -> shuffle is O(distinct shingles)) plus a broadcast anti-join of
    the tiny hot list — not a count window, which would shuffle AND
    sort every posting row just to count per key.
    """
    sh = with_shingles(
        widen_parallelism(df.select(id_col, text_col)), text_col, n
    )
    sh = _persist(
        sh.select(
            F.col(id_col).alias("doc"),
            F.size("shingles").alias("n_sh"),
            "shingles",
        )
    )
    sizes = sh.select("doc", "n_sh")
    posting = sh.select("doc", F.explode("shingles").alias("shingle"))
    hot = (
        posting.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .filter(F.col("__freq") > max_shingle_freq)
        .select("shingle")
    )
    posting = posting.join(F.broadcast(hot), "shingle", "left_anti")
    a = posting.select(F.col("doc").alias("id_a"), "shingle")
    b = posting.select(F.col("doc").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"doc": "id_a", "n_sh": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "n_sh": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path)
# ---------------------------------------------------------------------------

_MH_PRIME = 2147483647


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash params for the portable
    minhash mode, h_i(x) = (a_i*x + b_i) % p over a 32-bit base hash.
    a_i odd < 2^30 keeps a*x inside a 64-bit long. The SAME params are
    embedded into the driver's oracle SQL, so signatures agree
    cross-engine."""
    params = []
    x = 42
    for _ in range(num_hashes):
        x = (1103515245 * x + 12345) % (1 << 30)
        a = x | 1
        x = (1103515245 * x + 12345) % (1 << 30)
        params.append((a, x))
    return params


def with_minhash(
    df: DataFrame,
    shingles_col: str = "shingles",
    num_hashes: int = 32,
    out_col: str = "minhash",
    portable: bool = False,
    prehashed: bool = False,
) -> DataFrame:
    """H min-hashes per doc.  The variable-length shingle strings are
    hashed ONCE; each of the H signatures then re-hashes the resulting
    fixed-width values — H cheap passes instead of H string passes (an
    order of magnitude less CPU on long shingle arrays).  No shuffle;
    one projection.

    Default: xxhash64 base + per-seed xxhash64 re-hash (fastest).
    ``prehashed=True``: ``shingles_col`` already holds xxhash64 longs
    (minhash_dedup_pairs' cached frame) — skip the base pass.
    ``portable=True``: md5-derived 32-bit base + (a*x+b) % p re-hash —
    identical in any engine with md5, so the driver oracle reproduces
    the exact signatures."""
    # One F.expr per projection: the K per-seed array_min(transform(..))
    # legs are built as SQL text (cheap Python string work) instead of
    # ~6 py4j round trips per leg — plan-construction time is real wall
    # time under the per-call query contract.
    sh = sql_ident(shingles_col)
    if portable:
        df = df.withColumn(
            "__mh_base",
            F.expr(
                f"transform({sh}, s -> "
                "cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint))"
            ),
        )
        legs = ", ".join(
            f"array_min(transform(__mh_base, x -> (x * {a} + {b}) % {_MH_PRIME}))"
            for a, b in minhash_params(num_hashes)
        )
        return df.withColumn(out_col, F.expr(f"array({legs})")).drop("__mh_base")

    base = (
        F.col(shingles_col)
        if prehashed
        else F.expr(f"transform({sh}, s -> xxhash64(s))")
    )
    df = df.withColumn("__mh_base", base)
    legs = ", ".join(
        f"array_min(transform(__mh_base, x -> xxhash64(x, {seed})))"
        for seed in range(num_hashes)
    )
    return df.withColumn(out_col, F.expr(f"array({legs})")).drop("__mh_base")


def _oph_rot_const(j: int) -> int:
    """Rotation-densification decorrelation constant for borrow
    distance j, as a signed 64-bit literal: j * golden-ratio-odd,
    wrapped.  XORed (not added) onto the borrowed value so full-range
    xxhash64 longs never overflow under ANSI mode — two docs agree on
    a borrowed slot iff they agree on the donor bin at the same
    distance, which is all densification needs."""
    v = (j * 0x9E3779B97F4A7C15) % (1 << 64)
    return v - (1 << 64) if v >= (1 << 63) else v


def with_minhash_oph(
    df: DataFrame,
    shingles_col: str = "shingles",
    num_hashes: int = 32,
    out_col: str = "minhash",
    prehashed: bool = False,
) -> DataFrame:
    """One-permutation hashing (Li, Owen & Zhang, NIPS 2012) with
    rotation densification (Shrivastava & Li, ICML 2014): an
    alternative signature scheme to ``with_minhash``'s K-seed one,
    for long-document corpora (see the measured-result paragraph for
    why it is NOT the short-doc default).

    K-seed minhash re-hashes EVERY shingle K times (K xxhash64 passes
    over the array).  OPH hashes each shingle ONCE, splits the hash
    range into K bins (``h mod K``), and takes the min hash per bin —
    the K signature slots come from a single hash pass.  The remaining
    per-bin work is a filter+array_min scan with a modulo compare,
    ~an order of magnitude cheaper per element than an xxhash64 eval.

    Empty bins (short docs: P(empty) = (1-1/K)^n) are densified by
    rotation: bin k borrows the value of the nearest non-empty bin to
    its right (circular), XORed with a per-distance constant — the
    estimator stays unbiased and two docs agree on a borrowed slot
    only if they agree on the donor bin at the same distance.
    Expressed as ONE ``transform(sequence(0,K-1), coalesce(...))``
    over the raw bin array, so codegen emits the K-branch coalesce
    once, not K times; with ≥1 shingle (guaranteed by with_shingles'
    short-doc guard) the full-circle chain always terminates non-null.

    Signatures DIFFER from ``with_minhash``'s (different permutation
    scheme); collision probability per slot is still the Jaccard
    similarity, so banding/recall behavior is equivalent —
    ``test_docdedup.test_oph_pairs_match_kseed_fast_path`` pins the
    verified-pair equivalence on the sf0.01 corpus.  No shuffle; one
    projection, like the K-seed path.

    Measured result (sf0.1, local[32], ALTERNATING interleaved runs —
    sequential-block timings on this box are corrupted by ambient
    load): the signature stage is a dead heat (median 0.299s kseed vs
    0.309s OPH; Spark's codegen'd xxhash64-on-long is as cheap as the
    mask+filter bin scan, and round 3's prehashed-long optimization
    already removed the string re-hashing the 32x argument assumed).
    End-to-end minhash_dedup_pairs is ~30% SLOWER with OPH (median
    1.64s vs 1.25s): densified slots on short documents borrow donor
    values, which inflates bucket collisions (347 vs 256 candidates
    on the sf0.1 corpus) and the quadratic in-bucket pair expansion
    pays for it.  Hence ``method='kseed'`` stays the default; OPH is
    kept as the documented alternative for long-document corpora,
    where empty bins vanish (P(empty) = (1-1/K)^n) and the borrow
    penalty with it."""
    base = (
        F.col(shingles_col)
        if prehashed
        else F.transform(F.col(shingles_col), lambda s: F.xxhash64(s))
    )
    df = df.withColumn("__oph_h", base)
    hashes = F.col("__oph_h")
    raw = F.array(
        *[
            F.array_min(F.filter(hashes, _oph_bin_pred(k, num_hashes)))
            for k in range(num_hashes)
        ]
    )
    df = df.withColumn("__oph_raw", raw)
    rawc = F.col("__oph_raw")
    dens = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.coalesce(
            *[
                F.element_at(
                    rawc, F.pmod(k + F.lit(j), F.lit(num_hashes)) + 1
                ).bitwiseXOR(F.lit(_oph_rot_const(j)).cast("long"))
                for j in range(num_hashes)
            ]
        ),
    )
    return df.withColumn(out_col, dens).drop("__oph_h", "__oph_raw")


def _oph_bin_pred(k: int, num_hashes: int):
    # single-arg lambda (see hash_with_seed note); power-of-two bin
    # counts use a mask instead of a modulo
    if num_hashes & (num_hashes - 1) == 0:
        return lambda x: x.bitwiseAND(F.lit(num_hashes - 1)) == k
    return lambda x: F.pmod(x, F.lit(num_hashes)) == k


def choose_minhash_method(mean_shingles: float, num_hashes: int) -> str:
    """Signature-scheme choice for ``method='auto'``, from the measured
    crossover documented in :func:`with_minhash_oph`: OPH's only loss
    mode is densification — empty bins (P = (1-1/K)^n ~ e^(-n/K))
    borrow donor values, inflating bucket collisions and the quadratic
    in-bucket pair expansion (measured +30% end-to-end at sf0.1, where
    n/K ~ 1.5).  At n >= 4K the empty-bin probability is under e^-4 ~
    1.8%, borrows vanish, and OPH's one-hash-pass signature wins;
    below that, K-seed's extra hashing is cheaper than OPH's extra
    candidate pairs."""
    return "oph" if mean_shingles >= 4 * num_hashes else "kseed"


def _mean_shingle_count(sh: DataFrame, sample_rows: int = 10_000) -> float:
    """Bounded probe of the corpus' mean shingle count: LocalLimit
    stops the scan after ``sample_rows`` rows (first partitions only —
    one tiny job, never a full corpus pass)."""
    row = (
        sh.select(F.size("shingles").alias("__n"))
        .limit(sample_rows)
        .agg(F.avg("__n").alias("__m"))
        .head()
    )
    return float(row["__m"] or 0.0)


def _bucket_pairs(grouped: DataFrame, docs_col: str = "docs") -> DataFrame:
    """All (id_a < id_b) pairs within each bucket's doc array, entirely
    as array expressions: sort the array, then for each element pair it
    with every later element.  Runs inside the aggregation's output
    projection — no self-join, no second shuffle before the final
    distinct."""
    # The sorted-distinct array is bound to its OWN projection: the
    # comprehension references it three times, so inlining (what a
    # single-projection spelling hands CollapseProject) would sort +
    # dedup each bucket's array three times per row; a multi-referenced
    # column below the Generate is evaluated once.
    docs = grouped.select(
        F.expr(f"array_sort(array_distinct({sql_ident(docs_col)})) AS __bp_docs")
    )
    pairs = F.expr(
        "flatten(transform(__bp_docs, (x, i) -> "
        "transform(slice(__bp_docs, i + 2, greatest(size(__bp_docs) - i - 1, 0)), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    # explode_computed, not F.explode: InferFiltersFromGenerate would
    # otherwise evaluate the whole pair-comprehension TWICE per bucket
    # (once in an inferred size(pairs) > 0 filter)
    return explode_computed(docs, [], pairs, "p").select(
        "p.id_a", "p.id_b"
    )


def band_bucket_array(bands: int, rows_per_band: int, portable: bool):
    """Array of per-band bucket keys over the ``minhash`` column —
    shared by :func:`lsh_candidate_pairs` and the persisted index
    (``operators/minhash_index.py``) so their bucket identities match
    exactly.

    ONE transform over a band index sequence, so the (expensive)
    signature expression is referenced exactly once and
    CollapseProject can never inline it into per-band copies — the r4
    formulation (an array of 8 structs each referencing `minhash`)
    re-evaluated the signature once per band, which made the densified
    OPH signature a net loss (measured sf0.1: 1.63s vs 0.99s for the
    same pipeline).

    ``portable``: raw comma-joined band strings, reproducible in
    oracle SQL.  Fast path hashes the signature slice directly
    (HashExpression recurses into arrays) — no per-row long->string
    casts or concat buffers; bucket identity is unchanged up to 2^-64
    hash collisions."""
    if portable:
        parts = ", ".join(
            f"cast(element_at(minhash, b * {rows_per_band} + {r + 1}) as string)"
            for r in range(rows_per_band)
        )
        return F.expr(
            f"transform(sequence(0, {bands - 1}), b -> concat_ws(',', {parts}))"
        )
    return F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> xxhash64(slice(minhash, b * {rows_per_band} + 1, {rows_per_band})))"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    shingles_df: DataFrame | None = None,
    portable: bool = False,
    max_bucket_size: int | None = 1000,
    prehashed: bool = False,
    method: str = "kseed",
) -> DataFrame:
    """Candidate near-dup pairs via banding: docs sharing any band of
    rows_per_band consecutive min-hashes collide.

    Pair formation is groupBy(band, bucket) -> collect_list -> in-array
    pair expansion: ONE shuffle on the bucket key (map-side partial
    collect), versus a self-join's two shuffled sides.  Pair fan-out is
    quadratic in bucket size either way; ``max_bucket_size`` drops
    larger buckets (boilerplate/empty docs at crawl scale — they carry
    no near-dup signal and would dominate the expansion at 100 TB).
    The cap is enforced with a count window over the SAME (band,
    bucket) key *before* collect_list, so a degenerate bucket never
    materializes an aggregation buffer — one Exchange either way (the
    window sort and the groupBy reuse it).  Finite by default: at crawl
    scale an uncapped bucket of empty/boilerplate docs is an OOM; pass
    None for exact LSH semantics on trusted corpora.

    Pass ``shingles_df`` (id_col + 'shingles') to reuse an
    already-computed shingle frame instead of re-shingling.
    ``portable``: engine-portable signatures AND bucket keys (the raw
    comma-joined band string instead of its xxhash64).
    ``method``: fast-path signature scheme — 'kseed' (default; K
    xxhash64 passes, measured fastest end-to-end on short-doc
    corpora), 'oph' (one-permutation hashing, see
    ``with_minhash_oph`` for when it wins), or 'auto' (pick by the
    measured crossover: a bounded 10k-row probe of the mean shingle
    count dispatches to OPH iff it is >= 4*num_hashes — see
    :func:`choose_minhash_method`).  Ignored when ``portable`` (the
    oracle pins the K-seed affine scheme)."""
    rows_per_band = num_hashes // bands
    sh = (
        shingles_df
        if shingles_df is not None
        else with_shingles(
            widen_parallelism(df.select(id_col, text_col)), text_col, n
        )
    )
    if method == "auto" and not portable:
        method = choose_minhash_method(
            _mean_shingle_count(sh), num_hashes
        )
    if portable or method == "kseed":
        mh = with_minhash(
            sh, num_hashes=num_hashes, portable=portable, prehashed=prehashed
        )
    else:
        mh = with_minhash_oph(sh, num_hashes=num_hashes, prehashed=prehashed)
    mh = mh.select(F.col(id_col).alias("doc"), "minhash")

    bands_arr = band_bucket_array(bands, rows_per_band, portable)
    # posexplode_computed: keeps InferFiltersFromGenerate from
    # re-deriving the minhash signature in an inferred size() filter
    banded = posexplode_computed(mh, ["doc"], bands_arr, "band", "bucket")
    if max_bucket_size is not None:
        bw = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    grouped = banded.groupBy("band", "bucket").agg(
        F.collect_list("doc").alias("docs")
    )
    return _bucket_pairs(grouped.filter(F.size("docs") > 1)).distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    max_bucket_size: int | None = 1000,
    method: str = "kseed",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard over the candidate set
    only (join back the shingle arrays; intersection via array ops —
    no quadratic all-pairs stage anywhere).

    The verify intersect runs over xxhash64(shingle) longs, not the
    shingle strings: fixed 8-byte compares instead of variable-length
    string compares (neutral at sf0.1's short docs; wins grow with
    document length since intersect cost is per-byte for strings).
    Jaccard is unchanged unless two distinct shingles of the same pair
    collide in 64 bits (~1e-19 per pair).

    Scale shape: the corpus-wide shingle pass feeds ONLY the signature
    pipeline — nothing corpus-sized is cached or carried to the verify
    stage.  The (tiny) candidate-pair frame is persisted instead, its
    doc ids are semi-joined back against the raw input, and only those
    documents are re-shingled for the exact-Jaccard verify.  At crawl
    scale candidates are <<1% of the corpus, so verify cost ~vanishes
    and peak memory is O(candidates), not O(corpus)."""
    base = widen_parallelism(df.select(id_col, text_col))
    if not portable:
        # long shingles end-to-end: signatures re-hash fixed-width
        # longs instead of strings, verify intersects longs
        hashed = lambda frame: with_hashed_shingles(frame, text_col, n)  # noqa: E731
    else:
        hashed = lambda frame: with_shingles(frame, text_col, n)  # noqa: E731
    cands = _persist(
        lsh_candidate_pairs(
            df, id_col, text_col, n, num_hashes, bands,
            shingles_df=hashed(base), portable=portable,
            max_bucket_size=max_bucket_size, prehashed=not portable,
            method=method,
        )
    )
    # candidate ids in ONE pass over the persisted pair frame (explode
    # instead of two scans + a union) and with NO distinct: a left semi
    # join keeps probe-side set semantics whatever the build side's
    # duplication, so the old distinct's whole exchange+aggregate AQE
    # round bought nothing — each id appears at most (its pair count)
    # times, and the build side is candidate-bounded either way.
    cand_ids = cands.selectExpr(
        f"explode(array(id_a, id_b)) AS {sql_ident(id_col)}"
    )
    small = df.select(id_col, text_col).join(cand_ids, id_col, "semi")
    # persisted: BOTH verify joins read this frame — unpersisted, the
    # candidate semi-join AND the re-shingle pass ran twice (once per
    # side, visible as two concurrent duplicate jobs).  Candidate-
    # bounded, so the cache is O(candidates) like `cands` itself.
    sh = _persist(
        hashed(small).select(
            F.col(id_col).alias("doc"),
            (
                F.col("shingles")
                if not portable
                else F.array_distinct(
                    F.transform("shingles", lambda s: F.xxhash64(s))
                )
            ).alias("shingles"),
        )
    )
    # BOTH sides fetch from the SAME persisted frame with an identical
    # plan (alias, not rename): the two broadcast builds canonicalize
    # equal, so Spark plans the second as a ReusedExchange — one
    # broadcast job + one copy of the relation instead of two (the
    # rename-based spelling made the subtrees differ by output names
    # alone and defeated exchange reuse).
    va, vb = sh.alias("__mva"), sh.alias("__mvb")
    joined = (
        cands.join(va, F.col("id_a") == F.col("__mva.doc"))
        .join(vb, F.col("id_b") == F.col("__mvb.doc"))
        .select(
            "id_a", "id_b",
            F.col("__mva.shingles").alias("sh_a"),
            F.col("__mvb.shingles").alias("sh_b"),
        )
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return joined


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _md5_hash60(t):
    """Engine-portable 60-bit shingle hash: first 15 hex chars of md5.
    DuckDB computes the identical value, so simhash fingerprints built
    from it are oracle-checkable cross-engine."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def with_simhash(
    df: DataFrame,
    text_col: str,
    out_col: str = "simhash",
    n: int = 3,
    n_bits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """SimHash over distinct word n-gram shingles: bit i of the
    fingerprint is the sign of sum over shingles of (+1 if bit i of
    hash(shingle) else -1).  Shingles (not unigrams) keep the feature
    space large enough that only genuinely similar documents collide.
    Expressed as n_bits vectorized bit-tests over one hash array.

    Default hash is xxhash64 (fastest, 64 bits). Pass
    ``hash_fn=_md5_hash60, n_bits=60`` for the engine-portable variant
    the driver oracle reproduces bit-for-bit."""
    df = with_shingles(df, text_col, n, out_col="__sh_tmp")
    hf = hash_fn if hash_fn is not None else (lambda t: F.xxhash64(t))
    hashes = F.transform(F.col("__sh_tmp"), lambda t: hf(t))
    df = df.withColumn("__hashes", hashes).drop("__sh_tmp")
    n_tok = F.size("__hashes")

    def bit_test(mask: int):
        # single-arg lambda (see hash_with_seed note)
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_cols = []
    for i in range(n_bits):
        # two's-complement literal mask (bit 63 is the sign bit of a long)
        mask = (1 << i) if i < 63 else -(1 << 63)
        ones = F.size(F.filter(F.col("__hashes"), bit_test(mask)))
        # majority of tokens set the bit (ties -> 0)
        bit = F.when(ones * 2 > n_tok, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bit_cols.append(bit)
    fp = bit_cols[0]
    for b in bit_cols[1:]:
        fp = fp.bitwiseOR(b)
    return df.withColumn(out_col, fp).drop("__hashes")


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    portable: bool = False,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on the four
    16-bit quadrants (pigeonhole: distance <= 3 => at least one of 4
    quadrants matches exactly), so candidate formation is an equi-join,
    not a cross-join.

    ``max_bucket_size`` caps a (quadrant, value) bucket — at crawl
    scale identical-fingerprint boilerplate piles ~N/65536 docs into
    one bucket and the in-array pair expansion is quadratic in it.
    Enforced by a count window over the SAME key *before* collect_list
    (one Exchange; a hot bucket never reaches an aggregation buffer);
    a dropped bucket's pairs usually survive via the doc's other three
    quadrants.  Pass None for exact blocking semantics.

    ``portable=True`` swaps xxhash64 for the md5-based 60-bit hash so
    the fingerprints (and pairs) are reproducible in any engine with
    md5 — the oracle-checked mode; xxhash64 stays the fast default."""
    kwargs = {"hash_fn": _md5_hash60, "n_bits": 60} if portable else {}
    sh = with_simhash(
        widen_parallelism(df.select(id_col, text_col)), text_col, **kwargs
    ).select(F.col(id_col).alias("doc"), "simhash")
    quads = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("quad"),
                        F.shiftrightunsigned("simhash", 16 * q)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("qval"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("doc", "simhash", "qq.quad", "qq.qval")
    # one shuffle: bucket on (quad, qval), expand pairs inside the
    # bucket's array (same shape as lsh_candidate_pairs), hamming filter
    # on the struct-carried fingerprints, distinct to merge quadrants.
    if max_bucket_size is not None:
        qw = Window.partitionBy("quad", "qval")
        quads = (
            quads.withColumn("__bsz", F.count(F.lit(1)).over(qw))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    grouped = (
        quads.groupBy("quad", "qval")
        .agg(
            F.collect_list(F.struct("doc", "simhash")).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    members = F.array_sort(F.array_distinct(F.col("members")))
    pairs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(
                    members, i + 2, F.greatest(F.size(members) - i - 1, F.lit(0))
                ),
                lambda y: F.struct(
                    x["doc"].alias("id_a"),
                    y["doc"].alias("id_b"),
                    hamming64(x["simhash"], y["simhash"]).alias("hamming"),
                ),
            ),
        )
    )
    return (
        explode_computed(grouped, [], pairs, "p")
        # duplicate doc ids with differing text survive the struct
        # array_distinct as two entries of the same doc — never pair a
        # doc with itself.
        .filter(
            (F.col("p.hamming") <= max_hamming)
            & (F.col("p.id_a") != F.col("p.id_b"))
        )
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
    )


def frequent_lines(
    df: DataFrame,
    text_col: str = "text",
    min_occurrences: int = 3,
    min_line_chars: int = 10,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """(line_hash, n_docs) for lines appearing in >= min_occurrences
    DISTINCT documents — the boilerplate set (nav bars, cookie
    banners, license footers) that cross-document line dedup removes
    (the public C4/Gopher "repeated lines" rule).  Short lines are
    exempt below ``min_line_chars`` — single words repeat naturally
    and carry no boilerplate signal.

    Shuffle volume, honestly: the exact path's per-doc ``.distinct()``
    shuffles distinct **(doc, line_hash) pairs — O(corpus lines)**,
    not O(distinct lines); partial aggregation only dedups repeats of
    a line WITHIN one doc's partition.  Exact distinct-doc counting
    needs this.  The output stays tiny (only lines crossing the
    threshold), but at 100 TB the intermediate exchange is the cost.

    ``approx=True`` is the scale mode: one
    ``approx_count_distinct(doc, rsd)`` aggregate replaces
    distinct+count, so map-side combine folds each line's doc ids into
    an HLL sketch and the shuffle carries **one sketch per distinct
    line per partition** — independent of how many docs repeat the
    line.  Counts are within ±rsd (default 5%) of the true distinct-doc
    count, so lines near the threshold may flip; genuinely frequent
    boilerplate (the C4 target: counts >> threshold) is always kept."""
    # doc id must be stamped BEFORE the explode: inside the same
    # projection monotonically_increasing_id() would evaluate once per
    # exploded row, making every line look like its own document
    base = df.select(
        F.monotonically_increasing_id().alias("__doc"), F.col(text_col)
    )
    lines = explode_computed(
        base, ["__doc"], F.split(F.col(text_col), "\n"), "__line"
    ).select("__doc", F.trim("__line").alias("__line"))
    eligible = lines.where(F.length("__line") >= min_line_chars)
    hashed = eligible.select("__doc", F.md5("__line").alias("line_hash"))
    if approx:
        counted = hashed.groupBy("line_hash").agg(
            F.approx_count_distinct("__doc", approx_rsd).alias("n_docs")
        )
    else:
        counted = (
            hashed.distinct()  # count DOCS containing the line, not occurrences
            .groupBy("line_hash")
            .agg(F.count("*").alias("n_docs"))
        )
    return counted.where(F.col("n_docs") >= min_occurrences)


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_occurrences: int = 3,
    min_line_chars: int = 10,
    out_col: str | None = None,
    max_boilerplate_lines: int | None = 1_000_000,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Remove boilerplate lines (those in >= min_occurrences distinct
    docs) from every document, preserving the order and spacing of
    what remains.

    Scale shape: the frequent-line set is computed once (one shuffle,
    output bounded by actual boilerplate) and then BROADCAST — the
    corpus side explodes to lines, left-anti joins the broadcast set,
    and reassembles per document with a bounded collect (lines of ONE
    doc, ordered by position).  The 100 TB corpus shuffles once, on
    doc id, for the reassembly.  ``max_boilerplate_lines`` hard-bounds
    the broadcast (the MOST-repeated lines win via TakeOrdered —
    exactly the ones worth removing); None lifts the cap at
    broadcast-size risk.

    ``approx=True`` switches the frequent-line count to the HLL
    sketch aggregate (see :func:`frequent_lines`) — the 100 TB mode,
    where the exact path's distinct-(doc, line) exchange is the
    bottleneck; counts within ±``approx_rsd``, so only lines AT the
    threshold can flip in or out of the boilerplate set."""
    out_col = out_col or text_col
    boiler = frequent_lines(
        df, text_col, min_occurrences=min_occurrences,
        min_line_chars=min_line_chars, approx=approx,
        approx_rsd=approx_rsd,
    )
    if max_boilerplate_lines is not None:
        boiler = boiler.orderBy(
            F.desc("n_docs"), F.asc("line_hash")
        ).limit(max_boilerplate_lines)
    boiler = boiler.select("line_hash")
    lines = posexplode_computed(
        df,
        [F.col(id_col)],
        F.split(F.col(text_col), "\n"),
        "__pos",
        "__line",
    )
    kept = lines.join(
        F.broadcast(boiler),
        F.md5(F.trim("__line")) == F.col("line_hash"),
        "left_anti",
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__line"))
            ).alias("__ordered")
        )
        .select(
            id_col,
            F.array_join(
                F.transform("__ordered", lambda s: s["__line"]), "\n"
            ).alias(out_col),
        )
    )
    if out_col == text_col:
        base = df.drop(text_col)
    else:
        base = df
    # docs whose every line was boilerplate come back as empty strings
    return base.join(rebuilt, on=id_col, how="left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )
