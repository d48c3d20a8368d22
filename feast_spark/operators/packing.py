"""Training-corpus assembly operators: sequence packing, weighted
sampling, and mixture-by-source token budgeting.

These are the last-mile steps of a pre-training data pipeline: after
cleaning (``functions.text``), dedup (``operators.docdedup`` /
``components``) and splitting (``functions.split``), the surviving
documents must be (a) sampled to a target size, (b) mixed across
sources to target token proportions, and (c) packed into fixed-budget
training sequences.  The reference has no counterpart (Feast stops at
feature retrieval); this extends the training-data pipeline per the
build plan (SURVEY §7 phase 5).

All three operators are **deterministic by construction** — every
ordering and random draw derives from ``md5(salt || id)``, the same
engine-portable idiom as ``functions.split.hash_bucket`` — so results
are reproducible across runs, engines (the DuckDB oracle computes
identical values), repartitioning, and cluster sizes.

Scale design (the point of shards):

* A faithful "greedy pack in one global order" needs a single global
  sorted stream — a one-partition window, the classic scale cliff.
  Instead every operator here shards rows by ``hash(id) % n_shards``
  and works within shards: all windows are ``partitionBy(shard, ...)``,
  so the plan is one hash shuffle + per-shard sorts, embarrassingly
  parallel at any corpus size.  ``n_shards`` is the parallelism knob
  (set it ≳ cluster cores; default 32).
* Budgets split exactly across shards (integer division, remainder to
  the lowest shard ids), so the global budget error of ``corpus_mix``
  is bounded by one document per shard — negligible against a 100 TB
  budget, and the price of not serializing on a global cumsum.
* ``weighted_sample`` needs no shard at all: top-k by a computed key
  is Spark's distributed TakeOrdered (per-partition partial top-k,
  then a k-row driver merge) — no global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feast_spark.functions.split import hash_bucket

__all__ = [
    "pack_sequences",
    "weighted_sample",
    "corpus_mix",
    "chunk_documents",
]


def _ord_key(id_col: Column, salt: str) -> Column:
    """Deterministic per-row ordering key: full md5 hex of salt||id."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def _checked_tokens(token_col: str, op: str) -> Column:
    """Token counts must be positive non-NULL: a NULL is silently
    skipped by window SUMs (the document would pack/mix at zero budget
    cost) and a negative breaks the monotone-cumsum guarantees, so
    budgeting over either is meaningless.  Enforced lazily inside the
    plan (``raise_error`` at first bad row) — no extra action, no
    driver round-trip."""
    c = F.col(token_col)
    return F.when(
        c.isNull() | (c <= 0),
        F.raise_error(
            F.concat(
                F.lit(f"{op}: {token_col} must be a positive token count, got "),
                F.coalesce(c.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(c)


def _uniform01(id_col: Column, salt: str) -> Column:
    """Deterministic uniform draw in (0, 1]: first 8 md5 hex chars as a
    32-bit int, shifted to (0, 2^32] so log() is always finite."""
    u32 = F.conv(F.substring(_ord_key(id_col, salt), 1, 8), 16, 10).cast("double")
    return (u32 + F.lit(1.0)) / F.lit(4294967296.0)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    n_shards: int = 32,
    salt: str = "",
    seq_col: str = "seq_id",
    pos_col: str = "seq_pos",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Assign every document to a fixed-token-budget training sequence.

    Documents are laid out in a deterministic md5 order within each
    shard and chunked at document granularity: a document belongs to
    the sequence in which its first token falls
    (``floor(exclusive_cumsum / max_tokens)``), so every sequence holds
    a contiguous run of documents and may overflow ``max_tokens`` by at
    most the last document's length minus one — the standard
    concat-then-split-at-doc-boundaries packing.  Callers that cannot
    tolerate overflow should pre-filter or truncate documents longer
    than ``max_tokens`` (flag them with ``F.col(token_col) >
    max_tokens``).

    ``group_cols`` names columns a sequence must never straddle (e.g.
    ``["split"]`` after :func:`~feast_spark.functions.split.hash_split`
    — a train sequence must not contain val/test documents): they are
    added to every window partition AND prefixed onto ``seq_col`` so
    sequence ids stay globally unique.  Documents with a NULL or
    non-positive ``token_col`` are rejected at plan-execution time
    (``raise_error``): a NULL would be silently skipped by the window
    SUM (packed at zero budget cost) and a negative count breaks the
    monotone-bin guarantee, so neither is a meaningful packing input.

    Output = input columns + ``shard``, ``seq_col`` (string
    ``"{shard}-{bin}"``, group-cols-prefixed when given), ``pos_col``
    (0-based document position within the sequence).  Deterministic
    for a given (ids, tokens, salt, n_shards, max_tokens).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    groups = list(group_cols or [])
    cid = F.col(id_col)
    sharded = df.withColumn("shard", hash_bucket(cid, n_shards, salt=salt)) \
        .withColumn("__ord", _ord_key(cid, salt)) \
        .withColumn(token_col, _checked_tokens(token_col, "pack_sequences"))
    w = Window.partitionBy("shard", *groups).orderBy("__ord", id_col)
    prev_cum = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    binned = sharded.withColumn(
        "__bin", F.floor(prev_cum / F.lit(max_tokens)).cast("long")
    )
    wseq = Window.partitionBy("shard", *groups, "__bin").orderBy("__ord", id_col)
    return (
        binned.withColumn(
            seq_col,
            F.concat_ws(
                "-", *[F.col(g) for g in groups], F.col("shard"), F.col("__bin")
            ),
        )
        .withColumn(pos_col, F.row_number().over(wseq) - 1)
        .drop("__ord", "__bin")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 0,
    chunk_col: str = "chunk_id",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Split documents into fixed-TOKEN-window chunks with optional
    overlap — the pre-embedding / context-window chunker when the
    budget is token-shaped.  Sibling: ``functions.text.chunk_documents``
    chunks by character offsets and preserves the verbatim substring
    (use it when cite-back spans / exact text identity matter — e.g.
    the corpus pipeline's chunk-dedup stage).

    Chunk ``i`` of a document covers whitespace tokens
    ``[i * stride, i * stride + chunk_tokens)`` where ``stride =
    chunk_tokens - overlap``; the last chunk may be short, and an
    empty/blank document yields no chunks.  Output = input columns +
    ``chunk_col`` (0-based) + ``out_col`` (the chunk's text, tokens
    re-joined with single spaces) + ``n_chunk_tokens``.

    Scale: pure narrow ops — split, ``posexplode`` of a start-offset
    sequence, ``slice`` + ``array_join`` — zero shuffles, zero Python;
    the fan-out factor is ~n_tokens/stride per row, which AQE-era
    Spark handles by splitting input files, not by materializing
    anything corpus-sized.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    from feast_spark.functions.text import tokens

    with_toks = df.withColumn("__toks", tokens(F.col(text_col)))
    n_tok = F.size(F.col("__toks"))
    # start offsets 0, stride, 2*stride, ... < n_tokens
    starts = F.when(n_tok > 0, F.sequence(
        F.lit(0),
        n_tok - 1,
        F.lit(stride),
    )).otherwise(F.array().cast("array<int>"))
    from feast_spark.functions.text import posexplode_computed

    exploded = posexplode_computed(
        with_toks, ["*"], starts, chunk_col, "__start"
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)
    )
    return (
        exploded.withColumn(out_col, F.array_join(chunk, " "))
        .withColumn("n_chunk_tokens", F.size(chunk).cast("long"))
        .drop("__toks", "__start")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k rows
    with the smallest exponential keys ``-ln(u_id) / weight`` win
    (Efraimidis–Spirakis A-ES, with the uniform ``u_id`` derived from
    ``md5(salt || id)`` instead of an RNG).  Inclusion probability is
    proportional to weight, and the draw is reproducible — the same row
    set for any partitioning, cluster size, or run.

    Rows with NULL or non-positive weight are excluded.  Output keeps
    the input columns (no key column — callers compare row sets).

    Scale: the key is a narrow codegen expression; ``orderBy().limit(k)``
    executes as per-partition top-k + k-row merge, never a full sort.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = _uniform01(F.col(id_col), salt)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__aes_key", key)
        .orderBy(F.col("__aes_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__aes_key")
    )


def corpus_mix(
    df: DataFrame,
    id_col: str,
    token_col: str,
    source_col: str,
    budgets: dict[str, int],
    n_shards: int = 32,
    salt: str = "",
) -> DataFrame:
    """Compose a training mix: per source, keep documents (in
    deterministic md5 order) while the running token total stays within
    that source's budget; sources absent from ``budgets`` are dropped.

    Never overshoots: a document is kept iff its *inclusive* cumulative
    token count fits the budget, so the take is the longest prefix of
    the shard's ordered stream that fits — each source contributes ≤
    its budget, and the selection is a deterministic function of
    (id, salt) alone.

    The budget splits exactly across shards — ``budget // n_shards``
    each, remainder distributed to shards ``0..r-1`` — so per-source
    totals are exact up to one under-filled document per shard while
    every shard packs independently (see module docstring).

    NULL or non-positive ``token_col`` values are rejected at
    plan-execution time (see :func:`pack_sequences` — a NULL would
    otherwise leave the running cumsum NULL and silently drop rows).
    """
    if not budgets:
        raise ValueError("budgets must name at least one source")
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {b}")
    cid = F.col(id_col)
    base_items: list[Column] = []
    rem_items: list[Column] = []
    for s, b in budgets.items():
        base_items += [F.lit(s), F.lit(b // n_shards)]
        rem_items += [F.lit(s), F.lit(b % n_shards)]
    base_map = F.create_map(*base_items)
    rem_map = F.create_map(*rem_items)
    src = F.col(source_col)
    sharded = (
        df.filter(src.isin(list(budgets.keys())))
        .withColumn(token_col, _checked_tokens(token_col, "corpus_mix"))
        .withColumn("shard", hash_bucket(cid, n_shards, salt=salt))
        .withColumn("__ord", _ord_key(cid, salt))
        .withColumn(
            "__budget",
            base_map[src]
            + F.when(F.col("shard") < rem_map[src], F.lit(1)).otherwise(F.lit(0)),
        )
    )
    w = Window.partitionBy(source_col, "shard").orderBy("__ord", id_col)
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        sharded.withColumn("__cum", cum)
        .filter(F.col("__cum") <= F.col("__budget"))
        .drop("__ord", "__budget", "__cum", "shard")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_per_group: int,
    id_col: str = "doc_id",
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group — the standard
    web-corpus curation cap (per-domain document limits, so one
    crawler-friendly site cannot dominate the training mix; public
    C4/Gopher-style rule).

    Deterministic selection: rank by ``order_col`` (quality score,
    token count, ...) descending by default, ties and the no-order
    case broken by a stable md5 of the id — growth-stable in the sense
    that re-running on the same rows always keeps the same subset.
    One hash-partition window on the group key; skewed groups are
    bounded by the cap itself (everything past rank N is dropped in
    the same pass)."""
    if max_per_group < 1:
        raise ValueError("max_per_group must be >= 1")
    tie = F.md5(F.concat_ws("\x1f", F.lit("cap"), F.col(id_col).cast("string")))
    if order_col is None:
        ordering = [tie.asc()]
    else:
        primary = (
            F.col(order_col).desc() if descending else F.col(order_col).asc()
        )
        ordering = [primary, tie.asc()]
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_per_group)
        .drop("__rk")
    )
