"""The end-to-end training-corpus pipeline: one declarative call
chaining the package's corpus operators in their canonical order —

    featurize → filter → exact dedup → near-dup resolve →
    decontaminate → split → mix → pack | chunk

Every stage is the already-tested operator (nothing is reimplemented
here); the value of the facade is the ORDER and the plan properties it
preserves end-to-end:

* Featurize-then-filter runs BEFORE any shuffle, so documents that
  fail quality/language gates never reach an exchange (same argument
  as the driver's ``corpus_clean`` query, which this generalizes).
* Exact dedup shuffles fixed-width fingerprints, never text.
* Near-dup resolution (MinHash→LSH→connected components) and
  decontamination each see the already-shrunk corpus.
* Split/mix/pack are deterministic md5-derived assignments, so the
  whole pipeline is reproducible row-for-row across runs and cluster
  sizes — rerunning on a grown corpus never reassigns an existing
  document's split.

The composition stays lazy: one Catalyst plan, no collect between
stages.  ``report=True`` adds per-stage row counts (one action per
stage — use for audits, not in production plans).

Reference has no counterpart (Feast stops at feature retrieval);
SURVEY §7 phase 5.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.functions.split import hash_split
from feast_spark.functions.text import with_lang_id, with_quality_features
from feast_spark.operators.components import resolve_dup_groups
from feast_spark.operators.contamination import contaminated_spans
from feast_spark.operators.docdedup import exact_dedup, minhash_dedup_pairs
from feast_spark.operators.packing import corpus_mix, pack_sequences

__all__ = ["CorpusConfig", "build_corpus"]


@dataclass(frozen=True)
class CorpusConfig:
    """Declarative knobs for :func:`build_corpus`.  Every stage can be
    disabled: ``None`` budgets skip mixing, ``None`` pack_max_tokens
    skips packing, ``near_dedup=False`` skips the MinHash pass."""

    id_col: str = "doc_id"
    text_col: str = "text"
    source_col: str = "source"
    # ingestion: strip HTML to visible text before anything else
    html_input: bool = False
    # PII scrubbing (text.scrub_pii): mask emails/urls/ips/ssns/cards/
    # phones with typed placeholders BEFORE featurization so quality
    # stats and dedup fingerprints see the scrubbed text (placeholders
    # keep token positions stable).  None = skip; [] is invalid; a
    # list restricts to those PII_PATTERNS kinds ("all" = every kind).
    scrub_pii_kinds: tuple[str, ...] | str | None = None
    # cross-document boilerplate: remove lines present in >= this many
    # distinct docs (None = skip the stage)
    boilerplate_min_docs: int | None = None
    # 100 TB knob: count boilerplate lines with the HLL sketch
    # aggregate instead of exact distinct — the exchange then carries
    # one sketch per (line, partition) instead of every distinct
    # (doc, line) pair (docdedup.frequent_lines docstring)
    line_dedup_approx: bool = False
    line_dedup_rsd: float = 0.05
    # exact-substring dedup (ExactSubstr / winnowing): splice out runs
    # duplicated verbatim across >= substring_min_docs documents when
    # they reach this length in chars (None = skip the stage)
    substring_dedup_min_chars: int | None = None
    substring_min_docs: int = 2
    # md5-based signatures/shingles for near-dedup + decontamination:
    # bit-reproducible cross-engine (the differential-oracle mode);
    # False = xxhash64 fast path (~2x cheaper hashing)
    portable_hashes: bool = False
    # filter gates
    min_quality: float = 0.5
    min_tokens: int = 10
    max_tokens_per_doc: int = 5_000
    langs: tuple[str, ...] | None = None
    # Gopher-style repetition gates (text.repetition_stats): drop docs
    # whose most frequent bigram / duplicate bigrams exceed these
    # fractions.  None = skip the (two-shuffle) repetition pass.
    max_top_bigram_frac: float | None = None
    max_dup_bigram_frac: float | None = None
    # dedup
    near_dedup: bool = True
    jaccard_threshold: float = 0.5
    # keep the highest value of this column per near-dup cluster
    # (None = cheapest: min id wins)
    near_dedup_keep: str | None = None
    # semantic dedup (active when an embeddings_df is passed to
    # build_corpus): SemDeDup over the doc embeddings — clusters
    # searched within only, cosine >= threshold collapses to one
    # representative (operators/semdedup.py)
    semantic_threshold: float = 0.95
    # None = scale cluster count with the corpus (semdedup auto-k)
    semantic_clusters: int | None = None
    # id column of embeddings_df; None = same name as id_col
    embedding_id_col: str | None = None
    embedding_vec_col: str = "embedding"
    # decontamination (active when an eval_df is passed)
    contamination_ngram: int = 8
    # id column of eval_df; None = same name as id_col (the docs side)
    eval_id_col: str | None = None
    # shingles occurring in more than this many TRAIN docs are too
    # common to be contamination evidence and are skipped (None =
    # consider every shingle, at quadratic hot-shingle join risk)
    contamination_max_shingle_freq: int | None = 1000
    # splitting
    split_weights: dict[str, float] = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    # DSIR selection (active when a dsir_target_df is passed to
    # build_corpus): keep this many documents, importance-resampled so
    # their hashed-ngram distribution matches the target corpus
    # (operators/dsir.py — the distribution-matching selector; the
    # budgets knob below is the per-source budget mixer)
    dsir_target_n: int | None = None
    dsir_ngram_max: int = 2
    dsir_n_buckets: int = 8192
    dsir_seed: str = ""
    # mixing / packing
    budgets: dict[str, int] | None = None
    pack_max_tokens: int | None = None
    n_shards: int = 32
    # RAG chunking: emit chunk-granularity rows (doc_id, chunk_id,
    # chunk, split, ...) instead of document rows.  Mutually exclusive
    # with pack_max_tokens — packing builds training sequences,
    # chunking builds retrieval units.  chunk_dedup drops exact-repeat
    # chunks (boilerplate windows doc-level dedup cannot see).
    chunk_size: int | None = None
    chunk_overlap: int = 0
    chunk_dedup: bool = True


def build_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    config: CorpusConfig = CorpusConfig(),
    report: bool = False,
    embeddings_df: DataFrame | None = None,
    quarantine_rules: dict | None = None,
    quarantine_sink=None,
    dsir_target_df: DataFrame | None = None,
) -> DataFrame | tuple[DataFrame, dict[str, int]]:
    """Run the full corpus pipeline over ``docs``.

    Output columns: the input's, plus ``quality_score``, ``n_tokens``,
    ``lang_pred``, ``split``, and — when packing — ``shard`` /
    ``seq_id`` / ``seq_pos``.  With ``report=True`` returns
    ``(df, {stage: rows_surviving})``.

    ``quarantine_rules`` (name -> boolean Column, see
    ``operators.expectations.row_not_null`` and friends) splits rows
    failing any rule out BEFORE every other stage — malformed rows
    never reach the tokenizer, the dedup signatures, or an exchange.
    The dead-letter side (annotated with its per-row ``violations``
    array) goes to ``quarantine_sink`` if given (e.g.
    ``lambda bad: bad.write.parquet(path)``), else is dropped; either
    way the kept side rides the same single tagging projection.
    """
    c = config
    stages: dict[str, int] = {}

    def _mark(name: str, df: DataFrame) -> DataFrame:
        if report:
            stages[name] = df.count()
        return df

    _mark("input", docs)

    if quarantine_rules is not None:
        from feast_spark.operators.expectations import quarantine

        docs, bad = quarantine(docs, quarantine_rules)
        if quarantine_sink is not None:
            quarantine_sink(bad)
        docs = _mark("quarantine", docs)

    # 0. ingestion normalization: HTML -> visible text (narrow), then
    # cross-document boilerplate-line removal (its own bounded
    # frequent-line aggregate + one doc-id shuffle) — both BEFORE
    # featurization so quality/lang/dedup see the real prose
    if c.html_input:
        from feast_spark.functions.text import with_extracted_text

        docs = with_extracted_text(docs, c.text_col, out_col=c.text_col)
    if c.scrub_pii_kinds is not None:
        from feast_spark.functions.text import PII_PATTERNS, with_scrubbed_text

        valid = {name for name, _, _ in PII_PATTERNS}
        if c.scrub_pii_kinds == "all":
            kinds = None
        else:
            # a bare string would iterate per-character ("email" ->
            # ['e','m',...]) and silently scrub NOTHING; likewise a
            # typo'd kind name — validate against PII_PATTERNS
            if isinstance(c.scrub_pii_kinds, str):
                raise ValueError(
                    f"scrub_pii_kinds string must be 'all', got "
                    f"{c.scrub_pii_kinds!r}; pass a tuple of kinds "
                    f"from {sorted(valid)}"
                )
            kinds = list(c.scrub_pii_kinds)
            unknown = [k for k in kinds if k not in valid]
            if not kinds or unknown:
                raise ValueError(
                    f"scrub_pii_kinds must be 'all' or a non-empty "
                    f"subset of {sorted(valid)}; got {c.scrub_pii_kinds!r}"
                    + (f" (unknown: {unknown})" if unknown else "")
                )
        docs = with_scrubbed_text(docs, c.text_col, kinds=kinds)
    if c.boilerplate_min_docs is not None:
        from feast_spark.operators.docdedup import dedup_lines

        docs = _mark(
            "line_dedup",
            dedup_lines(
                docs, c.id_col, c.text_col,
                min_occurrences=c.boilerplate_min_docs,
                approx=c.line_dedup_approx, approx_rsd=c.line_dedup_rsd,
            ),
        )

    if c.substring_dedup_min_chars is not None:
        from feast_spark.operators.substr_dedup import (
            strip_duplicate_substrings,
        )

        # k + w - 1 >= min_chars makes every qualifying run detectable
        half = (c.substring_dedup_min_chars + 1) // 2
        docs = _mark(
            "substring_dedup",
            strip_duplicate_substrings(
                docs, c.id_col, c.text_col, k=half, window=half + 1,
                min_dup_docs=c.substring_min_docs,
            ),
        )

    # 1. featurize + filter (narrow, pre-shuffle)
    scored = with_lang_id(
        with_quality_features(docs, c.text_col), c.text_col
    )
    gate = (
        (F.col("quality_score") >= c.min_quality)
        & (F.col("n_tokens") >= c.min_tokens)
        & (F.col("n_tokens") <= c.max_tokens_per_doc)
    )
    if c.langs is not None:
        gate = gate & F.col("lang_pred").isin(list(c.langs))
    filtered = _mark("filtered", scored.filter(gate))

    # 1b. repetition gates — its own gram aggregation, run on the
    # already-gated survivors so the two shuffles see fewer docs
    if c.max_top_bigram_frac is not None or c.max_dup_bigram_frac is not None:
        from feast_spark.functions.text import repetition_stats

        reps = repetition_stats(filtered, c.id_col, c.text_col)
        keep = F.lit(True)
        if c.max_top_bigram_frac is not None:
            keep = keep & (F.col("top_bigram_frac") <= c.max_top_bigram_frac)
        if c.max_dup_bigram_frac is not None:
            keep = keep & (F.col("dup_bigram_frac") <= c.max_dup_bigram_frac)
        filtered = _mark(
            "repetition_gate",
            filtered.join(
                reps.filter(keep).select(c.id_col), c.id_col, "leftsemi"
            ),
        )

    # 2. exact dedup on the normalized fingerprint (min id survives)
    deduped = _mark(
        "exact_dedup", exact_dedup(filtered, c.id_col, c.text_col)
    )

    # 3. near-dup resolution: pair graph → components → representative
    if c.near_dedup:
        pairs = minhash_dedup_pairs(
            deduped, c.id_col, c.text_col, threshold=c.jaccard_threshold,
            portable=c.portable_hashes,
        )
        deduped = _mark(
            "near_dedup",
            resolve_dup_groups(
                deduped, pairs, c.id_col, keep_by=c.near_dedup_keep
            ),
        )

    # 3b. semantic dedup: SemDeDup over document embeddings — catches
    # paraphrases and templated rewrites that share no shingles, the
    # failure mode of both exact and MinHash dedup
    if embeddings_df is not None:
        from feast_spark.operators.semdedup import semantic_dedup_pairs

        eid = c.embedding_id_col or c.id_col
        emb = embeddings_df.select(
            F.col(eid).alias(c.id_col), F.col(c.embedding_vec_col)
        ).join(deduped.select(c.id_col), c.id_col, "leftsemi")
        sem_pairs = semantic_dedup_pairs(
            emb, id_col=c.id_col, vec_col=c.embedding_vec_col,
            n_clusters=c.semantic_clusters, threshold=c.semantic_threshold,
        )
        deduped = _mark(
            "semantic_dedup",
            resolve_dup_groups(
                deduped, sem_pairs, c.id_col, keep_by=c.near_dedup_keep
            ),
        )

    # 4. decontamination: drop train docs sharing any n-gram with eval.
    # eval_df's id column defaults to the docs side's name (c.id_col);
    # pass eval_id_col when the eval frame names its ids differently.
    if eval_df is not None:
        hits = (
            contaminated_spans(
                deduped,
                eval_df,
                eval_id_col=c.eval_id_col or c.id_col,
                train_id_col=c.id_col,
                text_col=c.text_col,
                n=c.contamination_ngram,
                portable=c.portable_hashes,
                max_shingle_freq=c.contamination_max_shingle_freq,
            )
            .select(F.col("train_id").alias(c.id_col))
            .distinct()
        )
        deduped = _mark(
            "decontaminated", deduped.join(hits, c.id_col, "left_anti")
        )

    # 4c. optional DSIR selection: importance-resample the cleaned,
    # deduped, decontaminated pool toward the target distribution —
    # BEFORE splitting, so train/val/test all come from the selected
    # corpus (selection after splitting would skew the split ratios)
    if dsir_target_df is not None:
        if c.dsir_target_n is None:
            raise ValueError(
                "pass config.dsir_target_n (the number of documents to "
                "keep) along with dsir_target_df"
            )
        from feast_spark.operators.dsir import dsir_resample

        deduped = _mark(
            "dsir_selected",
            dsir_resample(
                deduped, dsir_target_df, n_docs=c.dsir_target_n,
                id_col=c.id_col, text_col=c.text_col,
                n_max=c.dsir_ngram_max, n_buckets=c.dsir_n_buckets,
                seed=c.dsir_seed,
            ),
        )

    # 5. deterministic split
    split = hash_split(deduped, c.id_col, c.split_weights)

    # 6. optional mixture-by-source budgeting
    if c.budgets is not None:
        split = _mark(
            "mixed",
            corpus_mix(
                split, c.id_col, "n_tokens", c.source_col, c.budgets,
                n_shards=c.n_shards,
            ),
        )

    # 7. optional sequence packing — grouped by the split column so a
    # training sequence can never contain val/test documents (a
    # sequence straddling splits would leak eval text into train and
    # leave seq_pos gaps when one split is filtered out downstream)
    if c.pack_max_tokens is not None:
        split = pack_sequences(
            split, c.id_col, "n_tokens", c.pack_max_tokens,
            n_shards=c.n_shards, group_cols=["split"],
        )

    # 7c. optional RAG chunking — chunk-granularity output; the split
    # label rides onto every chunk (narrow, no join) so retrieval
    # index builds can still respect train/val/test boundaries
    if c.chunk_size is not None:
        if c.pack_max_tokens is not None:
            raise ValueError(
                "chunk_size and pack_max_tokens are mutually exclusive: "
                "packing emits training sequences, chunking emits "
                "retrieval units"
            )
        from feast_spark.functions.text import chunk_documents, dedup_chunks

        split = chunk_documents(
            split, c.id_col, c.text_col,
            size=c.chunk_size, overlap=c.chunk_overlap,
            keep_cols=["split"],
        )
        if c.chunk_dedup:
            split = _mark("chunk_dedup", dedup_chunks(split, c.id_col))
    out = _mark("output", split)
    return (out, stages) if report else out
