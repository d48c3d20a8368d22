"""Text-analysis operators for large-scale training-data pipelines.

All column expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen friendly) — no Python UDFs in the hot path, so they
scan at parquet speed on a 1000-executor cluster.

Each operator has an exact ANSI-SQL mirror (see __spark_entry__.oracle_sql)
so the driver's DuckDB gate can verify it value-for-value.
"""

from __future__ import annotations

import pandas  # noqa: F401 — resolves pandas_udf type hints at def time

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

# Public, widely-known function-word lists (top closed-class words per
# language). Used for both the quality stopword-ratio and language ID.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
}
#: deterministic tie-break order for argmax
LANG_PRIORITY = ["en", "es", "de", "fr"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text => empty array."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def explode_computed(df, cols, arr, alias: str):
    """``F.explode`` of an EXPENSIVE computed array, minus Catalyst's
    ``InferFiltersFromGenerate`` tax.

    For a plain inner explode, that rule infers ``size(arr) > 0 AND
    isnotnull(arr)`` — with the WHOLE array expression inlined — and
    predicate pushdown then sinks it below any exchange into the scan
    stage.  For a shingle/minhash/winnow array over a small-file scan
    that means the full CPU pass runs twice, once of them serialized
    on the scan's (often single) input partition — measured 6x wall on
    the sf0.1 shingle pipeline.  ``explode_outer`` is exempt from the
    rule; the ``isNotNull`` filter on the GENERATED column restores
    inner-explode row semantics and cannot be pushed below the
    Generate (it references the generator output).

    Row-identical to inner explode whenever array ELEMENTS are never
    null: a null/empty array yields one null-element row, which the
    filter drops — exactly the rows inner explode never emitted.
    Every shingle/token/fingerprint array in this package qualifies
    (xxhash64, concat_ws and struct outputs are non-null).

    ``cols`` are the pass-through columns (names or Columns)."""
    out = df.select(*cols, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


def posexplode_computed(df, cols, arr, pos_alias: str, alias: str):
    """``F.posexplode`` twin of :func:`explode_computed` — same
    InferFiltersFromGenerate dodge, filtering on the element column."""
    out = df.select(
        *cols, F.posexplode_outer(arr).alias(pos_alias, alias)
    )
    return out.filter(F.col(alias).isNotNull())


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer alternation: contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs, then
# residual whitespace.  Deliberately lookahead-free so Java regex
# (Spark) and RE2 (DuckDB oracle) agree — both engines resolve
# alternation leftmost-first, so the match sequence is identical.
# Whitespace is an EXPLICIT class (Java \s includes \x0B, RE2 \s does
# not — spelling it out keeps the two engines byte-identical).
_WS = r" \t\n\x0B\f\r"
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+"
    rf"|[{_WS}]+"
)


def bpe_ish_tokens(text: Column) -> Column:
    """Subword-boundary pre-tokens (the GPT-2 pre-tokenizer shape):
    contraction suffixes split off, letters/digits/punctuation runs
    separated, single leading space folded into the following token.
    A real BPE would merge within these; counting them is the standard
    fast proxy for tokenizer-token budgeting."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / distinctness signals
    (the standard pre-training quality heuristics)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    distinct_ratio = F.when(n_tok > 0, F.size(F.array_distinct(toks)) / n_tok).otherwise(
        F.lit(0.0)
    )
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": mean_tok_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "distinct_ratio": distinct_ratio,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score: rewards stopword presence and lexical
    variety, penalizes extreme lengths — the shape of the usual C4/Gopher
    filters, deterministic and SQL-mirrorable."""
    f = quality_features(text)
    length_ok = (
        F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return (
        length_ok * 0.25
        + f["stopword_ratio"] * 0.25
        + f["distinct_ratio"] * 0.25
        + (1.0 - f["punct_ratio"]) * 0.25
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    n_tok = F.size(toks)
    out = {}
    for lang in LANG_PRIORITY:
        words = STOPWORDS[lang]
        cnt = F.size(F.filter(toks, lambda t: t.isin(words)))
        out[lang] = F.when(n_tok > 0, cnt / n_tok).otherwise(F.lit(0.0))
    return out


def lang_id(text: Column) -> Column:
    """Stopword-ratio argmax with deterministic priority order."""
    scores = lang_scores(text)
    expr = F.lit(LANG_PRIORITY[-1])
    # build reversed cascade: earlier languages win ties
    for lang in reversed(LANG_PRIORITY[:-1]):
        cond = F.lit(True)
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            # >= for languages later in priority, > for earlier
            if LANG_PRIORITY.index(other) > LANG_PRIORITY.index(lang):
                cond = cond & (scores[lang] >= scores[other])
            else:
                cond = cond & (scores[lang] > scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# DataFrame-level variants: materialize the token array ONCE in its own
# projection.  The Column-level functions above inline `tokens(text)` into
# every sub-expression, which re-runs the regex tokenizer per reference —
# fine for one-off expressions, quadratic in hot paths (see
# operators/docdedup.with_shingles for the measured 15x difference).
# ---------------------------------------------------------------------------

def with_quality_features(
    df, text_col: str, score_col: str = "quality_score"
):
    """All quality feature columns + composite score, computed from a
    single materialized token array.

    Built as SQL snippets in TWO ``withColumns`` batches (feature
    columns, then the score over them): one analysis pass per batch
    instead of one per column, and one py4j round trip per expression
    — plan construction is real per-call wall time (see
    ``functions.text`` SQL-snippet note).  Double literals carry the
    ``D`` suffix: a bare ``0.0`` parses as DECIMAL in Spark SQL, which
    would silently change the result schema."""
    t = sql_ident(text_col)
    stops = ", ".join("'" + w + "'" for w in STOPWORDS["en"])
    punct = f"(length({t}) - length(regexp_replace({t}, '[\\\\.,;:!\\\\?]', '')))"
    df = df.withColumn("__q_toks", F.expr(tokens_sql(t)))
    df = df.withColumns(
        {
            "n_chars_q": F.expr(f"cast(length({t}) as bigint)"),
            "n_tokens": F.expr("cast(size(__q_toks) as bigint)"),
            "mean_token_len": F.expr(
                "CASE WHEN size(__q_toks) > 0 THEN "
                "aggregate(__q_toks, cast(0 as bigint), "
                "(acc, t) -> acc + length(t)) / size(__q_toks) "
                "ELSE 0.0D END"
            ),
            "punct_ratio": F.expr(
                f"CASE WHEN length({t}) > 0 THEN {punct} / length({t}) "
                "ELSE 0.0D END"
            ),
            "stopword_ratio": F.expr(
                "CASE WHEN size(__q_toks) > 0 THEN "
                f"size(filter(__q_toks, t -> t IN ({stops}))) / size(__q_toks) "
                "ELSE 0.0D END"
            ),
            "distinct_ratio": F.expr(
                "CASE WHEN size(__q_toks) > 0 THEN "
                "size(array_distinct(__q_toks)) / size(__q_toks) "
                "ELSE 0.0D END"
            ),
        }
    )
    return df.withColumn(
        score_col,
        F.expr(
            "(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 "
            "THEN 1.0D ELSE 0.0D END) * 0.25D "
            "+ stopword_ratio * 0.25D "
            "+ distinct_ratio * 0.25D "
            "+ (1.0D - punct_ratio) * 0.25D"
        ),
    ).drop("__q_toks")


def with_lang_id(df, text_col: str, out_col: str = "lang_pred"):
    """Language ID from one materialized token array.

    SQL-snippet build (one ``withColumns`` batch for the per-language
    scores, one expression for the priority cascade) — same shape and
    results as the former per-column DSL spelling, a fraction of its
    plan-construction cost."""
    t = sql_ident(text_col)
    df = df.withColumn("__l_toks", F.expr(tokens_sql(t)))
    scores = {}
    for lang in LANG_PRIORITY:
        stops = ", ".join("'" + w + "'" for w in STOPWORDS[lang])
        scores[f"__s_{lang}"] = F.expr(
            "CASE WHEN size(__l_toks) > 0 THEN "
            f"size(filter(__l_toks, t -> t IN ({stops}))) / size(__l_toks) "
            "ELSE 0.0D END"
        )
    df = df.withColumns(scores)
    expr = f"'{LANG_PRIORITY[-1]}'"
    for lang in reversed(LANG_PRIORITY[:-1]):
        conds = []
        for other in LANG_PRIORITY:
            if other == lang:
                continue
            op = ">=" if LANG_PRIORITY.index(other) > LANG_PRIORITY.index(lang) else ">"
            conds.append(f"__s_{lang} {op} __s_{other}")
        expr = (
            f"CASE WHEN true AND {' AND '.join(conds)} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    df = df.withColumn(out_col, F.expr(expr))
    return df.drop("__l_toks", *[f"__s_{lang}" for lang in LANG_PRIORITY])


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality heuristics) and TF-IDF.
# Both are explode -> groupBy shapes rather than per-row array scans:
# the per-(doc, gram) aggregation gets map-side partial combine, so at
# crawl scale shuffle volume is O(distinct grams per doc), and no single
# task ever holds a whole document's quadratic gram-pair state.
# ---------------------------------------------------------------------------

def repetition_stats(df, id_col: str, text_col: str):
    """Per-document repetition signals over unigrams and bigrams:

    * top_token_frac  — occurrences of the most frequent token / tokens
    * top_bigram_frac — occurrences of the most frequent bigram / bigrams
    * dup_bigram_frac — fraction of bigram occurrences whose bigram
                        appears more than once

    High values flag boilerplate/spam (the repetition filters of the
    usual pre-training quality stack).  Documents with < 2 tokens get
    0.0 bigram stats; documents with no tokens at all (null/empty
    text) get all-0.0 stats.

    ZERO-shuffle shape (r16): the stats are per-document, so instead of
    exploding (doc, gram) rows and shuffling every token occurrence of
    the corpus twice (gram count, then per-doc rollup — O(corpus
    tokens) exchange bytes, the dominant cost at scale), each row
    sorts its own gram array and computes (top-run length, sum of
    runs > 1) in one sequential ``aggregate`` pass: O(L log L) per
    document, a narrow projection, no Exchange anywhere.  Values are
    identical — per-gram counts within a doc ARE run lengths of the
    sorted array.  (With duplicate ids the old explode shape pooled
    the rows' grams per id; ids are per-document keys, so per-row
    stats are the intended semantics.)"""
    t = sql_ident(text_col)
    runs = (
        "aggregate(array_sort({arr}), "
        "struct(cast(null as string) AS prev, 0L AS run, 0L AS best, 0L AS dup), "
        "(acc, x) -> CASE WHEN acc.prev IS NOT NULL AND x = acc.prev THEN "
        "struct(x AS prev, acc.run + 1L AS run, "
        "greatest(acc.best, acc.run + 1L) AS best, "
        "acc.dup + (CASE WHEN acc.run = 1L THEN 2L ELSE 1L END) AS dup) "
        "ELSE struct(x AS prev, 1L AS run, greatest(acc.best, 1L) AS best, "
        "acc.dup) END, "
        "acc -> struct(acc.best AS best, acc.dup AS dup))"
    )
    bigrams = (
        "CASE WHEN size(__toks) < 2 THEN cast(array() as array<string>) "
        "ELSE transform(sequence(0, size(__toks) - 2), "
        "i -> concat_ws(' ', slice(__toks, i + 1, 2))) END"
    )
    return (
        df.select(
            "*",
            F.expr(tokens_sql(normalize_text_sql(t))).alias("__toks"),
        )
        .withColumns(
            {
                "__uni": F.expr(runs.format(arr="__toks")),
                "__bi": F.expr(runs.format(arr=bigrams)),
            }
        )
        .withColumns(
            {
                "top_token_frac": F.expr(
                    "CASE WHEN size(__toks) > 0 THEN "
                    "__uni.best / size(__toks) ELSE 0.0D END"
                ),
                "top_bigram_frac": F.expr(
                    "CASE WHEN size(__toks) > 1 THEN "
                    "__bi.best / (size(__toks) - 1) ELSE 0.0D END"
                ),
                "dup_bigram_frac": F.expr(
                    "CASE WHEN size(__toks) > 1 THEN "
                    "__bi.dup / (size(__toks) - 1) ELSE 0.0D END"
                ),
            }
        )
        .select(
            id_col, "top_token_frac", "top_bigram_frac", "dup_bigram_frac"
        )
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k terms per document by TF-IDF (idf = ln(N/df), ties broken
    by term asc).  Standard explode -> two aggregations; the corpus size
    N rides in via a broadcast 1-row aggregate, never a collect."""
    toks = tokens(normalize_text(F.col(text_col)))
    terms = explode_computed(df, [F.col(id_col)], toks, "term")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).alias("__n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("__n_docs") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tf", "df", F.col("__rn").alias("rank"), "tfidf")
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase + collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


# -- SQL-snippet twins of the hot leaf expressions ----------------------
#
# Plan CONSTRUCTION cost is real wall time in the per-call query
# contract (the bench/driver builds a cold DataFrame every run): each
# Column DSL node is a py4j round trip and every new Dataset re-runs
# analysis over the whole tree.  Building a big expression as ONE
# ``F.expr`` string collapses hundreds of round trips into one parse
# call JVM-side — measured 5x on the shingle pipeline's build phase.
# These snippets are the exact SQL spellings of the DSL helpers above
# (identity pinned by tests); compose them with ``.format``/f-strings
# and wrap the result in ``F.expr`` once.

def sql_ident(name: str) -> str:
    """Backtick-quote a column name for safe splicing into SQL."""
    return "`" + name.replace("`", "``") + "`"


def normalize_text_sql(x: str) -> str:
    """SQL twin of :func:`normalize_text` (x = SQL expression text)."""
    return f"regexp_replace(lower(trim({x})), '\\\\s+', ' ')"


def tokens_sql(x: str) -> str:
    """SQL twin of :func:`tokens` (x = SQL expression text)."""
    return (
        f"CASE WHEN length(trim({x})) = 0 THEN cast(array() as array<string>) "
        f"ELSE split(trim({x}), '\\\\s+') END"
    )


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 over the normalized text (same hex in
    every engine — DuckDB md5() matches, enabling exact dedup oracles)."""
    return F.md5(normalize_text(text))


# -- PII scrubbing (training-data hygiene) ------------------------------

#: pattern -> replacement token, applied in order (emails before URLs so
#: user@host in a URL query string doesn't split the URL match; specific
#: numeric shapes before the generic long-digit-run catch-all)
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "url",
        r"(?:https?://|www\.)[^\s<>\"']+",
        "<URL>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "card",
        r"\b\d(?:[ -]?\d){12,18}\b",
        "<CARD>",
    ),
    (
        "phone",
        r"(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3,4}[ .-]\d{3,4}(?:[ .-]\d{2,4})?",
        "<PHONE>",
    ),
]


def scrub_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Mask PII spans with typed placeholder tokens — emails, URLs,
    IPv4s, SSNs, card-like digit runs, phone numbers — as a chain of
    ``regexp_replace`` column expressions: pure JVM, codegen'd, no
    Python on executors.  The standard corpus-hygiene pass a training
    pipeline runs before dedup/quality (placeholders keep token
    positions stable so downstream stats stay comparable).

    ``kinds`` restricts which patterns run (default: all, in
    ``PII_PATTERNS`` order, which is precedence order)."""
    out = text
    for name, pattern, token in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        out = F.regexp_replace(out, pattern, token)
    return out


def with_scrubbed_text(
    df,
    text_col: str,
    out_col: str | None = None,
    kinds: list[str] | None = None,
):
    """df + scrubbed text column (in place when ``out_col`` is None)."""
    return df.withColumn(out_col or text_col, scrub_pii(F.col(text_col), kinds))


def with_compression_stats(
    df,
    text_col: str,
    out_col: str = "deflate_ratio",
    level: int = 6,
):
    """df + per-document deflate compression ratio (compressed bytes /
    raw UTF-8 bytes; empty text -> NULL).

    The classic cheap quality signal the public corpus pipelines
    (CCNet, Gopher, RefinedWeb — published methods) filter on: highly
    repetitive or templated text compresses far below ~0.4, random
    noise sits near 1.0, natural prose lands in between.  zlib isn't
    expressible as a column expression, so this is an Arrow-batched
    pandas UDF — still a narrow map (no shuffle), and the deflate of a
    document is independent per row so the operator scales linearly."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pandas.Series) -> pandas.Series:
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return df.withColumn(out_col, ratio(F.col(text_col)))


def url_domain(url: Column) -> Column:
    """Registrable host of a URL, lowercased — scheme, userinfo, port,
    path, query stripped; bare hosts (no scheme) handled.  Pure
    ``regexp_extract``: JVM-side, codegen'd, and expressible in the
    DuckDB oracle with the same pattern semantics."""
    host = F.regexp_extract(
        F.lower(url), r"^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)", 1
    )
    return F.nullif(host, F.lit(""))


def with_url_domain(df, url_col: str, out_col: str = "domain"):
    """df + lowercased host column (the group key for per-domain caps
    and domain-mix stats — see ``operators.packing.cap_per_group``)."""
    return df.withColumn(out_col, url_domain(F.col(url_col)))


def html_to_text(html: Column) -> Column:
    """Strip HTML to visible text with a chain of JVM regexp passes:
    drop script/style/comment blocks, turn block-level closers into
    newlines, remove remaining tags, decode the common entities, and
    collapse runs of blank lines/spaces.  Not a browser — a corpus
    ingestion heuristic (the shape CCNet/C4 apply before quality
    filtering); pages needing real DOM semantics deserve an external
    extractor upstream."""
    t = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?i)<br\s*/?>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\x0B\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # Spark trim() strips spaces only; take newlines off the ends too
    return F.regexp_replace(F.trim(t), r"^\n+|\n+$", "")


def with_extracted_text(df, html_col: str, out_col: str = "text"):
    """df + extracted-visible-text column."""
    return df.withColumn(out_col, html_to_text(F.col(html_col)))


# -- RAG / context-window chunking --------------------------------------

def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    size: int = 100,
    overlap: int = 20,
    keep_cols: list[str] | None = None,
):
    """Split documents into fixed-size overlapping CHARACTER windows —
    the retrieval chunking pass that must preserve exact source text
    and offsets (cite-back spans, highlight ranges, substring
    provenance).  One row per chunk with its 0-based ``chunk_id``,
    1-based ``chunk_start`` offset, the ``chunk`` text (verbatim
    substring — whitespace untouched), and ``n_chunk_chars`` (the tail
    chunk may be shorter).  Sibling: ``operators.packing.
    chunk_documents`` chunks by token windows (tokens re-joined with
    single spaces) for embedding-budget-shaped chunks; use this one
    whenever byte-exact text or offsets matter.

    Start offsets are ``1, 1+step, 1+2*step, ...`` with
    ``step = size - overlap``, up to ``greatest(1, length - overlap)``
    so the final window still covers the document tail without
    emitting a chunk that lies entirely inside the previous one.
    Null/empty documents produce no chunks.

    Scale: pure narrow plan — ``sequence`` + ``posexplode`` +
    ``substr`` are all JVM column expressions inside one codegen stage;
    zero shuffle, zero Python, and the row expansion factor is
    ``~length/step`` per document, independent of corpus size.  At
    100 TB this runs at parquet-scan speed and the output can be
    written back partition-aligned with the input (no Exchange is ever
    introduced).  An embedding/tokenizer stage downstream would be the
    expensive part, not this.

    ``keep_cols`` carries extra per-document columns (split labels,
    language, source) onto every chunk row — still narrow, no join."""
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.length(text) - F.lit(overlap)),
        F.lit(step),
    )
    extras = list(keep_cols or [])
    return (
        posexplode_computed(
            df.filter(text.isNotNull() & (F.length(text) > 0)),
            [F.col(id_col), *[F.col(c) for c in extras], text.alias("__text")],
            starts,
            "chunk_id",
            "chunk_start",
        )
        .select(
            id_col,
            *extras,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.col("__text").substr(F.col("chunk_start"), F.lit(size)).alias("chunk"),
        )
        .withColumn("n_chunk_chars", F.length("chunk").cast("long"))
    )


def dedup_chunks(chunks, id_col: str, chunk_col: str = "chunk"):
    """Exact chunk-level dedup: among chunks with the same normalized
    fingerprint, the first by (doc id, chunk_id) survives.  Catches
    the RAG failure mode chunking CREATES — boilerplate windows
    (headers, footers, licenses) repeated across thousands of
    documents that doc-level dedup cannot see.  One shuffle of
    fixed-width fingerprints (same cost argument as exact_dedup)."""
    w = Window.partitionBy("__cfp").orderBy(
        F.col(id_col).asc(), F.col("chunk_id").asc()
    )
    return (
        chunks.withColumn("__cfp", fingerprint_md5(F.col(chunk_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__cfp", "__rn")
    )
