"""Real BPE tokenizer: distributed corpus statistics, driver merge
training, broadcast-model distributed encode.

The reference has no tokenizer at all; ``text.bpe_ish_token_count``
(this repo) counts pre-tokens as a budgeting proxy.  This module
completes the path to a REAL trained byte-pair-encoding vocabulary,
split the way a 100 TB corpus demands (the standard GPT-2-style
pipeline shape — Sennrich et al. 2016, public method):

- **pre-tokenize + count (distributed)**: explode the same JVM-side
  pre-token expression used everywhere else (``text.bpe_ish_tokens``
  — one pre-tokenizer, no Python/JVM regex skew), hash-aggregate to
  (pre_token, freq).  100 TB of text collapses to at most a few
  million distinct pre-tokens — the only thing that ever reaches the
  driver, top-``max_words`` by frequency via TakeOrdered.
- **merge training (driver)**: classic incremental BPE over the
  word-frequency table — pair counts updated in place per merge, ties
  broken lexicographically so training is fully deterministic.
  O(vocab_size) rounds over a bounded table, independent of corpus
  size.
- **encode (distributed)**: the merges table broadcasts (a few
  hundred KB); each task applies merges per pre-token with an
  LRU-less per-batch memo (Zipf's law makes the hit rate extreme), so
  encoding is a narrow map — no shuffle, no driver involvement.

Unknown characters at encode time remain as single-character tokens
(open vocabulary); ``decode`` is the exact inverse of ``encode`` by
construction (concatenating tokens restores the text byte-for-byte).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark.functions.text import bpe_ish_tokens


@dataclass(frozen=True)
class BPEModel:
    """Ranked merges + token->id vocabulary.  ``merges`` order IS the
    priority: earlier merges apply first, exactly as trained."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict[str, int]

    def merge_ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def to_rows(self) -> list[tuple[int, str, str]]:
        """(rank, left, right) rows — a serializable/registry-friendly
        form; rebuild with :func:`model_from_rows`."""
        return [(i, a, b) for i, (a, b) in enumerate(self.merges)]


def model_from_rows(rows) -> BPEModel:
    ordered = sorted(rows)
    merges = tuple((a, b) for _, a, b in ordered)
    return _with_vocab(merges)


def _with_vocab(merges: tuple[tuple[str, str], ...]) -> BPEModel:
    """Vocabulary = single characters appearing in merges + every merge
    product, ids assigned deterministically (chars sorted, then merge
    order)."""
    chars: set[str] = set()
    for a, b in merges:
        for sym in (a, b):
            if len(sym) == 1:
                chars.add(sym)
    vocab: dict[str, int] = {}
    for c in sorted(chars):
        vocab[c] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return BPEModel(merges=merges, vocab=vocab)


def _pair_stats(words: list[list[str]], freqs: list[int]):
    """pair -> total count, and pair -> set of word indices."""
    from collections import Counter, defaultdict

    counts: Counter = Counter()
    where = defaultdict(set)
    for i, (w, f) in enumerate(zip(words, freqs)):
        for a, b in zip(w, w[1:]):
            counts[(a, b)] += f
            where[(a, b)].add(i)
    return counts, where


def _merge_word(w: list[str], pair: tuple[str, str]) -> list[str]:
    a, b = pair
    out = []
    i = 0
    n = len(w)
    while i < n:
        if i + 1 < n and w[i] == a and w[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return out


def train_bpe_from_counts(
    word_freqs: dict[str, int], num_merges: int
) -> BPEModel:
    """Driver-side merge training over a (pre_token -> freq) table.

    Incremental pair-count maintenance: each merge touches only the
    words containing the merged pair.  Deterministic: max count wins,
    lexicographic pair order breaks ties."""
    words = [list(w) for w in word_freqs]
    freqs = list(word_freqs.values())
    counts, where = _pair_stats(words, freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        best_count = 0
        for pair, c in counts.items():
            if c > best_count or (c == best_count and best is not None and pair < best):
                best = pair
                best_count = c
        if best is None or best_count < 2:
            break  # nothing left worth merging
        merges.append(best)
        for i in list(where[best]):
            w = words[i]
            f = freqs[i]
            # remove old pair contributions of this word
            for p in zip(w, w[1:]):
                counts[p] -= f
                if counts[p] <= 0:
                    del counts[p]
                where[p].discard(i)
            w2 = _merge_word(w, best)
            words[i] = w2
            for p in zip(w2, w2[1:]):
                counts[p] = counts.get(p, 0) + f
                where[p].add(i)
    # seed single-character coverage from the training table even for
    # chars that never merged (so encode maps them to real ids)
    model = _with_vocab(tuple(merges))
    vocab = dict(model.vocab)
    for w in word_freqs:
        for c in w:
            if c not in vocab:
                vocab[c] = len(vocab)
    return BPEModel(merges=model.merges, vocab=vocab)


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_words: int = 1_000_000,
) -> BPEModel:
    """Distributed word counting -> driver merge loop.

    The corpus is read ONCE: explode pre-tokens, hash-aggregate
    counts (map-side partial combine shuffles only distinct
    pre-tokens), TakeOrdered the top ``max_words`` to the driver —
    bounded regardless of corpus size.  Training then never touches
    the cluster again."""
    from feast_spark.functions.text import explode_computed

    counts = (
        explode_computed(df, [], bpe_ish_tokens(F.col(text_col)), "w")
        .where(F.trim("w") != "")  # whitespace runs carry no signal
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        # TakeOrdered (orderBy+limit): never a full sort at scale
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_from_counts({r["w"]: r["freq"] for r in counts}, num_merges)


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pre-token in rank order (the canonical
    agglomerative BPE encode)."""
    syms = list(w)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    df: DataFrame,
    text_col: str,
    model: BPEModel,
    out_col: str = "tokens",
    ids_col: str | None = "token_ids",
) -> DataFrame:
    """df + (tokens array<string>[, token_ids array<int>]).

    Pre-tokenization stays JVM-side (same expression as training);
    only the per-pre-token merge application runs in Python, Arrow-
    batched, against the broadcast ranks table with a per-batch memo.
    Unknown-vocab tokens get id -1 (callers decide drop/byte-fallback
    policy)."""
    ranks = model.merge_ranks()
    vocab = model.vocab
    want_ids = ids_col is not None

    fields = [T.StructField(out_col, T.ArrayType(T.StringType()))]
    if want_ids:
        fields.append(T.StructField(ids_col, T.ArrayType(T.IntegerType())))

    pre_df = df.withColumn("__pre", bpe_ish_tokens(F.col(text_col)))
    out_schema = T.StructType([f for f in df.schema.fields] + fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(pres) -> list[str]:
            toks: list[str] = []
            if pres is None:
                return toks
            for w in pres:
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf["__pre"].map(enc)
            out = pdf.drop(columns=["__pre"])
            out[out_col] = toks
            if want_ids:
                out[ids_col] = toks.map(
                    lambda ts: [vocab.get(t, -1) for t in ts]
                )
            yield out

    return pre_df.mapInPandas(run, out_schema)


def decode_tokens(tokens: list[str]) -> str:
    """Inverse of encode: BPE merges are concatenations, so decode is
    a join — exactness is pinned by tests."""
    return "".join(tokens)


def bpe_token_count(
    df: DataFrame, text_col: str, model: BPEModel, out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """df + exact trained-tokenizer token count (the real version of
    ``text.bpe_ish_token_count``'s proxy)."""
    enc = encode_bpe(df, text_col, model, out_col="__toks", ids_col=None)
    return enc.withColumn(out_col, F.size("__toks")).drop("__toks")


def save_model(model: BPEModel, path: str) -> None:
    """Persist merges + vocab as JSON (registry-friendly: plain text,
    diffable, no pickle)."""
    import json

    with open(path, "w") as f:
        json.dump(
            {"merges": [list(m) for m in model.merges], "vocab": model.vocab},
            f,
        )


def load_model(path: str) -> BPEModel:
    import json

    with open(path) as f:
        d = json.load(f)
    return BPEModel(
        merges=tuple((a, b) for a, b in d["merges"]),
        vocab={k: int(v) for k, v in d["vocab"].items()},
    )
