"""Approximate string join (record linkage) — all pairs within a
Levenshtein edit-distance budget, without the cross join.

The classic entity-resolution workload (customer/name/address matching
across two tables) at its scale-correct shape, following the q-gram
filtering line of work (Gravano et al., VLDB'01 — public method):

1. **Length filter** — ``|len(a) - len(b)| <= k`` is a necessary
   condition for edit distance <= k; applied inside the candidate join.
2. **Q-gram blocking** — one edit operation destroys at most ``q``
   of a string's (unpadded, distinct) q-grams, so two strings within
   edit distance ``k`` share at least ``max(na, nb) - k*q`` grams
   (``na = len(a) - q + 1``).  Candidates come from an inverted-index
   self/two-table join on grams with that count filter — shuffle
   O(posting rows), never O(|L| x |R|).
3. **Short-string side channel** — when ``na <= k*q`` the bound
   degenerates (a true pair may share zero grams), so strings shorter
   than ``q + k*q`` chars are routed through length-bucket blocking
   instead (all pairs within the same +-k length band — bounded,
   because the strings are tiny and few per band at scale).
4. **Verify** — ``F.levenshtein`` (JVM codegen) on the surviving
   candidates only; the filters are conservative, so the result is
   EXACT: every pair within ``max_dist`` is found (differentially
   tested against a DuckDB brute-force cross join).

``max_gram_freq`` caps pathological grams (the hot-shingle argument of
``docdedup.jaccard_pairs``): a gram occurring in more than that many
strings fans out quadratically in the candidate join.  Unlike the
jaccard cap, dropping grams here can lose candidate pairs whose ONLY
shared grams are hot — leave it ``None`` for the exactness guarantee,
set it when joining web-scale name tables where the hot grams are
boilerplate ("ltd", "inc") that the short channel and remaining grams
usually still cover.

Measured (SCALE.md, r9 curve on Zipf-hot-word + unique-tail names):
uncapped growth is quadratic in the hot gram's posting list — tail
exponent 1.90 over a decade, 41s at 50k names — while
``max_gram_freq=2000`` holds 0.61.  The cap is not optional at
web scale on natural-name corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_join", "edit_distance_pairs"]


def _qgrams(col, q: int):
    # distinct unpadded q-grams; strings shorter than q yield none
    # (the when-guard matters: sequence(1, 0) would run DESCENDING)
    return F.when(
        F.length(col) < q, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - q + 1),
                lambda i: col.substr(i, F.lit(q)),
            )
        )
    )


def _side(df: DataFrame, id_col: str, str_col: str, q: int, tag: str):
    from feast_spark.operators.docdedup import widen_parallelism

    s = F.col(str_col)
    # gram construction is CPU-bound; widen a few-files scan up to the
    # session parallelism (no-op at scale — same guard as bm25/docdedup)
    return widen_parallelism(df).select(
        F.col(id_col).alias(f"id_{tag}"),
        s.alias(f"s_{tag}"),
        F.length(s).alias(f"len_{tag}"),
        _qgrams(s, q).alias(f"g_{tag}"),
    ).filter(s.isNotNull())


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """All (left_id, right_id, dist) pairs with
    ``levenshtein(left_col, right_col) <= max_dist``.

    Shuffles: gram postings join (O(postings)), pair-count agg, and
    the short-band self-join — never a cross join.  Exact when
    ``max_gram_freq`` is None (see module docstring)."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    a = _side(left, left_id, left_col, q, "a")
    b = _side(right, right_id, right_col, q, "b")
    short_len = q + max_dist * q  # below this, the gram bound degenerates

    # -- gram channel (long strings) ------------------------------------
    from feast_spark.functions.text import explode_computed

    pa = explode_computed(
        a.filter(F.col("len_a") >= short_len), ["id_a", "len_a"], "g_a", "gram"
    )
    pb = explode_computed(
        b.filter(F.col("len_b") >= short_len), ["id_b", "len_b"], "g_b", "gram"
    )
    if max_gram_freq is not None:
        hot = (
            pa.select("gram").unionByName(pb.select("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__freq"))
            .filter(F.col("__freq") > max_gram_freq)
            .select("gram")
        )
        pa = pa.join(F.broadcast(hot), "gram", "left_anti")
        pb = pb.join(F.broadcast(hot), "gram", "left_anti")
    # gram counts computed AFTER the (optional) hot-gram drop: the
    # bound stays sound on the reduced sets (|Ga' ∩ Gb'| >=
    # |Ga ∩ Gb| - |Ga ∩ H| >= na' - k*q, same argument both sides) and
    # stays TIGHT — counting dropped grams in na/nb would demand more
    # common grams than can exist and lose pairs beyond the documented
    # only-shared-grams-are-hot class
    na_tbl = pa.groupBy("id_a").agg(F.count(F.lit(1)).alias("na"))
    nb_tbl = pb.groupBy("id_b").agg(F.count(F.lit(1)).alias("nb"))
    cand_long = (
        pa.join(pb, "gram")
        .filter(
            (F.col("len_a") - F.col("len_b") <= max_dist)
            & (F.col("len_b") - F.col("len_a") <= max_dist)
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .join(na_tbl, "id_a")
        .join(nb_tbl, "id_b")
        .filter(
            F.col("common")
            >= F.greatest(F.col("na"), F.col("nb")) - F.lit(max_dist * q)
        )
        .select("id_a", "id_b")
    )

    # -- short channel: length-band blocking ----------------------------
    sa = a.filter(F.col("len_a") < short_len).select("id_a", "s_a", "len_a")
    sb = b.filter(F.col("len_b") < short_len).select("id_b", "s_b", "len_b")
    cand_short = sa.join(
        sb,
        (F.col("len_a") - F.col("len_b") <= max_dist)
        & (F.col("len_b") - F.col("len_a") <= max_dist),
    ).select("id_a", "id_b")

    # -- cross channel: one side short, the other just above the cut ---
    # (a short string can match a long one only if lengths still differ
    # by <= k; band the long side's low edge)
    ca = a.filter(
        (F.col("len_a") >= short_len)
        & (F.col("len_a") < short_len + max_dist)
    ).select("id_a", "s_a", "len_a")
    cb = b.filter(F.col("len_b") < short_len).select("id_b", "s_b", "len_b")
    cand_cross_1 = ca.join(
        cb, (F.col("len_a") - F.col("len_b")) <= max_dist
    ).select("id_a", "id_b")
    cc = b.filter(
        (F.col("len_b") >= short_len)
        & (F.col("len_b") < short_len + max_dist)
    ).select("id_b", "s_b", "len_b")
    cd = a.filter(F.col("len_a") < short_len).select("id_a", "s_a", "len_a")
    cand_cross_2 = cd.join(
        cc, (F.col("len_b") - F.col("len_a")) <= max_dist
    ).select("id_a", "id_b")

    cands = (
        cand_long.unionByName(cand_short)
        .unionByName(cand_cross_1)
        .unionByName(cand_cross_2)
        .distinct()
    )

    # -- verify ---------------------------------------------------------
    return (
        cands.join(a.select("id_a", "s_a"), "id_a")
        .join(b.select("id_b", "s_b"), "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("id_a").alias(left_id + "_l"),
            F.col("id_b").alias(right_id + "_r"),
            "dist",
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Self-join convenience: distinct (id_a < id_b, dist) pairs within
    the edit budget — fuzzy key dedup over one table."""
    out = edit_distance_join(
        df, df, id_col, str_col, id_col, str_col,
        max_dist=max_dist, q=q, max_gram_freq=max_gram_freq,
    )
    la, lb = f"{id_col}_l", f"{id_col}_r"
    return (
        out.filter(F.col(la) < F.col(lb))
        .select(
            F.col(la).alias("id_a"), F.col(lb).alias("id_b"), "dist"
        )
    )
