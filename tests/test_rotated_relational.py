"""Queries rotated out of the driver's 50-entry gate (their
capabilities keep driver-gated siblings: rollup_revenue,
customers_no_orders, nation_revenue, table_profile; entity_row_key's
F1/F2 cast+concat semantics stay gated via pit_join_composite_key)
stay value-checked here with their original DuckDB oracles.
"""

import __spark_entry__ as entry_mod
from __spark_entry__ import _NORM_TEXT  # noqa: F401 (used in f-string oracles)

from tests.conftest import SF_MED

_ORACLES = {
    "cube_flags": """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "doc_len_percentiles": """
SELECT lang,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       quantile_cont(n_chars, 0.99) AS p99,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
""",
    "buyers_never_click": """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-20'
""",
    "entity_row_key": """
SELECT event_id,
       md5(concat_ws('|', CAST(user_id AS VARCHAR), CAST(event_id AS VARCHAR)))
         AS row_key
FROM events
""",
    # rotated r15 (exact-cosine-pair math stays gated inside
    # ann_topk_cosine + semdedup's verify stage) for contamination
    "embed_near_dup": """
WITH ac AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
            * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) AS cos
FROM ac a JOIN ac b ON a.vec_id < b.vec_id
WHERE ROUND(
         list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
            * sqrt(list_sum(list_transform(b.e, x -> x * x)))), 6) >= 0.35
""",
    "simhash_pairs": f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array({_NORM_TEXT}, '\\s+') AS toks
  FROM documents
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
  SELECT doc, CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT) AS hv
  FROM post
), bits AS (
  SELECT doc, b AS bit,
         SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS score
  FROM h, (SELECT unnest(range(60)) AS b)
  GROUP BY doc, b
), fp AS (
  SELECT doc,
         CAST(SUM(CASE WHEN score > 0 THEN (1::BIGINT << bit) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc
), qd0 AS (
  SELECT doc, simhash, q, (simhash >> (16 * q)) & 65535 AS qval
  FROM fp CROSS JOIN (SELECT unnest(range(4)) AS q) qs
), qd AS (
  SELECT * FROM qd0
  QUALIFY COUNT(*) OVER (PARTITION BY q, qval) <= 1000
)
SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM qd a JOIN qd b ON a.q = b.q AND a.qval = b.qval AND a.doc < b.doc
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    # -- rotated out in round 9 (P3 range semantics stay gated via the
    # ttl'd PIT queries and window aggregates) --
    "time_range_filter": """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
""",
    "local_supplier_volume": """
SELECT n_name,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    # -- rotated out in round 8 (each double-covered by a gated sibling) --
    "field_mapping": """
SELECT c_custkey AS customer_id, c_acctbal AS balance, c_mktsegment
FROM customer
""",
    "part_type_stats": """
SELECT p_type, COUNT(*) AS n_parts,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price,
       AVG(p_retailprice) AS avg_price
FROM part GROUP BY p_type
""",
    "token_count": """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       END AS n_tokens
FROM documents
""",
    "doc_fingerprint": """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
""",
    # -- rotated out in round 9 (gate slots went to cdc_merge,
    # lag_features, edit_distance_join, decayed_agg, sketch_distinct,
    # hybrid_rrf, bm25_index_topk, online_serving) --
    "pit_join_no_ttl": entry_mod._PIT_ORACLE.format(
        ttl_pred="", entity_pred=""
    ),
    "pit_join_key_mapping": """
WITH entity AS (
  SELECT event_id, user_id AS uid, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), feat AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'view'
), ranked AS (
  SELECT e.event_id, e.uid, e.ts, f.value, f.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY f.ts DESC) rn
  FROM entity e
  LEFT JOIN feat f
    ON e.uid = f.user_id AND f.ts <= e.ts AND f.ts >= e.ts - INTERVAL 2 DAY
)
SELECT event_id, uid, ts,
       CASE WHEN fts IS NULL THEN NULL ELSE value END AS view_value
FROM ranked WHERE rn = 1
""",
    "nation_revenue": """
SELECT r_name, n_name,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "order_enrich": """
SELECT o_orderkey, o_totalprice, c_name, n_name AS nation_name
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
""",
    "topk_revenue": """
SELECT l_orderkey,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    "dedup_groups": f"""
SELECT {entry_mod._NORM_MD5} AS fp, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
""",
    "hash_split": """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 100 AS b
  FROM documents
)
""",
    "distinct_daily_users": """
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       SUM(value) AS sum_value
FROM events
GROUP BY 1
""",
    # -- rotated out in round 10 (gate slots went to pagerank,
    # drift_psi, dedup_against_index) --
    "ngram_jaccard_pairs": f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array({_NORM_TEXT}, '\\s+') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      ELSE list_transform(range(1, len(toks) - 1),
                          i -> array_to_string(toks[i:i+2], ' '))
      END) AS shingles
  FROM tk
), sizes AS (
  SELECT doc_id AS doc, len(shingles) AS n_sh FROM sh
), post AS (
  SELECT doc_id AS doc, unnest(shingles) AS shingle FROM sh
), capped AS (
  SELECT doc, shingle FROM (
    SELECT doc, shingle, COUNT(*) OVER (PARTITION BY shingle) AS freq FROM post
  ) WHERE freq <= 1000
), common AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS common
  FROM capped a JOIN capped b USING (shingle)
  WHERE a.doc < b.doc
  GROUP BY 1, 2
)
SELECT id_a, id_b, common / (na.n_sh + nb.n_sh - common) AS jaccard
FROM common
JOIN sizes na ON na.doc = id_a
JOIN sizes nb ON nb.doc = id_b
WHERE common / (na.n_sh + nb.n_sh - common) >= 0.5
""",
    "ann_lsh": entry_mod._ann_lsh_oracle(),
    "rollup_revenue": """
SELECT r_name, n_name,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    # -- rotated out in round 11 (gate slots went to semdedup,
    # hybrid_index_topk, ivfpq_index_topk) --
    "pit_join_composite_key": """
WITH entity AS (
  SELECT DISTINCT l_orderkey, l_suppkey, l_shipdate + INTERVAL 5 DAY AS query_ts
  FROM lineitem WHERE l_linenumber = 1
), ranked AS (
  SELECT e.l_orderkey, e.l_suppkey, e.query_ts,
         f.l_quantity, f.l_extendedprice, f.l_shipdate AS fts,
         ROW_NUMBER() OVER (
           PARTITION BY e.l_orderkey, e.l_suppkey, e.query_ts
           ORDER BY f.l_shipdate DESC, f.l_linenumber DESC) rn
  FROM entity e
  LEFT JOIN lineitem f
    ON f.l_orderkey = e.l_orderkey AND f.l_suppkey = e.l_suppkey
   AND f.l_shipdate <= e.query_ts
   AND f.l_shipdate >= e.query_ts - INTERVAL 30 DAY
)
SELECT l_orderkey, l_suppkey, query_ts,
       CASE WHEN fts IS NULL THEN NULL ELSE l_quantity END AS l_quantity,
       CASE WHEN fts IS NULL THEN NULL ELSE l_extendedprice END AS l_extendedprice
FROM ranked WHERE rn = 1
""",
    "pit_join_list_feature": """
WITH entity AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), feat AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, [value, value * 2] AS vals
  FROM events WHERE event_type = 'view'
), ranked AS (
  SELECT e.event_id, e.user_id, e.ts,
         f.vals, f.ts AS fts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY f.ts DESC) rn
  FROM entity e
  LEFT JOIN feat f
    ON e.user_id = f.user_id AND f.ts <= e.ts
   AND f.ts >= e.ts - INTERVAL 2 DAY
)
SELECT event_id, user_id, ts,
       CASE WHEN fts IS NULL THEN NULL ELSE vals[1] END AS val0,
       CASE WHEN fts IS NULL THEN NULL ELSE vals[2] END AS val1
FROM ranked WHERE rn = 1
""",
    # the inline hybrid and the gated hybrid_index_topk share ONE
    # oracle by design: the persisted-index path at n_probe=all must
    # land exactly where the corpus scan does
    "hybrid_rrf": entry_mod._hybrid_oracle(),
    # rotated r16 (for dataset_diff): A2's created-ts tie-break over a
    # unioned frame — A1 stays exercised by every PIT query and the
    # rotated latest_per_key below
    "latest_per_key_created": """
WITH both_v AS (
  SELECT user_id, ts, value, CAST(1 AS BIGINT) AS created FROM events
  UNION ALL
  SELECT user_id, ts, value * 2 AS value, CAST(2 AS BIGINT) AS created FROM events
)
SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, created
FROM (
  SELECT user_id, ts, value, created,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, created DESC) rn
  FROM both_v
) WHERE rn = 1
""",
    # rotated r13: A1 latest-per-key dedup — the SAME operators/dedup.
    # latest_per_key function stays value-checked via
    # latest_per_key_created (tie-break superset over a unioned frame,
    # itself rotated here in r16)
    "latest_per_key": """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
FROM (
  SELECT user_id, event_type, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC) rn
  FROM events
) WHERE rn = 1
""",
    # rotated r12: inline corpus-scan BM25 (tokenizer + scorer are the
    # same functions gated inside bm25_index_topk / the hybrid gates)
    "bm25_topk": f"""
WITH tk AS (
  SELECT doc_id, unnest(regexp_split_to_array({_NORM_TEXT}, '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
lens AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array({_NORM_TEXT}, '\\s+')) END
           AS len_d
  FROM documents
),
stats AS (SELECT count(*) AS n_docs, avg(len_d) AS avg_len FROM lens),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tk
  WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2
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
SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 15
""",
}

_FUNCS = {
    "cube_flags": entry_mod.q_cube_flags,
    "doc_len_percentiles": entry_mod.q_doc_len_percentiles,
    "buyers_never_click": entry_mod.q_buyers_never_click,
    "local_supplier_volume": entry_mod.q_local_supplier_volume,
    "entity_row_key": entry_mod.q_entity_row_key,
    "field_mapping": entry_mod.q_field_mapping,
    "part_type_stats": entry_mod.q_part_type_stats,
    "token_count": entry_mod.q_token_count,
    "doc_fingerprint": entry_mod.q_doc_fingerprint,
    "pit_join_no_ttl": entry_mod.q_pit_join_no_ttl,
    "pit_join_key_mapping": entry_mod.q_pit_join_key_mapping,
    "nation_revenue": entry_mod.q_nation_revenue,
    "order_enrich": entry_mod.q_order_enrich_broadcast,
    "topk_revenue": entry_mod.q_topk_revenue,
    "dedup_groups": entry_mod.q_dedup_groups,
    "hash_split": entry_mod.q_hash_split,
    "distinct_daily_users": entry_mod.q_distinct_daily_users,
    "time_range_filter": entry_mod.q_time_range_filter,
    "simhash_pairs": entry_mod.q_simhash_pairs,
    "ngram_jaccard_pairs": entry_mod.q_ngram_jaccard_pairs,
    "ann_lsh": entry_mod.q_ann_lsh,
    "rollup_revenue": entry_mod.q_rollup_revenue,
    "pit_join_composite_key": entry_mod.q_pit_join_composite_key,
    "pit_join_list_feature": entry_mod.q_pit_join_list_feature,
    "hybrid_rrf": entry_mod.q_hybrid_rrf,
    "bm25_topk": entry_mod.q_bm25_topk,
    "latest_per_key": entry_mod.q_latest_per_key,
    "latest_per_key_created": entry_mod.q_latest_per_key_created,
    "embed_near_dup": entry_mod.q_embed_near_dup,
}


def _norm(v):
    import math
    from datetime import datetime

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime):
        # tz-faithful, like tools/selfcheck._norm: the driver gate
        # hashes tz-aware and naive timestamps differently, so a
        # rotated oracle must stay gate-clean in case it rotates back
        return v.isoformat()
    return v


def _rows(rows):
    return sorted(tuple(repr(_norm(v)) for v in r) for r in rows)


def test_rotated_queries_still_match_oracles(spark, duck):
    for name, fn in _FUNCS.items():
        sdf = fn(spark, SF_MED)
        srows = [tuple(r) for r in sdf.collect()]
        cur = duck.execute(_ORACLES[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        assert sdf.columns == ocols, name
        assert len(srows) == len(orows), name
        assert _rows(srows) == _rows(orows), name
