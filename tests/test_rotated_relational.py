"""Queries rotated out of the driver's 50-entry gate (their
capabilities keep driver-gated siblings: rollup_revenue,
customers_no_orders, nation_revenue, table_profile; entity_row_key's
F1/F2 cast+concat semantics stay gated via pit_join_composite_key)
stay value-checked here with their original DuckDB oracles.
"""

import __spark_entry__ as entry_mod

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
}


def _norm(v):
    import math
    from datetime import datetime

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
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
