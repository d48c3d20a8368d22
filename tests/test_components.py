"""Connected components + dup-group resolution.

Oracle: DuckDB recursive CTE computing min-reachable-id per node (full
transitive closure — fine at test scale), run over BOTH handcrafted
adversarial graphs and the real minhash near-dup pairs of the sf0.01
documents table.
"""

import pytest
from pyspark.sql import functions as F

from feast_spark.operators.components import (
    component_stats,
    connected_components,
    resolve_dup_groups,
)
from feast_spark.operators.docdedup import exact_dup_groups, minhash_dedup_pairs

from tests.conftest import SF_MED


def _cc_oracle(duck, edges: list[tuple[int, int]]) -> dict[int, int]:
    """min-reachable-id per node via recursive CTE."""
    if not edges:
        return {}
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    rows = duck.execute(
        f"""
        WITH RECURSIVE
        e(u, v) AS (
          SELECT u, v FROM (VALUES {vals}) AS t(u, v)
          UNION SELECT v, u FROM (VALUES {vals}) AS t(u, v)
        ),
        reach(node, r) AS (
          SELECT u, u FROM e
          UNION
          SELECT reach.node, e.v FROM reach JOIN e ON e.u = reach.r
        )
        SELECT node, MIN(r) FROM reach GROUP BY node
        """
    ).fetchall()
    return {n: c for n, c in rows}


def _spark_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Run BOTH physical paths (driver union-find and distributed
    star-contraction) and require identical labels."""
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    via_driver = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    via_spark = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert via_driver == via_spark
    return via_driver


GRAPHS = {
    "chain20": [(i, i + 1) for i in range(20)],
    "two_cliques": [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)],
    "star": [(100, i) for i in range(50)],
    "self_loop_and_dup": [(1, 1), (1, 2), (2, 1), (3, 4)],
    "reversed_chain": [(i + 1, i) for i in range(15, 0, -1)],
    "bridge": [(0, 1), (1, 2), (10, 11), (2, 10)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_oracle(spark, duck, name):
    edges = GRAPHS[name]
    got = _spark_cc(spark, edges)
    want = _cc_oracle(duck, [(a, b) for a, b in edges if a != b])
    assert got == want


def test_cc_on_real_minhash_pairs(spark, duck):
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    edges = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert len(edges) > 0, "sf0.01 documents should contain near-dups"
    got = _spark_cc(spark, edges)
    want = _cc_oracle(duck, edges)
    assert got == want


def test_resolve_dup_groups_transitive(spark):
    # A~B, B~C but no A~C edge: transitively ONE survivor (min id)
    df = spark.createDataFrame(
        [(1, "x"), (2, "x'"), (3, "x''"), (9, "unrelated")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = resolve_dup_groups(df, pairs, "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 9]


def test_resolve_dup_groups_against_exact(spark):
    """Pairs built from exact-dup groups must leave exactly the
    distinct-fingerprint survivors exact_dedup would keep."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    groups = exact_dup_groups(docs, "doc_id", "text")
    # expand each group into (keep_id, member) edges
    from feast_spark.functions.text import fingerprint_md5

    fp = docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))
    edges = (
        fp.join(groups.select("fp", "keep_id"), "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select(F.col("keep_id").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    survivors = resolve_dup_groups(docs, edges, "doc_id")
    n_distinct = docs.select(fingerprint_md5(F.col("text"))).distinct().count()
    assert survivors.count() == n_distinct


def test_component_stats(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    rows = {
        r["representative"]: r["n_members"]
        for r in component_stats(pairs).collect()
    }
    assert rows == {1: 3, 7: 2}


def test_cc_converges_within_logn_rounds(spark):
    """A 64-chain must converge without hitting max_iter (alternating
    algorithm is O(log^2 n), not O(n))."""
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, max_iter=14, driver_threshold=0)
    rows = out.collect()
    assert all(r["component"] == 0 for r in rows)
    assert len(rows) == 65


def test_resolve_keep_by_quality(spark):
    """keep_by keeps the highest-scoring member per component (ties ->
    lower id), and untouched rows always survive."""
    df = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.9),   # component {1,2,3}: 2 wins
            (10, 0.5), (11, 0.1),           # component {10,11}: 10 wins
            (99, 0.0),                       # isolated: survives
        ],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r.doc_id for r in resolve_dup_groups(
        df, pairs, "doc_id", keep_by="q"
    ).collect()}
    assert out == {2, 10, 99}
    # default keep (min id) differs on the first component
    out_min = {r.doc_id for r in resolve_dup_groups(
        df, pairs, "doc_id"
    ).collect()}
    assert out_min == {1, 10, 99}
