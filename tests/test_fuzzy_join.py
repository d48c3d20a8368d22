"""Edit-distance join: exactness vs a DuckDB brute-force cross join,
short/long channel coverage, and the hot-gram cap trade-off."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feast_spark.operators.fuzzy_join import (
    edit_distance_join,
    edit_distance_pairs,
)

NAMES = [
    (1, "jonathan smith"),
    (2, "jonathon smith"),      # dist 1 from 1
    (3, "jon smith"),
    (4, "smith jonathan"),      # transposed words: far
    (5, "acme corporation"),
    (6, "acme corp"),           # dist 7 from 5: out at k=2
    (7, "acme corporatian"),    # dist 1 from 5
    (8, "ac"),                  # short channel
    (9, "acb"),                 # dist 1 from 8
    (10, "zz"),                 # short, far from everything
    (11, "jonathan smyth"),     # dist 1 from 1, 2 from 2
    (12, None),                 # ignored
    (13, ""),                   # empty: short channel
    (14, "a"),                  # dist 1 from "ac" and ""
]


def _brute(duck, max_dist):
    rows = [(i, s) for i, s in NAMES if s is not None]
    duck.execute("CREATE OR REPLACE TABLE _fz (id BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO _fz VALUES (?, ?)", rows)
    return set(
        map(
            tuple,
            duck.execute(
                f"""
SELECT a.id, b.id, levenshtein(a.s, b.s) AS d
FROM _fz a JOIN _fz b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= {max_dist}
"""
            ).fetchall(),
        )
    )


@pytest.mark.parametrize("max_dist", [0, 1, 2, 3])
def test_pairs_match_brute_force(spark, duck, max_dist):
    df = spark.createDataFrame(NAMES, "id long, s string")
    got = set(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "id", "s", max_dist=max_dist).collect()
    )
    assert got == _brute(duck, max_dist)


def test_two_table_join(spark):
    left = spark.createDataFrame(
        [Row(lid=1, name="acme corporation"), Row(lid=2, name="zzzz")]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, name="acme corporatian"),
            Row(rid=11, name="acme corp"),
            Row(rid=12, name="totally different"),
        ]
    )
    out = edit_distance_join(
        left, right, "lid", "name", "rid", "name", max_dist=2
    ).collect()
    assert {(r["lid_l"], r["rid_r"], r["dist"]) for r in out} == {(1, 10, 1)}


@pytest.mark.nightly
def test_hot_gram_cap_documented_tradeoff(spark):
    """With an absurd cap (every gram hot) the long channel loses its
    candidates — exactness requires max_gram_freq=None."""
    df = spark.createDataFrame(
        [Row(id=1, s="jonathan smith"), Row(id=2, s="jonathon smith")]
    )
    exact = edit_distance_pairs(df, "id", "s", max_dist=1).count()
    capped = edit_distance_pairs(
        df, "id", "s", max_dist=1, max_gram_freq=1
    ).count()
    assert exact == 1 and capped == 0


def test_validation(spark):
    df = spark.createDataFrame([Row(id=1, s="x")])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", max_dist=-1)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", q=1)


@pytest.mark.nightly
def test_customer_names_scale_shape(spark, duck):
    """Real table: sf0.001 customer names (+planted typos) — the join
    finds exactly the brute-force pairs at k=1."""
    from feast_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    cust = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lower("c_name").alias("s"),
    )
    # plant typos: drop one char from some names, offset ids
    typos = cust.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.concat(
            F.substring("s", 1, 5), F.substring("s", 7, 1000)
        ).alias("s"),
    )
    df = cust.unionByName(typos)
    got = set(
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, "id", "s", max_dist=1).collect()
    )
    rows = [(r["id"], r["s"]) for r in df.collect()]
    duck.execute("CREATE OR REPLACE TABLE _cz (id BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO _cz VALUES (?, ?)", rows)
    want = set(
        map(
            tuple,
            duck.execute(
                """
SELECT a.id, b.id FROM _cz a JOIN _cz b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
"""
            ).fetchall(),
        )
    )
    assert got == want and len(want) > 0


@pytest.mark.nightly
def test_randomized_differential_vs_python_dp(spark):
    """200 random short strings (seeded), all (size, q) in a small
    grid: operator pairs == python DP levenshtein brute force."""
    import itertools
    import random

    rng = random.Random(42)
    alphabet = "abcdef "
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            for _ in range(120)]
    # plant near-duplicates: single-char edits of random strings
    edited = []
    for i, s in enumerate(rng.sample(base, 40)):
        pos = rng.randint(0, max(0, len(s) - 1))
        op = rng.choice(["del", "sub", "ins"])
        if op == "del" and s:
            t = s[:pos] + s[pos + 1:]
        elif op == "sub" and s:
            t = s[:pos] + rng.choice(alphabet) + s[pos + 1:]
        else:
            t = s[:pos] + rng.choice(alphabet) + s[pos:]
        edited.append(t)
    strings = base + edited
    rows = [(i, s) for i, s in enumerate(strings)]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(rows, "id long, s string")
    for max_dist, q in [(1, 2), (2, 2), (2, 3)]:
        got = set(
            (r["id_a"], r["id_b"])
            for r in edit_distance_pairs(
                df, "id", "s", max_dist=max_dist, q=q
            ).collect()
        )
        want = set(
            (i, j)
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if lev(a, b) <= max_dist
        )
        assert got == want, (max_dist, q, len(got ^ want))


def test_hot_gram_cap_keeps_pairs_with_surviving_shared_grams(spark):
    """Post-drop gram counts keep the count-filter bound tight: a true
    pair whose shared grams are PARTLY hot still comes back (with
    pre-drop counts the filter would demand more common grams than
    survive the drop and lose it)."""
    # the true pair shares every gram of 'abcdefgh'; grams 'ab','bc'
    # are made hot by 10 unrelated carrier strings
    carriers = [(100 + i, f"ab{chr(105 + i)}zbc") for i in range(10)]
    rows = [(1, "abcdefgh"), (2, "abcdefgi")] + carriers
    df = spark.createDataFrame(rows, "id long, s string")
    got = set(
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(
            df, "id", "s", max_dist=1, q=2, max_gram_freq=5
        ).collect()
    )
    assert (1, 2) in got
