"""Scale-curve harness: generator determinism + shape constancy, and an
env-gated end-to-end smoke (the full 1x/3x/10x run is tools/scale_curve.py;
measured results live in SCALE.md "Measured scale curve")."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from scale_curve import fit_exponent, gen_documents, gen_embeddings, generate


def test_generator_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    gen_documents(str(a), 0.05)
    gen_documents(str(b), 0.05)
    assert (a / "documents.parquet").read_bytes() == (
        b / "documents.parquet"
    ).read_bytes()
    gen_embeddings(str(a), 0.05)
    gen_embeddings(str(b), 0.05)
    assert (a / "embeddings.parquet").read_bytes() == (
        b / "embeddings.parquet"
    ).read_bytes()


def test_shape_constant_across_scales(tmp_path):
    """The exponent is only meaningful if the corpus SHAPE is fixed
    while volume grows: dup rate and events-per-user must not drift
    between scales."""
    d1 = generate(str(tmp_path), 0.1)
    d4 = generate(str(tmp_path), 0.4)
    con = duckdb.connect()

    def dup_rate(d):
        n, uniq = con.execute(
            f"SELECT count(*), count(DISTINCT md5(text)) FROM '{d}/documents.parquet'"
        ).fetchone()
        return 1 - uniq / n

    r1, r4 = dup_rate(d1), dup_rate(d4)
    assert abs(r1 - r4) < 0.05, (r1, r4)

    def events_per_user(d):
        n, u = con.execute(
            f"SELECT count(*), count(DISTINCT user_id) FROM '{d}/events.parquet'"
        ).fetchone()
        return n / u

    e1, e4 = events_per_user(d1), events_per_user(d4)
    assert abs(e1 - e4) / e1 < 0.15, (e1, e4)
    # volume actually scales
    (n1,) = con.execute(
        f"SELECT count(*) FROM '{d1}/documents.parquet'"
    ).fetchone()
    (n4,) = con.execute(
        f"SELECT count(*) FROM '{d4}/documents.parquet'"
    ).fetchone()
    assert n4 == 4 * n1


def test_fit_exponent():
    assert abs(fit_exponent([1, 10], [2.0, 20.0]) - 1.0) < 1e-9
    assert abs(fit_exponent([1, 4, 16], [3.0, 3.0, 3.0])) < 1e-9


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 for the end-to-end curve smoke",
)
def test_curve_end_to_end_smoke(spark, tmp_path):
    from scale_curve import run_curve

    res = run_curve(
        spark,
        str(tmp_path),
        scales=[0.05, 0.1],
        runs=1,
        op_names=["pit_join", "corpus_clean"],
    )
    assert set(res) == {"pit_join", "corpus_clean"}
    for r in res.values():
        assert set(r["times"]) == {"x0.05", "x0.1"}
        assert r["exponent"] is not None
