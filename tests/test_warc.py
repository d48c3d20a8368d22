"""WARC ingestion: member-gzip parsing, response filtering, charset
decode, and the distributed binaryFile -> mapInPandas scan."""

import pytest

from feast_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

RECORDS = [
    {
        "record_id": "<urn:uuid:1>",
        "target_uri": "https://example.com/a",
        "warc_date": "2021-05-01T10:00:00Z",
        "content_type": "text/html; charset=utf-8",
        "http_status": 200,
        "text": "<html><body><p>Hello wörld</p></body></html>",
    },
    {
        "record_id": "<urn:uuid:2>",
        "target_uri": "https://example.org/b",
        "warc_date": "2021-05-01T11:00:00Z",
        "content_type": "text/plain; charset=iso-8859-1",
        "http_status": 404,
        "text": "not found",
    },
]


@pytest.mark.parametrize("gz", [True, False])
def test_parse_roundtrip(gz):
    payload = write_warc(RECORDS, gzip_members=gz)
    got = list(parse_warc_bytes(payload, path="x.warc"))
    assert len(got) == 2
    assert got[0]["target_uri"] == "https://example.com/a"
    assert got[0]["http_status"] == 200
    assert "Hello wörld" in got[0]["text"]
    assert got[1]["http_status"] == 404
    assert got[1]["content_type"].startswith("text/plain")
    assert all(r["warc_file"] == "x.warc" for r in got)


def test_non_response_records_skipped():
    """warcinfo/request records (metadata) are not content rows."""
    payload = write_warc(RECORDS[:1], gzip_members=False)
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:info>\r\n"
        b"Content-Length: 10\r\n\r\n"
        b"robots: ok\r\n\r\n"
    )
    got = list(parse_warc_bytes(info + payload))
    assert len(got) == 1
    assert got[0]["record_id"] == "<urn:uuid:1>"


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(write_warc(RECORDS))
    (d / "part-1.warc.gz").write_bytes(
        write_warc(
            [
                {
                    "record_id": f"<urn:uuid:{10 + i}>",
                    "target_uri": f"https://example.net/{i}",
                    "warc_date": "2021-05-02T00:00:00Z",
                    "content_type": "text/html; charset=utf-8",
                    "http_status": 200,
                    "text": f"<p>page {i}</p>",
                }
                for i in range(5)
            ]
        )
    )
    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 7
    uris = {r["target_uri"] for r in rows}
    assert "https://example.com/a" in uris
    assert "https://example.net/4" in uris
    assert {r["warc_file"].rsplit("/", 1)[-1] for r in rows} == {
        "part-0.warc.gz", "part-1.warc.gz",
    }


def test_warc_to_corpus_pipeline(spark, tmp_path):
    """The full ingestion story: WARC -> html_to_text -> quality gate."""
    from pyspark.sql import functions as F

    from feast_spark.functions.text import with_extracted_text

    d = tmp_path / "w"
    d.mkdir()
    (d / "crawl.warc.gz").write_bytes(write_warc(RECORDS))
    docs = read_warc(spark, str(d))
    extracted = with_extracted_text(
        docs.where(F.col("http_status") == 200), "text", out_col="text"
    )
    row = extracted.collect()[0]
    assert row["text"] == "Hello wörld"  # markup stripped, charset kept


def test_warc_parser_never_crashes_on_garbage():
    """Corpus ingestion sees malformed bytes constantly: the parser
    must yield fewer records, never raise."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(payload=st.binary(max_size=400))
    def run(payload):
        list(parse_warc_bytes(payload))

    run()


def test_warc_parser_survives_corrupted_valid_stream():
    """Flipping bytes inside a real WARC.gz degrades gracefully."""
    base = bytearray(write_warc(RECORDS))
    for pos in (0, 5, len(base) // 2, len(base) - 3):
        mutated = bytearray(base)
        mutated[pos] ^= 0xFF
        got = list(parse_warc_bytes(bytes(mutated)))  # must not raise
        assert len(got) <= 2
    # truncation at any prefix also parses cleanly
    for cut in (1, 10, len(base) // 2):
        assert len(list(parse_warc_bytes(bytes(base[:cut])))) <= 2
