"""WARC (Web ARChive) ingestion — the CommonCrawl container format.

A 100 TB text corpus usually STARTS as WARC: gzipped HTTP captures,
one gzip member per record (ISO 28500; CommonCrawl's layout).  Spark
has no native WARC reader; this one is built from two public layers:

- ``spark.read.format("binaryFile")`` distributes whole WARC files —
  one file per task, which matches how CommonCrawl shards its crawl
  (~1 GB per .warc.gz, thousands of files per segment).  Parallelism
  = number of files, the same unit every public WARC pipeline uses.
- a pure-Python record parser (stdlib ``zlib``) runs inside
  ``mapInPandas``: per-member gzip decompression for .warc.gz, plain
  scanning for uncompressed .warc, WARC header parse, and HTTP
  response-body extraction with basic charset decoding.

Output: one row per ``response`` record —
(warc_file, record_id, target_uri, warc_date, content_type, http_status,
 text) — ready to feed ``html_to_text`` -> the corpus pipeline.

Memory: one full WARC file is held per task (binaryFile semantics).
That is the standard trade for this format — records inside a member
are not independently seekable without an index; CC-sized files
(~1 GB) fit comfortably in executor memory at the default 4-8 GB per
core.  If your WARCs are larger, split them upstream.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _gzip_members(payload: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    WARC.gz layout: one record per member)."""
    pos = 0
    n = len(payload)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(payload[pos:])
        except zlib.error:
            return  # trailing garbage: stop cleanly
        yield out + d.flush()
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _split_records(data: bytes) -> Iterator[bytes]:
    """Split a raw (decompressed) WARC stream on record boundaries.
    Records start with 'WARC/' and declare their own Content-Length."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = data[start:head_end]
        length = 0
        for line in headers.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                try:
                    length = int(line.split(b":", 1)[1].strip())
                except ValueError:
                    length = 0
        body_start = head_end + 4
        yield data[start : body_start + length]
        pos = body_start + length


def _parse_record(raw: bytes):
    """One WARC record -> header dict + body bytes."""
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None, b""
    headers: dict[str, str] = {}
    for line in raw[:head_end].split(b"\r\n")[1:]:  # skip 'WARC/1.0'
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers, raw[head_end + 4 :]


def _http_body(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    head_end = body.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, b""
    lines = body[:head_end].split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("latin-1")
    return status, ctype, body[head_end + 4 :]


def _decode_text(payload: bytes, content_type: str | None) -> str:
    charset = "utf-8"
    if content_type and "charset=" in content_type:
        charset = content_type.split("charset=", 1)[1].split(";")[0].strip()
    try:
        return payload.decode(charset, errors="replace")
    except LookupError:
        return payload.decode("utf-8", errors="replace")


def parse_warc_bytes(payload: bytes, path: str = "") -> Iterator[dict]:
    """WARC or WARC.gz bytes -> dicts matching WARC_SCHEMA, one per
    ``response`` record (the record type carrying page content)."""
    if payload[:2] == b"\x1f\x8b":
        stream: Iterator[bytes] = _gzip_members(bytes(payload))
        records: Iterator[bytes] = (
            rec for member in stream for rec in _split_records(member)
        )
    else:
        records = _split_records(bytes(payload))
    for raw in records:
        headers, body = _parse_record(raw)
        if not headers or headers.get("warc-type") != "response":
            continue
        status, ctype, http_payload = _http_body(body)
        yield {
            "warc_file": path,
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": ctype,
            "http_status": status,
            "text": _decode_text(http_payload, ctype),
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: path/glob of .warc / .warc.gz files ->
    one row per response record (WARC_SCHEMA).

    One task per file via binaryFile; the parser is a pure generator
    inside mapInPandas, so records stream into Arrow batches without
    materializing the whole record list."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), str(fpath)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


def write_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Records -> WARC(.gz) bytes (tests / stream simulation; one gzip
    member per record, the CommonCrawl layout)."""
    out = bytearray()
    for r in records:
        payload = r["text"].encode("utf-8")
        http = (
            f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
            f"Content-Type: {r.get('content_type', 'text/html; charset=utf-8')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1") + payload
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            f"WARC-Target-URI: {r.get('target_uri', '')}\r\n"
            f"WARC-Date: {r.get('warc_date', '2021-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        rec = head + http + b"\r\n\r\n"
        if gzip_members:
            gz = zlib.compressobj(wbits=zlib.MAX_WBITS | 16)
            out += gz.compress(rec) + gz.flush()
        else:
            out += rec
    return bytes(out)
