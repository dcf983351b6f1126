"""WARC (Web ARChive) ingestion — the container format web crawls ship
in (Common Crawl et al.), parsed into one row per response record.

Spark-first shape: ``binaryFile`` scans the WARC shards (one task per
file — WARC is a concatenation format, so a file is the natural split
unit; gzip members make finer splits impossible anyway), and an
Arrow-batched ``mapInPandas`` walks each file's records by
Content-Length — never by regex over the body, which can contain
anything including WARC headers. Headers are parsed strictly; records
that violate the framing are emitted with ``parse_error`` set instead
of killing the task (the PERMISSIVE-quarantine contract of
``text_formats.py``).

Per-record output: (warc_path, record_idx, warc_type, target_uri,
warc_date, content_type, content_length, http_status, body,
parse_error) — ``body`` is the HTTP payload for response records
(headers stripped), the raw block otherwise. Gzipped shards (.warc.gz
with per-record gzip members, the Common Crawl layout) are handled by
decompressing the member stream.

Reference analog: none (the reference polls JSON APIs); this is the
corpus-scale ingestion front-end the LLM-data extensions need —
compose with ``functions.text.strip_markup`` + ``normalize_url`` +
the dedup family downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_path", T.StringType()),
        T.StructField("record_idx", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body", T.StringType()),
        T.StructField("parse_error", T.StringType()),
    ]
)


def _iter_records(data: bytes):
    """Yield (headers: dict, block: bytes) per WARC record, framed by
    Content-Length exactly (bodies may contain anything)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"unterminated record header at byte {pos}")
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"expected WARC/x.y version line at byte {pos}, "
                f"got {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"missing/invalid Content-Length at byte {pos}"
            ) from None
        block_start = head_end + 4
        if block_start + clen > n:
            raise ValueError(
                f"Content-Length {clen} overruns file at byte {pos}"
            )
        yield headers, data[block_start : block_start + clen]
        pos = block_start + clen


def _split_http(block: bytes) -> tuple[int | None, bytes]:
    """Split an HTTP response block into (status, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, block
    head = block[:sep].decode("utf-8", "replace")
    status = None
    first = head.split("\r\n", 1)[0]
    parts = first.split(" ")
    if first.startswith("HTTP/") and len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    return status, block[sep + 4 :]


def _parse_file(path: str, data: bytes) -> list[tuple]:
    import gzip

    if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
        # member-per-record gzip (Common Crawl) or whole-file gzip:
        # gzip.decompress handles concatenated members natively
        data = gzip.decompress(data)
    rows: list[tuple] = []
    idx = 0
    try:
        for headers, block in _iter_records(data):
            wtype = headers.get("warc-type")
            status, body = (None, block)
            ctype = headers.get("content-type", "")
            if wtype == "response" and ctype.startswith("application/http"):
                status, body = _split_http(block)
            rows.append(
                (
                    path,
                    idx,
                    wtype,
                    headers.get("warc-target-uri"),
                    headers.get("warc-date"),
                    ctype,
                    len(block),
                    status,
                    body.decode("utf-8", "replace"),
                    None,
                )
            )
            idx += 1
    except ValueError as e:
        rows.append(
            (path, idx, None, None, None, None, None, None, None, str(e))
        )
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC shard(s) under ``path`` into one row per record.

    One task per shard (``binaryFile``); records stream out of an
    Arrow-batched ``mapInPandas``. Malformed framing quarantines the
    remainder of THAT shard as a ``parse_error`` row — other shards
    are unaffected. For 100 TB crawls: shards are the parallelism
    unit, so keep them ~1 GB (the Common Crawl convention) and let the
    scheduler spread them; no shuffle happens until a downstream op
    asks for one."""

    def run(batches):
        import pandas as pd

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                out.extend(_parse_file(p, bytes(content)))
            yield pd.DataFrame(out, columns=cols)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(run, WARC_SCHEMA)


def responses_as_documents(records: DataFrame) -> DataFrame:
    """Project successful HTTP response records into the documents
    shape (doc_id, url, text, n_chars) — the handoff to the curation /
    dedup family. doc_id is a rerun-stable hash of (shard, idx)."""
    from pyspark.sql import functions as F

    ok = records.where(
        (F.col("warc_type") == "response")
        & (F.col("parse_error").isNull())
        & (F.col("http_status") == 200)
    )
    return ok.select(
        F.xxhash64("warc_path", "record_idx").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("body").alias("text"),
        F.length("body").alias("n_chars"),
    )
