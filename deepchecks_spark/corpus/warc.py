"""WARC (ISO 28500) container ingestion for Common-Crawl-style crawls.

The engine's corpus schema (``url, warc_ts, html, text, lang`` —
BASELINE.json ``input_hint``) assumes the crawl already landed in an
Iceberg/parquet table; this module is the onboarding step that gets it
there from raw ``.warc`` / ``.warc.gz`` / WET files, plus the inverse
(re-export) for round-trip verification and archival sinks.

Scale design (a full crawl is ~64k files x ~1 GB gzip):

* **Per-file parallelism.** ``read_warc`` uses Spark's ``binaryFile``
  source — one task per file. Common Crawl gzips each record as its own
  gzip *member*, so files are only splittable with a member-boundary
  index; the standard public processing pattern (and ours) is file-level
  parallelism, which already yields ~64k tasks per crawl — far more than
  any cluster's executor count, so there is no lost parallelism.
* **One executor-side pass, zero shuffle.** Parsing is an Arrow-batched
  ``mapInPandas`` over the raw bytes: headers are scanned once,
  ``Content-Length`` bounds each payload slice, and only the parsed
  ``(url, warc_ts, record_type, payload)`` rows leave the stage. The
  plan is scan → project → ``mapInPandas`` with no Exchange (pinned in
  tests/test_plans.py).
* **Encoding stays JVM-side.** ``warc_record_expr`` builds a record as
  pure ``concat``/``encode``/``date_format`` column arithmetic, so
  re-export sinks and round-trip tests run inside WholeStageCodegen.

Reference parity: the reference ingests pandas frames and never reads
crawl containers (deepchecks/tabular/dataset.py builds Datasets from
in-memory frames); WARC ingestion is part of this engine's web-corpus
surface, with record semantics from the public ISO 28500 / WARC 1.1
spec (warc-specifications.iipc.org). No code derived from the reference.
"""

from __future__ import annotations

import zlib
from datetime import datetime

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WARC_OUT_DDL = "url string, warc_ts timestamp, record_type string, payload binary"

_CRLF = "\r\n"


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def warc_record_expr(url_col, ts_col, payload_col,
                     record_type: str = "resource",
                     content_type: str = "text/html") -> Column:
    """A single WARC/1.0 record as a binary Column — pure JVM expression
    (concat / encode / date_format), no Python.

    ``Content-Length`` is the payload's BYTE length (``F.length`` on a
    binary column counts bytes), per the spec; the record is terminated
    by the mandatory two CRLFs. ``record_type`` is typically
    ``resource`` (raw html payloads), ``conversion`` (WET-style
    extracted text) or ``metadata``.
    """
    url, ts, payload = _col(url_col), _col(ts_col), _col(payload_col)
    header = F.concat_ws(
        "",
        F.lit(f"WARC/1.0{_CRLF}"),
        F.lit(f"WARC-Type: {record_type}{_CRLF}"),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"), F.lit(_CRLF),
        F.lit(f"Content-Type: {content_type}{_CRLF}"),
        F.lit("Content-Length: "), F.length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(F.encode(header, "UTF-8"), payload,
                    F.encode(F.lit(_CRLF + _CRLF), "UTF-8"))


def to_warc(df: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
            payload_col: str = "html", record_type: str = "resource",
            content_type: str = "text/html", out_col: str = "warc") -> DataFrame:
    """Re-export: append a ``warc`` binary column holding each row's
    serialized record. Write with any binary-capable sink (parquet,
    or a per-partition file writer) to archive a cleaned corpus."""
    return df.withColumn(out_col, warc_record_expr(
        url_col, ts_col, payload_col, record_type, content_type))


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the Common Crawl layout:
    one member per record) into one plain-bytes stream."""
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        data = d.unused_data
        if not d.eof:  # truncated trailing member
            break
    return b"".join(out)


def _parse_warc_date(raw: bytes):
    s = raw.decode("ascii", "replace").strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def parse_warc_bytes(data: bytes, strict: bool = False):
    """Parse one WARC stream (optionally gzip-member-compressed) into
    ``(headers: dict[bytes, bytes], payload: bytes)`` tuples.

    Single forward pass: read the version line, the header block up to
    the blank line, then slice exactly ``Content-Length`` payload bytes.
    Malformed leading bytes are skipped by scanning to the next
    ``WARC/`` magic unless ``strict``.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    out = []
    i, n = 0, len(data)
    while i < n:
        while i < n and data[i] in (0x0D, 0x0A):  # inter-record CRLFs
            i += 1
        if i >= n:
            break
        if data[i:i + 5] != b"WARC/":
            if strict:
                raise ValueError(f"expected WARC/ magic at offset {i}")
            nxt = data.find(b"WARC/", i)
            if nxt < 0:
                break
            i = nxt
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            if strict:
                raise ValueError("unterminated WARC header block")
            break
        headers: dict[bytes, bytes] = {}
        lines = data[i:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version line
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b"0"))
        except ValueError:
            if strict:
                raise
            clen = 0
        body_start = hdr_end + 4
        payload = data[body_start:body_start + clen]
        if strict and len(payload) < clen:
            raise ValueError("truncated WARC payload")
        i = body_start + clen
        out.append((headers, payload))
    return out


def parse_warc(df: DataFrame, data_col: str = "content",
               record_types=None, strict: bool = False) -> DataFrame:
    """Parse a binary column of WARC stream(s) into one row per record:
    ``(url, warc_ts, record_type, payload)``.

    Arrow-batched ``mapInPandas``; selects only ``data_col`` first so the
    scan is pruned to the bytes. ``record_types`` filters record types
    executor-side (e.g. ``('response', 'resource')``) before anything is
    materialized. WARC-Date is UTC by spec; the returned timestamps are
    naive UTC (the engine's sessions pin ``spark.sql.session.timeZone``
    to UTC).
    """
    types = set(record_types) if record_types is not None else None

    def _parse(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                if blob is None:
                    continue
                for headers, payload in parse_warc_bytes(bytes(blob), strict=strict):
                    rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
                    if types is not None and rtype not in types:
                        continue
                    url = headers.get(b"warc-target-uri")
                    date = headers.get(b"warc-date")
                    rows.append((
                        url.decode("utf-8", "replace") if url is not None else None,
                        _parse_warc_date(date) if date is not None else None,
                        rtype,
                        payload,
                    ))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "record_type", "payload"])

    return df.select(data_col).mapInPandas(_parse, schema=WARC_OUT_DDL)


def read_warc(spark, path: str, record_types=("response", "resource"),
              strict: bool = False, path_glob: str | None = None) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` files into parsed records.

    ``binaryFile`` gives one task per file — the right granularity for
    crawl archives (see module docstring). ``path_glob`` narrows the
    listing (e.g. ``*.warc.gz``) without a second pass.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return parse_warc(reader.load(path), data_col="content",
                      record_types=record_types, strict=strict)
