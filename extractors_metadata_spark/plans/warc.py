"""WARC record parsing — the Common-Crawl container format.

The entry point of every web-corpus pipeline: a WARC response record is
a CRLF-delimited header block (``WARC/1.0`` + ``Name: value`` lines)
separated from the payload by a blank line. This operator parses the
header fields out of a raw record column and audits the one integrity
invariant the format carries (Content-Length == actual payload bytes —
truncated fetches are the dominant real-world corruption).

Parsing is pure codegen: one ``instr`` split at the first CRLFCRLF, one
frozen Java==RE2 regex per header field (negated-class captures, no
backrefs — the pii_counts playbook), exact integer length arithmetic.
No UDFs, no shuffle; at 100 TB this rides the ingest scan.

Reference analog: the reference parses one embedded JSON block per page
(`/root/reference/terra_common.py` metadata load); WARC headers are the
same extract-structured-fields-from-one-blob stage at the container
level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def _hdr(header, name: str):
    return F.regexp_extract(header, f"{name}: ([^\r\n]+)", 1)


def parse_warc(
    records: DataFrame, rec_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Parse WARC response records -> (id, target_uri, host, warc_type,
    content_type, content_length, payload_bytes, length_ok,
    n_header_lines).

    ``rec_col`` is the raw record as binary (decoded as UTF-8) or
    string. ``length_ok`` is the Content-Length integrity audit;
    ``n_header_lines`` counts header lines (malformed-record triage).
    ASCII payload assumption for the byte==char equality is documented:
    production would compare octet lengths on the undecoded binary.
    """
    is_bin = records.schema[rec_col].dataType.typeName() == "binary"
    raw = F.decode(F.col(rec_col), "UTF-8") if is_bin else F.col(rec_col)
    sep = F.instr(raw, CRLF + CRLF)
    base = records.select(
        F.col(id_col),
        F.substring(raw, F.lit(1), sep - 1).alias("h"),
        F.substring(raw, sep + 4, F.length(raw)).alias("p"),
    )
    content_length = _hdr(F.col("h"), "Content-Length").cast("long")
    return base.select(
        id_col,
        _hdr(F.col("h"), "WARC-Target-URI").alias("target_uri"),
        F.regexp_extract(
            _hdr(F.col("h"), "WARC-Target-URI"), r"^https?://([^/]+)/", 1
        ).alias("host"),
        _hdr(F.col("h"), "WARC-Type").alias("warc_type"),
        _hdr(F.col("h"), "Content-Type").alias("content_type"),
        content_length.alias("content_length"),
        F.length("p").cast("long").alias("payload_bytes"),
        (content_length == F.length("p")).alias("length_ok"),
        F.size(F.split(F.col("h"), CRLF, -1)).cast("long").alias(
            "n_header_lines"
        ),
    )
