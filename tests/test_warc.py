"""WARC parsing pins: field extraction, the Content-Length integrity
audit on a truncated record, and CRLF-in-payload safety (only the FIRST
blank line splits header from payload)."""

from __future__ import annotations


def _rec(uri, body, clen=None, wtype="response"):
    clen = len(body) if clen is None else clen
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Type: text/html\r\nContent-Length: {clen}\r\n\r\n{body}"
    )


def test_warc_fields_and_integrity(spark):
    from extractors_metadata_spark.plans.warc import parse_warc

    rows = [
        (1, _rec("https://a.example/x", "<html>ok</html>").encode()),
        # truncated fetch: header claims 50 bytes, payload has 15
        (2, _rec("https://b.example/y", "<html>cut</html>", clen=50).encode()),
        # payload CONTAINING a blank CRLF line must not re-split
        (3, _rec("https://c.example/z", "part1\r\n\r\npart2").encode()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, warc binary")
    out = {r["doc_id"]: r.asDict() for r in parse_warc(df).collect()}
    r1 = out[1]
    assert (r1["target_uri"], r1["host"], r1["warc_type"]) == (
        "https://a.example/x", "a.example", "response",
    )
    assert r1["length_ok"] and r1["n_header_lines"] == 5
    assert not out[2]["length_ok"]
    assert out[2]["content_length"] == 50 and out[2]["payload_bytes"] == 16
    r3 = out[3]
    assert r3["payload_bytes"] == len("part1\r\n\r\npart2")
    assert r3["length_ok"]
