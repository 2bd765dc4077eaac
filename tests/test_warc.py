"""WARC source (sources/warc.py): record parsing, gzip member
handling, HTTP envelope stripping, html pipeline composition."""

from __future__ import annotations

import gzip

from d2d_spark.sources.warc import (
    http_body,
    parse_warc_records,
    read_warc,
    warc_html_text,
)


def _record(rtype, uri, payload: bytes, rid="<urn:uuid:1>"):
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


def _http(html: str) -> bytes:
    body = html.encode()
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )


def _warc_bytes(n=3):
    out = b""
    out += _record("warcinfo", "", b"software: test\r\n", rid="<urn:uuid:0>")
    for i in range(n):
        out += _record(
            "response",
            f"http://example.com/page{i}",
            _http(f"<html><body><p>Hello page {i}.</p></body></html>"),
            rid=f"<urn:uuid:{i + 1}>",
        )
    return out


def test_parse_records_and_http_body():
    recs = list(parse_warc_records(_warc_bytes(2)))
    assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "response", "response"]
    body = http_body(recs[1]["payload"])
    assert body == b"<html><body><p>Hello page 0.</p></body></html>"
    assert http_body(b"no envelope") == b"no envelope"


def test_parse_stops_at_corrupt_record_keeps_prefix():
    data = _warc_bytes(2) + b"WARC/1.0\r\nContent-Length: nonsense\r\n\r\n"
    recs = list(parse_warc_records(data))
    assert len(recs) == 3  # everything before the broken tail
    truncated = _warc_bytes(1)[:-20]
    assert len(list(parse_warc_records(truncated))) == 1  # warcinfo only


def test_read_warc_plain_and_per_record_gzip(spark, tmp_path):
    raw = _warc_bytes(3)
    (tmp_path / "a.warc").write_bytes(raw)
    # Common Crawl layout: one gzip member per record
    members = b"".join(
        gzip.compress(_record("response", f"http://gz.example/{i}", _http(f"<p>gz {i}.</p>")))
        for i in range(2)
    )
    (tmp_path / "b.warc.gz").write_bytes(members)
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 5  # 3 plain responses + 2 gz (warcinfo filtered)
    assert all(r["warc_type"] == "response" for r in rows)
    by_uri = {r["target_uri"]: r for r in rows}
    assert bytes(by_uri["http://example.com/page1"]["payload"]) == (
        b"<html><body><p>Hello page 1.</p></body></html>"
    )
    assert bytes(by_uri["http://gz.example/0"]["payload"]) == b"<p>gz 0.</p>"


def test_warc_html_pipeline_composes(spark, tmp_path):
    (tmp_path / "c.warc").write_bytes(_warc_bytes(3))
    out = warc_html_text(spark, str(tmp_path / "c.warc")).collect()
    got = {r["target_uri"]: r["text"] for r in out}
    assert got["http://example.com/page2"] == "Hello page 2."
    assert len(got) == 3


def test_read_warc_keeps_all_types_when_asked(spark, tmp_path):
    (tmp_path / "d.warc").write_bytes(_warc_bytes(1))
    df = read_warc(spark, str(tmp_path / "d.warc"), record_types=(), strip_http=False)
    # empty tuple = no filter; warcinfo + response both surface, and
    # the response payload keeps its HTTP envelope
    rows = {r["warc_type"]: r for r in df.collect()}
    assert set(rows) == {"warcinfo", "response"}
    assert bytes(rows["response"]["payload"]).startswith(b"HTTP/1.1 200")


def _wet_bytes(n=3):
    out = b""
    out += _record("warcinfo", "", b"software: wet-test\r\n", rid="<urn:uuid:0>")
    for i in range(n):
        out += _record(
            "conversion",
            f"http://example.com/page{i}",
            f"Extracted text of page {i}.\nSecond line.".encode(),
            rid=f"<urn:uuid:{i + 1}>",
        )
    return out


def _wat_bytes():
    import json

    out = b""
    for i in range(2):
        env = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"path": "A@/href", "url": f"http://other.org/{i}/a"},
                                {"path": "IMG@/src", "url": f"http://cdn.org/{i}.png"},
                            ]
                        }
                    }
                }
            }
        }
        out += _record(
            "metadata",
            f"http://example.com/page{i}",
            json.dumps(env).encode(),
            rid=f"<urn:uuid:{i}>",
        )
    return out


def test_read_wet_plain_and_gzipped(spark, tmp_path):
    from d2d_spark.sources.warc import read_wet

    (tmp_path / "a.warc.wet").write_bytes(_wet_bytes(2))
    # per-record gzip members, the Common Crawl layout
    recs = list(parse_warc_records(_wet_bytes(2)))
    gz = b"".join(
        gzip.compress(_record("conversion", r["headers"]["warc-target-uri"], r["payload"]))
        for r in recs
        if r["headers"]["warc-type"] == "conversion"
    )
    (tmp_path / "b.warc.wet.gz").write_bytes(gz)
    got = read_wet(spark, str(tmp_path / "*")).collect()
    assert len(got) == 4  # warcinfo filtered, 2 conversions per file
    assert all(r.text.startswith("Extracted text of page") for r in got)
    assert {r.target_uri for r in got} == {
        "http://example.com/page0",
        "http://example.com/page1",
    }


def test_read_wat_and_link_graph(spark, tmp_path):
    from d2d_spark.sources.warc import read_wat, wat_links

    (tmp_path / "c.warc.wat").write_bytes(_wat_bytes())
    wat = read_wat(spark, str(tmp_path / "c.warc.wat"))
    assert wat.count() == 2
    # default keeps anchor links only — IMG resource fetches are not
    # endorsements and would pollute a rank graph
    edges = {(r.src, r.url) for r in wat_links(wat).collect()}
    assert edges == {
        ("http://example.com/page0", "http://other.org/0/a"),
        ("http://example.com/page1", "http://other.org/1/a"),
    }
    every = {(r.src, r.url, r.kind) for r in wat_links(wat, kinds=None).collect()}
    assert every == {
        ("http://example.com/page0", "http://other.org/0/a", "A"),
        ("http://example.com/page0", "http://cdn.org/0.png", "IMG"),
        ("http://example.com/page1", "http://other.org/1/a", "A"),
        ("http://example.com/page1", "http://cdn.org/1.png", "IMG"),
    }


def test_wat_links_tolerates_missing_metadata(spark, tmp_path):
    from d2d_spark.sources.warc import read_wat, wat_links

    (tmp_path / "d.warc.wat").write_bytes(
        _record("metadata", "http://example.com/x", b'{"Envelope": {}}')
    )
    wat = read_wat(spark, str(tmp_path / "d.warc.wat"))
    assert wat_links(wat).count() == 0


def test_negative_content_length_ends_scan_not_loops():
    """A corrupt negative Content-Length must end the file's scan, not
    walk the cursor backwards into an infinite re-parse."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -43\r\n\r\n"
    )
    recs = list(parse_warc_records(_warc_bytes(1) + bad))
    assert [r["headers"]["warc-type"] for r in recs] == ["warcinfo", "response"]


def test_lf_only_headers_with_crlf_in_payload():
    """LF-terminated WARC headers whose payload contains \\r\\n\\r\\n
    must split at the EARLIER \\n\\n, or framing drifts into the
    payload and every following record is lost."""
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>body</p>"
    head = (
        f"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://x/\n"
        f"Content-Length: {len(payload)}\n\n"
    ).encode()
    two = (head + payload + b"\r\n\r\n") * 2
    recs = list(parse_warc_records(two))
    assert len(recs) == 2
    assert all(r["payload"] == payload for r in recs)
    assert http_body(recs[0]["payload"]) == b"<p>body</p>"


def test_http_body_lf_envelope_with_crlf_in_body():
    lf_env = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nkeep\r\n\r\nall of this"
    assert http_body(lf_env) == b"keep\r\n\r\nall of this"


def test_wat_links_rejects_bare_string_kinds(spark, tmp_path):
    import pytest as pt

    from d2d_spark.sources.warc import read_wat, wat_links

    (tmp_path / "k.warc.wat").write_bytes(_wat_bytes())
    wat = read_wat(spark, str(tmp_path / "k.warc.wat"))
    with pt.raises(TypeError, match="tuple/list"):
        wat_links(wat, kinds="IMG")
