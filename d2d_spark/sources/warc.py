"""WARC source — the on-disk format of web crawls (Common Crawl,
ISO 28500): the natural entry point of every HTML->text curation
pipeline this engine carries (functions/html.py, C4/Gopher rules,
dedup). Stdlib-only, like the other self-contained codecs
(xls_lite, rar_lite): a WARC record is a ``WARC/1.x`` status line,
CRLF-terminated named headers, a blank line, then exactly
``Content-Length`` payload bytes and a CRLF CRLF trailer.

Both packagings parse:

- plain ``.warc`` — records concatenated;
- ``.warc.gz`` — each record its OWN gzip member (the Common Crawl
  layout), decoded member-by-member so a corrupt tail loses only the
  tail; a whole-file single-member gzip also works (zlib just keeps
  yielding decompressed bytes).

Scale shape follows archive.py: ``binaryFiles`` ships one archive per
task (WARC members aren't block-splittable once gzipped per record —
parallelism comes from the many-files layout crawls already have),
records parse executor-side, and the result lands in a typed
DataFrame. ``response`` records carry an HTTP envelope inside the
payload; ``http_body`` strips it so the body column composes directly
with ``html_to_text``.

Malformed input degrades per record, never per job: a record whose
headers or length don't parse ends that FILE's scan (the stream
offset is untrustworthy past it) but everything already parsed is
kept.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: record fields surfaced as columns (headers keep original names in
#: the `headers` map; these get first-class typed columns)
WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate every gzip member (per-record members or one big
    one); trailing garbage/truncation keeps the bytes already
    decoded."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.write(d.decompress(data[pos:]))
            out.write(d.flush())
        except zlib.error:
            break
        if not d.unused_data:
            break
        pos = len(data) - len(d.unused_data)
    return out.getvalue()


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield dicts of (record headers + payload) from raw WARC bytes.
    Stops at the first structurally-broken record."""
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record CR/LF padding
        while i < n and data[i] in (0x0D, 0x0A):
            i += 1
        if i >= n:
            return
        if not data[i : i + 5] == b"WARC/":
            return
        # take the EARLIER of the two terminator styles: preferring
        # \r\n\r\n found anywhere later would let an LF-terminated
        # header block swallow payload bytes (a response payload's
        # HTTP envelope virtually always contains \r\n\r\n)
        crlf = data.find(b"\r\n\r\n", i)
        lf = data.find(b"\n\n", i)
        if crlf == -1 and lf == -1:
            return
        if lf == -1 or (crlf != -1 and crlf <= lf):
            head_end, sep = crlf, 4
        else:
            head_end, sep = lf, 2
        headers: dict[str, str] = {}
        head = data[i:head_end].decode("utf-8", errors="replace")
        lines = head.splitlines()
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would walk the cursor BACKWARDS and
            # can re-parse the same record forever — structurally
            # broken, end this file's scan
            return
        body_start = head_end + sep
        if body_start + length > n:
            return
        yield {
            "headers": headers,
            "payload": data[body_start : body_start + length],
        }
        i = body_start + length


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record's
    payload (status line + headers up to the blank line); payloads
    with no envelope pass through unchanged."""
    if not payload.startswith(b"HTTP/"):
        return payload
    # earlier-match rule, same as the record parser: an LF-only
    # envelope whose BODY contains \r\n\r\n must split at the \n\n
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf == -1 and lf == -1:
        return payload
    if lf == -1 or (crlf != -1 and crlf <= lf):
        return payload[crlf + 4:]
    return payload[lf + 2:]


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    strip_http: bool = True,
) -> DataFrame:
    """Every WARC record of the requested types under ``path`` (plain
    or .gz) as one typed DataFrame — see module docstring for the
    scale shape. ``strip_http=True`` (default) removes the HTTP
    envelope from response payloads so the body feeds `html_to_text`
    directly."""
    want = {t.lower() for t in record_types} if record_types else None

    def explode(kv):
        fname, content = kv
        if content[:2] == b"\x1f\x8b":
            content = _gunzip_members(content)
        for rec in parse_warc_records(content):
            h = rec["headers"]
            rtype = h.get("warc-type", "")
            if want is not None and rtype.lower() not in want:
                continue
            payload = rec["payload"]
            if strip_http and rtype.lower() == "response":
                payload = http_body(payload)
            yield (
                fname,
                h.get("warc-record-id"),
                rtype,
                h.get("warc-target-uri"),
                h.get("warc-date"),
                h.get("content-type"),
                payload,
            )

    rdd = spark.sparkContext.binaryFiles(path).flatMap(explode)
    return spark.createDataFrame(rdd, WARC_SCHEMA)


def read_wet(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """WET sidecar (``*.warc.wet.gz``) — the crawl's pre-extracted
    plain text: ``conversion`` records whose payload is already text,
    one per page. The cheap entry point when the pipeline doesn't need
    its own HTML extraction (a WET pass reads ~1/10 the bytes of the
    full WARC). Returns (target_uri, warc_date, text) — the same shape
    as ``warc_html_text``, so the two are drop-in interchangeable
    upstream of the curation stages."""
    docs = read_warc(spark, path, record_types=("conversion",), strip_http=False)
    return (
        docs.withColumn("text", F.decode(F.col("payload"), "UTF-8"))
        .filter(F.length("text") >= min_chars)
        .select("target_uri", "warc_date", "text")
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT sidecar (``*.warc.wat.gz``) — per-page crawl metadata as
    JSON in ``metadata`` records. Returns (target_uri, warc_date,
    meta_json); drill into the envelope with ``get_json_object`` /
    ``from_json``, or use ``wat_links`` for the common case."""
    recs = read_warc(spark, path, record_types=("metadata",), strip_http=False)
    return recs.select(
        "target_uri",
        "warc_date",
        F.decode(F.col("payload"), "UTF-8").alias("meta_json"),
    )


#: JSON path of the outbound-link array inside a WAT envelope
_WAT_LINKS_PATH = (
    "$['Envelope']['Payload-Metadata']['HTTP-Response-Metadata']"
    "['HTML-Metadata']['Links']"
)


def wat_links(wat: DataFrame, kinds: tuple[str, ...] | None = ("A",)) -> DataFrame:
    """The crawl link graph from a ``read_wat`` frame: one (src, url,
    kind) row per outbound link — JVM-side JSON traversal
    (get_json_object + from_json), no Python in the hot path.

    ``kinds`` filters by the link element tag encoded in the WAT
    ``path`` field (``A@/href`` → kind ``A``): the default keeps only
    anchor links — IMG/SCRIPT/LINK references are resource fetches,
    not endorsements, and would pollute a PageRank/HITS graph. Pass
    ``None`` for every link. Compose with
    ``functions.urls.normalize_url`` for a canonical edge list."""
    links = F.from_json(
        F.get_json_object(F.col("meta_json"), _WAT_LINKS_PATH),
        "array<struct<path string, url string>>",
    )
    out = (
        wat.select(F.col("target_uri").alias("src"), F.explode(links).alias("l"))
        .select(
            "src",
            F.col("l.url").alias("url"),
            # "A@/href" -> "A"; a path with no @ passes through whole
            F.split(F.coalesce(F.col("l.path"), F.lit("")), "@")[0].alias("kind"),
        )
        .filter(F.col("url").isNotNull())
    )
    if kinds is not None:
        if isinstance(kinds, str):
            # list("IMG") == ['I','M','G'] — a bare string would match
            # nothing and silently drop every link
            raise TypeError(
                f"kinds must be a tuple/list of tags, got the string {kinds!r} "
                f"— pass kinds=({kinds!r},)"
            )
        out = out.filter(F.col("kind").isin(list(kinds)))
    return out


def warc_html_text(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """The standard first pipeline stage in one call: read response
    records, decode the body as UTF-8 (replacement for broken bytes),
    extract visible text with `html_to_text`, keep non-trivial
    documents. Returns (target_uri, warc_date, text)."""
    from d2d_spark.functions.html import html_to_text

    docs = read_warc(spark, path, record_types=("response",))
    return (
        docs.withColumn("__html", F.decode(F.col("payload"), "UTF-8"))
        .withColumn("text", html_to_text(F.col("__html")))
        .filter(F.length("text") >= min_chars)
        .select("target_uri", "warc_date", "text")
    )
