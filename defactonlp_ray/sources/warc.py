"""Minimal WARC/1.0 source (the Common Crawl container format).

Web-scale text pipelines start from WARC, not parquet: a crawl dump is a
directory of ~1 GB ``.warc`` / ``.warc.gz`` files, each a sequence of
length-framed records (``Content-Length`` header + payload), where
``WARC-Type: response`` records carry an HTTP response whose body is the
page HTML.  This module gives the engine that front door:

* :func:`write_warc` — a deterministic writer (fixtures/tests; also the
  documented export shape) emitting a leading ``warcinfo`` record plus
  one ``response`` record per (url, html) with a full HTTP header block.
* :func:`read_warc` — a Ray Data reader: ``read_binary_files`` over the
  file list (one task per file — the standard CC parallel unit; a WARC
  file cannot be split mid-stream because records are length-framed) ->
  a flat_map-style batch parser producing ``(path, url, html)`` rows.
  Whole-file gzip is detected by magic bytes (per-member gzip, the CC
  on-disk variant, concatenates transparently under ``gzip.decompress``).

Parsing is LENGTH-DRIVEN (never ``split`` on separators — HTML bodies
may contain anything): read the header block up to CRLFCRLF, take
exactly ``Content-Length`` payload bytes, skip the record trailer.
Non-response records (warcinfo, metadata, request) are filtered, as is
any response whose HTTP status line is not 200.
"""

from __future__ import annotations

import gzip
import hashlib
import os

import pyarrow as pa

import ray
import ray.data

__all__ = ["write_warc", "parse_warc_bytes", "read_warc"]

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
WARC_DATE = "2026-01-01T00:00:00Z"  # pinned (writer is deterministic)


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode("utf-8") + _CRLF
    head += f"Content-Length: {len(payload)}".encode() + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def write_warc(
    rows: list[tuple[str, bytes]], path: str, *, compress: bool | None = None
) -> str:
    """Write ``(url, html_bytes)`` rows as a WARC/1.0 file (gzip when
    ``path`` ends with .gz or ``compress=True``).  Record ids are
    content-addressed (md5 of the url) so re-exports are byte-stable."""
    out = bytearray()
    info = b"software: defactonlp_ray\r\n"
    out += _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Date", WARC_DATE),
            ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
            ("Content-Type", "application/warc-fields"),
        ],
        info,
    )
    for url, html in rows:
        rid = hashlib.md5(url.encode("utf-8")).hexdigest()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}".encode()
            + _HDR_END
            + html
        )
        out += _record(
            [
                ("WARC-Type", "response"),
                ("WARC-Date", WARC_DATE),
                ("WARC-Record-ID", f"<urn:md5:{rid}>"),
                ("WARC-Target-URI", url),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            bytes(http),
        )
    data = bytes(out)
    if compress or (compress is None and path.endswith(".gz")):
        data = gzip.compress(data, mtime=0)  # mtime pinned: byte-stable
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def parse_warc_bytes(data: bytes) -> list[tuple[str, bytes]]:
    """(url, html_bytes) for every 200-response record; length-framed
    scan, no separator splitting."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows: list[tuple[str, bytes]] = []
    i = 0
    n = len(data)
    while i < n:
        if data[i:i + 5] != b"WARC/":
            break
        hdr_end = data.find(_HDR_END, i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length + 4  # skip the CRLFCRLF record trailer
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(_HDR_END)
        if http_end < 0:
            continue
        status = payload[:http_end].split(_CRLF, 1)[0]
        if b" 200 " not in status + b" ":
            continue
        rows.append(
            (headers.get("warc-target-uri", ""), payload[http_end + 4 :])
        )
    return rows


def read_warc(paths: list[str] | str) -> "ray.data.Dataset":
    """WARC file(s) -> Dataset rows ``(path, url, html)``; one read task
    per file (records are length-framed — a file is the split unit)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out_p, out_u, out_h = [], [], []
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            for url, html in parse_warc_bytes(data):
                out_p.append(path)
                out_u.append(url)
                out_h.append(html)
        return pa.table(
            {
                "path": pa.array(out_p, pa.string()),
                "url": pa.array(out_u, pa.string()),
                "html": pa.array(out_h, pa.binary()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
