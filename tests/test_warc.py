"""WARC source (sources/warc.py): writer/parser round trip."""

from __future__ import annotations

import gzip
import os

import pytest

from defactonlp_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

ROWS = [
    ("doc://0", b"<html><body><p>hello world</p></body></html>"),
    # body containing record-separator-looking bytes: length framing
    # must not split on them
    ("doc://1", b"<html>\r\n\r\nWARC/1.0\r\n\r\n</html>"),
    ("doc://2", "<html><p>ümläut</p></html>".encode("utf-8")),
]


@pytest.mark.parametrize("ext", ["warc", "warc.gz"])
def test_round_trip(tmp_path, ext):
    p = str(tmp_path / f"t.{ext}")
    write_warc(ROWS, p)
    got = parse_warc_bytes(open(p, "rb").read())
    assert got == ROWS


def test_writer_is_byte_stable(tmp_path):
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(ROWS, a)
    write_warc(ROWS, b)
    assert open(a, "rb").read() == open(b, "rb").read()


def test_non_response_and_non_200_filtered(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(ROWS[:1], p)
    data = open(p, "rb").read()
    # append a hand-built 404 response record
    payload = b"HTTP/1.1 404 Not Found\r\n\r\ngone"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: doc://404\r\n"
        + f"Content-Length: {len(payload)}".encode()
        + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )
    rows = parse_warc_bytes(data + rec)
    assert rows == ROWS[:1]  # warcinfo + 404 both filtered


def test_truncated_tail_is_tolerated(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(ROWS, p)
    data = open(p, "rb").read()
    assert parse_warc_bytes(data + b"WARC/1.0\r\nbroken") == ROWS


def test_ray_reader_parallel_files(tmp_path):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"s{s}.warc.gz")
        write_warc([(f"doc://{s * 10 + i}", h) for i, (_u, h) in
                    enumerate(ROWS)], p)
        paths.append(p)
    got = read_warc(paths).to_pandas()
    assert len(got) == 3 * len(ROWS)
    assert sorted(set(os.path.basename(x) for x in got["path"])) == [
        "s0.warc.gz", "s1.warc.gz", "s2.warc.gz"
    ]
