"""Multimodal column plumbing (task brief first-class op).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata.  The decode/resize/frame-sample kernels need codec libraries
that are NOT in this container, so the decode step is STUBBED two ways:

* ``DecodeImageStage(strict=True)`` raises ``NotImplementedError`` — the
  honest production placeholder,
* ``strict=False`` runs a deterministic fake decode (parses the tiny
  self-describing header our fixture generator writes) so the Ray-side
  plumbing — schema, batch size, actor-pool signature, output layout —
  is real and tested end-to-end.

The stage shape is the real design: an actor pool over small batches
(large binary payloads -> small ``batch_size``, ray_guide.md:232-235),
binary columns kept in pyarrow batches only.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

from .util import pool_size

MAGIC = b"FAKEIMG1"  # 8-byte header: magic | u16 width | u16 height | u8 ch


def make_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic fake image payload (header + seeded bytes)."""
    rng = np.random.default_rng([42, seed])
    body = rng.integers(0, 256, size=min(width * height * channels, 4096),
                        dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", width, height, channels) + body


def add_fake_images(ds: "ray.data.Dataset", id_col: str = "doc_id") -> "ray.data.Dataset":
    """Attach a deterministic image binary column + typed metadata."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        blobs, widths, heights = [], [], []
        for i in ids:
            w = 64 + (i % 8) * 32
            h = 64 + (i % 5) * 32
            blobs.append(make_fake_image(w, h, 3, int(i)))
            widths.append(w)
            heights.append(h)
        return (
            batch.append_column("image", pa.array(blobs, pa.binary()))
            .append_column("img_width", pa.array(widths, pa.int32()))
            .append_column("img_height", pa.array(heights, pa.int32()))
        )

    return ds.map_batches(attach, batch_format="pyarrow")


class DecodeImageStage:
    """Actor-pool decode/feature-extract stage.

    Real libs absent -> ``strict=True`` raises NotImplementedError (marked
    stub); ``strict=False`` parses the fixture header and emits real
    feature columns so downstream layout is exercised.
    """

    def __init__(self, strict: bool = False, image_col: str = "image"):
        self.strict = strict
        self.image_col = image_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image decode requires PIL/opencv — not available in this "
                "container; run with strict=False for the deterministic stub"
            )
        widths, heights, chans, means = [], [], [], []
        for blob in batch[self.image_col].to_pylist():
            if blob[:8] != MAGIC:
                raise ValueError("unknown image format (stub decoder)")
            w, h, c = struct.unpack("<HHB", blob[8:13])
            body = np.frombuffer(blob[13:], dtype=np.uint8)
            widths.append(w)
            heights.append(h)
            chans.append(c)
            means.append(float(body.mean()) if body.size else 0.0)
        return (
            batch.drop_columns([self.image_col])
            .append_column("dec_width", pa.array(widths, pa.int32()))
            .append_column("dec_height", pa.array(heights, pa.int32()))
            .append_column("dec_channels", pa.array(chans, pa.int8()))
            .append_column("pixel_mean", pa.array(means, pa.float64()))
        )


def decode_images(
    ds: "ray.data.Dataset", *, strict: bool = False, concurrency: int = 2,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Decode pipeline: small batches (binary payloads), actor pool,
    pyarrow-only batches."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
