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


AUDIO_MAGIC = b"FAKEAUD1"  # magic | u32 sample_rate | u32 n_samples


def make_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.default_rng([43, seed])
    body = rng.integers(-(2**15), 2**15, size=min(n_samples, 2048),
                        dtype=np.int16).tobytes()
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + body


def add_fake_audio(ds: "ray.data.Dataset", id_col: str = "doc_id") -> "ray.data.Dataset":
    """Attach an audio binary column + typed metadata (sample rate,
    duration) — the audio flavor of the opaque-binary contract."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        blobs, rates, secs = [], [], []
        for i in ids:
            sr = 16000 if i % 2 == 0 else 44100
            n = 1000 + (i % 10) * 500
            blobs.append(make_fake_audio(sr, n, int(i)))
            rates.append(sr)
            secs.append(n / sr)
        return (
            batch.append_column("audio", pa.array(blobs, pa.binary()))
            .append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("duration_s", pa.array(secs, pa.float64()))
        )

    return ds.map_batches(attach, batch_format="pyarrow")


class DecodeAudioStage:
    """Audio feature-extract stage: stubbed like DecodeImageStage
    (real codecs absent); strict=False parses the fixture header and
    emits rms/sample stats so the plumbing is exercised end-to-end."""

    def __init__(self, strict: bool = False, audio_col: str = "audio"):
        self.strict = strict
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires soundfile/ffmpeg — not available; "
                "run with strict=False for the deterministic stub"
            )
        rates, counts, rms = [], [], []
        for blob in batch[self.audio_col].to_pylist():
            if blob[:8] != AUDIO_MAGIC:
                raise ValueError("unknown audio format (stub decoder)")
            sr, n = struct.unpack("<II", blob[8:16])
            body = np.frombuffer(blob[16:], dtype=np.int16).astype(np.float64)
            rates.append(sr)
            counts.append(n)
            rms.append(float(np.sqrt(np.mean(body**2))) if body.size else 0.0)
        return (
            batch.drop_columns([self.audio_col])
            .append_column("dec_sample_rate", pa.array(rates, pa.int32()))
            .append_column("dec_n_samples", pa.array(counts, pa.int64()))
            .append_column("rms", pa.array(rms, pa.float64()))
        )


def frame_sample(
    ds: "ray.data.Dataset", *, every_n: int = 10, id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Video-shaped frame sampling over a 'frames' list column: keep every
    n-th element — the vectorized explode/downsample pattern a real video
    pipeline uses between decode and per-frame inference."""

    import numpy as np
    import pyarrow.compute as pc

    def sample(batch: pa.Table) -> pa.Table:
        frames = batch["frames"]
        if isinstance(frames, pa.ChunkedArray):
            frames = frames.combine_chunks()
        n = len(frames)
        lens = pc.list_value_length(frames).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        flat = frames.flatten()
        n_keep = (lens + every_n - 1) // every_n
        total = int(n_keep.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "frame_idx": pa.array([], pa.int32()),
                    "frame": pa.array([], flat.type),
                }
            )
        # within-row sampled offsets 0, n, 2n, ... (vectorized ranges)
        step = np.ones(total, dtype=np.int64)
        step[0] = 0
        keep = n_keep > 0
        if n_keep[keep].size > 1:
            step[np.cumsum(n_keep[keep][:-1])] = 1 - n_keep[keep][:-1]
        fi = np.cumsum(step) * every_n
        flat_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=flat_starts[1:])
        gather = np.repeat(flat_starts, n_keep) + fi
        rows = np.repeat(np.arange(n, dtype=np.int64), n_keep)
        ids_col = batch[id_col]
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        return pa.table(
            {
                id_col: ids_col.take(pa.array(rows)),
                "frame_idx": pa.array(fi.astype(np.int32), pa.int32()),
                "frame": flat.take(pa.array(gather)),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow")
