"""Posting-list compression codecs (SURVEY.md §2.6 C1-C3).

The reference "index" is an uncompressed scipy CSR matrix in one ``.npz``
(fever-baselines ``drqa/retriever/utils.py save_sparse_csr``, unverified —
SURVEY.md §0).  Per the north_rule this engine stores postings delta-gap +
varint/PForDelta compressed with block-max skip metadata:

* C1 delta-gap: docid-ascending posting lists -> first id + gaps (np.diff).
* C2 varint (LEB128-style) — vectorized numpy encode AND decode; and a
  PForDelta-style codec (Zukowski et al., ICDE 2006): fixed-width bit-packed
  128-int blocks with patched exceptions, varint-encoded exception tail.
* C3 block metadata per ``BLOCK`` postings: last docid (skip pointer),
  max tf and min doc-length — enough to compute an exact BM25 upper bound
  at query time (block-max WAND, Ding & Suel SIGIR 2011) without a second
  pass over the corpus at build time.

All functions are pure numpy (no Ray); property-tested for roundtrip
identity in tests/test_codec.py.
"""

from __future__ import annotations

import numpy as np

CODEC_VERSION = "varint+pfor-v1"
BLOCK = 128  # postings per skip/bit-packing block


# ---------------------------------------------------------------- varint (C2)

def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 encode + per-value byte counts (enables slicing the stream
    into per-term blobs after ONE vectorized encode of a whole segment)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxb = int(nbytes.max())
    rem = v.copy()
    for p in range(maxb):
        mask = nbytes > p
        pos = starts[mask] + p
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > p + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
        rem[mask] >>= np.uint64(7)
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 encode a uint64 array, vectorized.

    Layout: little-endian base-128, high bit = continuation.
    """
    return varint_encode_with_sizes(values)[0]


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a varint byte string back to uint64, vectorized.

    ``count`` (when known) is a consistency check only.  Fast path: a
    stream with no continuation bytes is just the byte array (common for
    tf/dl and dense-posting gap streams).  General path assembles values
    per byte-position with plain fancy indexing — each value has at most
    one byte per position, so no scatter-add (np.add.at is ~100x slower).
    """
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = arr < 128
    n = int(is_last.sum())
    if count is not None and n != count:
        raise ValueError(f"varint stream has {n} values, expected {count}")
    if n == arr.size:  # no continuation bytes at all
        return arr.astype(np.uint64)
    # group id of each byte = index of the value it belongs to
    group = np.empty(arr.size, dtype=np.int64)
    group[0] = 0
    np.cumsum(is_last[:-1], out=group[1:])
    # position of each byte within its group
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    pos = (np.arange(arr.size, dtype=np.int64) - starts[group]).astype(np.uint64)
    payload = (arr & 0x7F).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    maxpos = int(pos.max())
    for p in range(maxpos + 1):
        sel = pos == p
        vals[group[sel]] |= payload[sel] << np.uint64(7 * p)
    return vals


# ------------------------------------------------------------- delta-gap (C1)

def delta_encode(docids: np.ndarray) -> np.ndarray:
    """Strictly-ascending int64 docids -> uint64 gaps (first kept absolute)."""
    d = np.ascontiguousarray(docids, dtype=np.int64)
    if d.size == 0:
        return np.empty(0, dtype=np.uint64)
    gaps = np.empty(d.size, dtype=np.int64)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    if d.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("docids must be strictly ascending")
    return gaps.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64), dtype=np.int64)


def delta_decode_segmented(gaps: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Per-segment :func:`delta_decode` of a CONCATENATED gap stream in
    one vectorized pass: ``bounds`` are the per-list offsets
    (``gaps[bounds[j]:bounds[j+1]]`` is list ``j``).  A global cumsum is
    corrected by each list's starting prefix, so ``out[lo:hi] ==
    delta_decode(gaps[lo:hi])`` for every list — this replaces one numpy
    round-trip per term with one per segment (the whole-segment decode's
    remaining per-term Python loop)."""
    c = np.cumsum(gaps.astype(np.int64), dtype=np.int64)
    if c.size == 0:
        return c
    starts = np.asarray(bounds[:-1], dtype=np.int64)
    counts = np.diff(np.asarray(bounds, dtype=np.int64))
    prefix = np.zeros(starts.size, dtype=np.int64)
    nz = starts > 0
    prefix[nz] = c[starts[nz] - 1]
    return c - np.repeat(prefix, counts)


# ------------------------------------------------- PForDelta-style codec (C2)

def _bit_width(values: np.ndarray) -> int:
    m = int(values.max()) if values.size else 0
    return max(int(m).bit_length(), 1)


def pfor_encode(values: np.ndarray) -> bytes:
    """PForDelta-style encode of a uint64 array.

    Per 128-value block: choose bit width ``b`` covering >=90% of values;
    bit-pack ``value & ((1<<b)-1)``; values whose high bits overflow become
    exceptions stored as varint ``(position, value >> b)`` pairs.

    Header (little-endian): u32 n_values, then per block
    u8 b | u16 n_exceptions | packed bits | varint exception tail.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = bytearray()
    out += np.uint32(v.size).tobytes()
    for s in range(0, v.size, BLOCK):
        blk = v[s : s + BLOCK]
        widths = np.zeros(blk.shape, dtype=np.int64)
        tmp = blk.copy()
        while (tmp > 0).any():
            widths[tmp > 0] += 1
            tmp >>= np.uint64(1)
        widths = np.maximum(widths, 1)
        b = int(np.percentile(widths, 90))
        b = max(min(b, 64), 1)
        exc_mask = widths > b
        # if exceptions would exceed 1/8 of the block, fall back to max width
        if int(exc_mask.sum()) > max(1, blk.size // 8):
            b = int(widths.max())
            exc_mask = widths > b
        exc_pos = np.flatnonzero(exc_mask).astype(np.uint64)
        exc_high = blk[exc_mask] >> np.uint64(b)
        low = blk & ((np.uint64(1) << np.uint64(b)) - np.uint64(1)) if b < 64 else blk
        packed = _pack_bits(low, b)
        tail = varint_encode(np.concatenate([exc_pos, exc_high]))
        out += np.uint8(b).tobytes()
        out += np.uint16(exc_pos.size).tobytes()
        out += np.uint16(len(packed)).tobytes()
        out += packed
        out += np.uint32(len(tail)).tobytes()
        out += tail
    return bytes(out)


def pfor_decode(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    n = int(np.frombuffer(mv[:4], dtype=np.uint32)[0])
    off = 4
    out = np.empty(n, dtype=np.uint64)
    done = 0
    while done < n:
        blk_n = min(BLOCK, n - done)
        b = int(np.frombuffer(mv[off : off + 1], dtype=np.uint8)[0]); off += 1
        n_exc = int(np.frombuffer(mv[off : off + 2], dtype=np.uint16)[0]); off += 2
        plen = int(np.frombuffer(mv[off : off + 2], dtype=np.uint16)[0]); off += 2
        low = _unpack_bits(bytes(mv[off : off + plen]), b, blk_n); off += plen
        tlen = int(np.frombuffer(mv[off : off + 4], dtype=np.uint32)[0]); off += 4
        if tlen:
            tail = varint_decode(bytes(mv[off : off + tlen]), 2 * n_exc); off += tlen
            pos = tail[:n_exc].astype(np.int64)
            high = tail[n_exc:]
            low[pos] |= high << np.uint64(b)
        out[done : done + blk_n] = low
        done += blk_n
    return out


def _pack_bits(values: np.ndarray, b: int) -> bytes:
    """Pack uint64 values (< 2**b) into b-bit little-endian fields."""
    n = values.size
    total_bits = n * b
    nbytes = (total_bits + 7) // 8
    # expand to a bit matrix then packbits (fine for 128-value blocks)
    bitpos = np.arange(b, dtype=np.uint64)
    bits = ((values[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)  # little-endian within field
    packed = np.packbits(flat, bitorder="little")
    return packed[:nbytes].tobytes()


def _unpack_bits(buf: bytes, b: int, n: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(arr, bitorder="little")[: n * b]
    bits = bits.reshape(n, b).astype(np.uint64)
    bitpos = np.arange(b, dtype=np.uint64)
    return (bits << bitpos[None, :]).sum(axis=1, dtype=np.uint64)


def pfor_decode_many(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Bulk-decode MANY pfor blobs in one pass -> (concatenated values,
    per-blob counts).

    The per-blob/per-block Python walk only parses headers; the bit
    unpacking — the actual work — is batched by (bit width, block length):
    all same-shaped packed blocks across every blob unpack in ONE
    ``np.unpackbits`` + reshape + dot, instead of one numpy round-trip per
    128-value block.  This is what makes a pfor segment's bulk decode
    competitive with the varint fast path (measured in BENCH_NOTES.md).
    """
    counts = np.empty(len(bufs), dtype=np.int64)
    descs = []  # (group_key, packed_bytes, out_off, blk_n)
    excs = []   # (out_off, b, n_exc, tail_bytes)
    out_total = 0
    for bi, buf in enumerate(bufs):
        mv = memoryview(buf)
        n = int(np.frombuffer(mv[:4], dtype=np.uint32)[0])
        counts[bi] = n
        off = 4
        done = 0
        while done < n:
            blk_n = min(BLOCK, n - done)
            b = mv[off]; off += 1
            n_exc = int(np.frombuffer(mv[off : off + 2], dtype=np.uint16)[0]); off += 2
            plen = int(np.frombuffer(mv[off : off + 2], dtype=np.uint16)[0]); off += 2
            packed = mv[off : off + plen]; off += plen
            tlen = int(np.frombuffer(mv[off : off + 4], dtype=np.uint32)[0]); off += 4
            if tlen:
                excs.append((out_total + done, b, n_exc, bytes(mv[off : off + tlen])))
                off += tlen
            descs.append(((int(b), blk_n), packed, out_total + done, blk_n))
            done += blk_n
        out_total += n
    out = np.empty(out_total, dtype=np.uint64)
    # group same-shaped blocks -> one vectorized unpack per group
    by_group: dict[tuple[int, int], list[int]] = {}
    for i, (key, _p, _o, _n) in enumerate(descs):
        by_group.setdefault(key, []).append(i)
    for (b, blk_n), idxs in by_group.items():
        nbytes = (blk_n * b + 7) // 8
        stack = np.empty((len(idxs), nbytes), dtype=np.uint8)
        for row, i in enumerate(idxs):
            stack[row] = np.frombuffer(descs[i][1], dtype=np.uint8, count=nbytes)
        bits = np.unpackbits(stack, axis=1, bitorder="little")[:, : blk_n * b]
        # b vectorized or-shift passes over the flat value stream (a 3D
        # shift+sum allocates len*blk_n*b uint64 — orders of magnitude
        # more memory traffic for the same result)
        flat = bits.reshape(-1, b)
        vals_flat = np.zeros(flat.shape[0], dtype=np.uint64)
        for p in range(b):
            col = flat[:, p]
            if col.any():
                vals_flat |= col.astype(np.uint64) << np.uint64(p)
        vals = vals_flat.reshape(len(idxs), blk_n)
        for row, i in enumerate(idxs):
            off0 = descs[i][2]
            out[off0 : off0 + blk_n] = vals[row]
    for off0, b, n_exc, tail in excs:
        t = varint_decode(tail, 2 * n_exc)
        pos = t[:n_exc].astype(np.int64)
        out[off0 + pos] |= t[n_exc:] << np.uint64(b)
    return out, counts


# ------------------------------------------------------- posting blobs + C3

def encode_postings_batch(
    post_doc: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    bounds: np.ndarray,
    codec: str = "varint",
):
    """Encode EVERY term's posting list of a segment in vectorized batch
    form; ``bounds[i]:bounds[i+1]`` delimits term i's postings in the
    (term, doc_id)-sorted arrays.

    Replaces the per-term ``encode_postings`` loop that dominated segment
    build CPU (one Python/numpy round-trip per term, ~10^3 per segment):
    gaps and varint streams are computed in ONE pass with per-value byte
    sizes, per-term blobs are byte-slices, and the C3 block metadata comes
    from ``np.maximum/minimum.reduceat`` over the global block-start index
    (term boundaries are block starts, so reduceat segments never cross
    terms).  Returns a dict of per-term python lists/arrays ready to
    become postings-table columns; output is byte-identical to the
    per-term path (tested).
    """
    post_doc = np.ascontiguousarray(post_doc, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    n_terms = bounds.size - 1
    n = post_doc.size
    starts = bounds[:-1]
    counts = np.diff(bounds)
    # empty terms (bounds[i] == bounds[i+1]) would silently corrupt the
    # reduceat block stats (a repeated index returns the element, not an
    # empty-segment identity) and double-write gaps[starts]; index_build
    # never produces them, but this is public API — fail loudly instead
    if n_terms and counts.size and counts.min() <= 0:
        raise ValueError(
            "bounds must be strictly increasing (empty terms unsupported)"
        )
    if n == 0 or n_terms == 0:
        return {
            "n": [], "doc_blob": [], "tf_blob": [], "dl_blob": [],
            "blk_last_doc": [], "blk_max_tf": [], "blk_min_dl": [], "cf": [],
        }
    # per-term delta-gap in one pass: first posting absolute, rest diffs
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = post_doc[1:] - post_doc[:-1]
    gaps[starts] = post_doc[starts]
    interior = np.ones(n, dtype=bool)
    interior[starts] = False
    if n > n_terms and gaps[interior].min() <= 0:
        raise ValueError("docids must be strictly ascending within a term")

    def blobs_of(vals: np.ndarray) -> list[bytes]:
        if codec == "varint":
            stream, sizes = varint_encode_with_sizes(vals.astype(np.uint64))
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(sizes, out=offs[1:])
            return [
                stream[offs[bounds[i]] : offs[bounds[i + 1]]]
                for i in range(n_terms)
            ]
        return [
            pfor_encode(vals[bounds[i] : bounds[i + 1]].astype(np.uint64))
            for i in range(n_terms)
        ]

    doc_blobs = blobs_of(gaps)
    tf_blobs = blobs_of(tfs)
    dl_blobs = blobs_of(dls)

    nblocks = (counts + BLOCK - 1) // BLOCK
    blk_starts = np.concatenate(
        [np.arange(bounds[i], bounds[i + 1], BLOCK) for i in range(n_terms)]
    )
    blk_ends = np.minimum(blk_starts + BLOCK, np.repeat(bounds[1:], nblocks))
    blk_last = post_doc[blk_ends - 1]
    blk_max_tf = np.maximum.reduceat(tfs, blk_starts)
    blk_min_dl = np.minimum.reduceat(dls, blk_starts)
    blk_offs = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(nblocks, out=blk_offs[1:])
    cf = np.add.reduceat(tfs, starts)
    return {
        "n": counts,
        "doc_blob": doc_blobs,
        "tf_blob": tf_blobs,
        "dl_blob": dl_blobs,
        "blk_last_doc": blk_last,
        "blk_max_tf": blk_max_tf,
        "blk_min_dl": blk_min_dl,
        "blk_offsets": blk_offs,
        "cf": cf,
    }


def encode_positions_batch(
    positions: np.ndarray,
    posting_starts: np.ndarray,
    term_occ_bounds: np.ndarray,
) -> list[bytes]:
    """Encode every term's position stream of a segment in ONE vectorized
    varint pass (positional-index build kernel, SURVEY.md §2.6 C1/C2
    applied to within-doc token positions).

    Inputs are OCCURRENCE-level arrays over the (term, doc_id, pos)-sorted
    occurrence table: ``positions[i]`` is the token position of occurrence
    ``i`` in its doc, ``posting_starts`` marks the first occurrence of each
    (term, doc) posting, and ``term_occ_bounds[t]:term_occ_bounds[t+1]``
    delimits term ``t``'s occurrences.  Per posting the stream is
    first-absolute + deltas (positions are strictly ascending within a
    posting), varint-coded; per-term blobs are byte-slices of the single
    encoded stream.  Posting boundaries are NOT stored — tf (the posting's
    occurrence count) recovers them at decode (:func:`decode_positions`).

    Position streams reset per POSTING, so per-term blobs concatenate
    byte-identically across doc-disjoint segments — segment merge/compact
    joins raw bytes without re-encoding (unlike doc blobs, whose first gap
    is absolute per segment).
    """
    positions = np.ascontiguousarray(positions, dtype=np.int64)
    n = positions.size
    n_terms = term_occ_bounds.size - 1
    if n == 0 or n_terms == 0:
        return [b""] * max(n_terms, 0)
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = positions[1:] - positions[:-1]
    gaps[posting_starts] = positions[posting_starts]
    interior = np.ones(n, dtype=bool)
    interior[posting_starts] = False
    if n > posting_starts.size and gaps[interior].min() <= 0:
        raise ValueError("positions must be strictly ascending within a posting")
    stream, sizes = varint_encode_with_sizes(gaps.astype(np.uint64))
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    return [
        stream[offs[term_occ_bounds[i]] : offs[term_occ_bounds[i + 1]]]
        for i in range(n_terms)
    ]


def decode_positions(blob: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_positions_batch` for ONE term.

    ``tfs`` are the term's per-posting occurrence counts (the tf array
    decoded from ``tf_blob``), which delimit the per-posting delta streams.
    Returns ``(positions, occ_bounds)``: flat int64 positions and the
    occurrence-level posting boundaries (``occ_bounds[j]:occ_bounds[j+1]``
    is posting ``j``'s sorted position list).  Vectorized segmented cumsum —
    no per-posting Python loop.
    """
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    occ_bounds = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=occ_bounds[1:])
    if total == 0:
        return np.empty(0, dtype=np.int64), occ_bounds
    gaps = varint_decode(blob, total).astype(np.int64)
    c = np.cumsum(gaps)
    starts = occ_bounds[:-1]
    # pos[j] = c[j] - c[posting_start - 1]  (c[-1] := 0): subtracting the
    # running total before each posting turns the global cumsum into
    # per-posting cumsums in one vectorized pass
    base = np.where(starts > 0, c[starts - 1], 0)
    return c - np.repeat(base, tfs), occ_bounds


def encode_postings(
    docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, codec: str = "varint"
) -> dict:
    """Encode one term's posting list (docid-ascending) into blobs + C3 block
    metadata.  Returns a dict of plain-Python/bytes values ready to become
    one Arrow row.

    Block metadata per BLOCK postings: ``blk_last_doc`` (skip pointer),
    ``blk_max_tf`` and ``blk_min_dl`` (exact BM25 upper-bound inputs: the
    Okapi term score is increasing in tf and decreasing in dl, so
    score(max_tf, min_dl) bounds every posting in the block).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    gaps = delta_encode(docids)
    enc = varint_encode if codec == "varint" else pfor_encode
    n = docids.size
    nblocks = (n + BLOCK - 1) // BLOCK
    blk_last = [int(docids[min((i + 1) * BLOCK, n) - 1]) for i in range(nblocks)]
    blk_max_tf = [int(tfs[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(nblocks)]
    blk_min_dl = [int(dls[i * BLOCK : (i + 1) * BLOCK].min()) for i in range(nblocks)]
    return {
        "n": n,
        "codec": codec,
        "doc_blob": enc(gaps),
        "tf_blob": enc(tfs.astype(np.uint64)),
        "dl_blob": enc(dls.astype(np.uint64)),
        "blk_last_doc": blk_last,
        "blk_max_tf": blk_max_tf,
        "blk_min_dl": blk_min_dl,
    }


def decode_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` -> (docids, tfs, dls)."""
    codec = row.get("codec", "varint")
    dec = (lambda b: varint_decode(b, row["n"])) if codec == "varint" else pfor_decode
    gaps = dec(row["doc_blob"])
    docids = delta_decode(gaps)
    tfs = dec(row["tf_blob"]).astype(np.int64)
    dls = dec(row["dl_blob"]).astype(np.int64)
    return docids, tfs, dls
