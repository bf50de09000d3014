"""Hashes and fingerprints used across dedup/fingerprint ops.

All pure, seeded, vectorized where hot.  md5 is used for the exact-dedup
content key (D1) and document fingerprint because the DuckDB oracle has the
identical ``md5()``; the 64-bit mix hash is a splitmix64-style avalanche
used for minhash permutations and simhash features (public-domain
constructions).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def str_buffer_view(strs) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets int64, flat uint8 data) view of a string
    column.  Accepts list[str] / numpy object array / pyarrow (Chunked)
    Array; handles sliced arrays (``arr.offset``) and the large_string
    offset width.  THE shared helper for every byte-position-vectorized
    kernel over strings (FNV hashing, rolling fingerprints, the fuzzy
    Levenshtein matcher)."""
    import pyarrow as pa

    if isinstance(strs, pa.ChunkedArray):
        arr = strs.combine_chunks()
    elif isinstance(strs, pa.Array):
        arr = strs
    else:
        arr = pa.array(list(strs), pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.uint8)
    off_dtype = np.int64 if arr.type == pa.large_string() else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return offsets, data


def hash_str_array(strs) -> np.ndarray:
    """Stable uint64 hash per string (FNV-1a over utf-8, then splitmix64),
    VECTORIZED: the byte chain is sequential per string, so the loop runs
    over byte POSITIONS (max string length, ~tens for shingles/terms)
    with one numpy step across every still-active string — not over
    strings × chars in Python.  Accepts list[str] / numpy object array /
    pyarrow string array; bit-identical to the scalar FNV-1a definition
    (property-tested)."""
    offsets, data = str_buffer_view(strs)
    n = offsets.size - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.diff(offsets)
    starts = offsets[:-1]
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    max_len = int(lens.max()) if n else 0
    active_idx = np.arange(n, dtype=np.int64)
    for i in range(max_len):
        keep = lens[active_idx] > i
        active_idx = active_idx[keep]
        b = data[starts[active_idx] + i].astype(np.uint64)
        h[active_idx] = (h[active_idx] ^ b) * prime  # uint64 wraps mod 2^64
    return splitmix64(h)


def rolling_fingerprint_column(
    texts, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1
) -> np.ndarray:
    """Vectorized :func:`rolling_fingerprint` over a string column ->
    int64[n] (0 for rows shorter than ``window`` bytes).

    The window hash is the polynomial Σ b[i+j]·base^(w-1-j) mod p; each
    term comes from a precomputed (window x 256) ``(value·power) mod p``
    table, so the whole column reduces to ``window`` gathers + adds over
    the flat utf-8 buffer (terms < 2^61, eight of them < 2^64: exact in
    uint64) — bit-identical to the scalar rolling form (property-tested).
    """
    offsets, data = str_buffer_view(texts)
    n = offsets.size - 1
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    lens = np.diff(offsets)
    ok = lens >= window
    if not ok.any():
        return out
    # contrib[j][v] = (v * base^(window-1-j)) mod p  — each < 2^61
    powers = [pow(base, window - 1 - j, mod) for j in range(window)]
    contrib = np.array(
        [[(v * p) % mod for v in range(256)] for p in powers], dtype=np.uint64
    )
    total = int(data.size)
    h = np.zeros(max(total - window + 1, 0), dtype=np.uint64)
    for j in range(window):
        h += contrib[j][data[j : total - window + 1 + j]]
        if j % 7 == 6:
            h %= np.uint64(mod)  # keep ≤7 pending 2^61 terms: exact in uint64
    h %= np.uint64(mod)
    # per-row min over window starts fully inside the row (cross-row
    # windows in h are simply never gathered)
    starts = offsets[:-1][ok]
    ends = offsets[1:][ok] - window + 1
    gi = _flat_ranges(starts, ends)
    bounds = np.zeros(starts.size, dtype=np.int64)
    np.cumsum((ends - starts)[:-1], out=bounds[1:])
    row_mins = np.minimum.reduceat(h[gi], bounds)
    out[ok] = row_mins.astype(np.int64)
    return out


def window_hashes_column(
    texts, window: int = 32, base: int = 257, mod: int = (1 << 61) - 1
) -> tuple[np.ndarray, np.ndarray]:
    """ALL ``window``-byte rolling hashes of every row, stride 1.

    Returns ``(h, bounds)``: ``h`` is the concatenation of each row's
    window hashes (uint64, values < 2^61), ``bounds`` is ``int64[n+1]``
    offsets so row ``i``'s hashes are ``h[bounds[i]:bounds[i+1]]`` (an
    empty slice for rows shorter than ``window`` bytes).  Same polynomial
    as :func:`rolling_fingerprint_column` (which is the per-row MIN of
    this array): one (window × 256) table, ``window`` gathers + adds over
    the flat utf-8 buffer — no per-row Python.
    """
    offsets, data = str_buffer_view(texts)
    n = offsets.size - 1
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    lens = np.diff(offsets)
    n_win = np.maximum(lens - window + 1, 0)
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_win, out=bounds[1:])
    if bounds[-1] == 0:
        return np.empty(0, dtype=np.uint64), bounds
    powers = [pow(base, window - 1 - j, mod) for j in range(window)]
    contrib = np.array(
        [[(v * p) % mod for v in range(256)] for p in powers], dtype=np.uint64
    )
    total = int(data.size)
    h = np.zeros(max(total - window + 1, 0), dtype=np.uint64)
    for j in range(window):
        h += contrib[j][data[j : total - window + 1 + j]]
        if j % 7 == 6:
            # each term < 2^61 and h < 2^61 post-reduction, so at most
            # 7 pending adds keep the sum < 8·2^61 = 2^64: reduce before
            # the eighth add would wrap (window=8 never needed this)
            h %= np.uint64(mod)
    h %= np.uint64(mod)
    ok = n_win > 0
    starts = offsets[:-1][ok]
    ends = offsets[1:][ok] - window + 1
    return h[_flat_ranges(starts, ends)], bounds


def _flat_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """arange(s, e) for each range, concatenated (all ranges non-empty)."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    idx[0] = starts[0]
    if lens.size > 1:
        cum = np.cumsum(lens[:-1])
        idx[cum] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(idx)


def rolling_fingerprint(text: str, window: int = 8, base: int = 257,
                        mod: int = (1 << 61) - 1) -> int:
    """Rabin-Karp rolling-hash document fingerprint: min of all
    ``window``-byte rolling hashes (a deterministic content sketch that
    survives small shifts).  Returns 0 for texts shorter than ``window``."""
    data = text.encode("utf-8")
    n = len(data)
    if n < window:
        return 0
    h = 0
    power = pow(base, window - 1, mod)
    best = None
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window:
            h = (h - data[i - window] * power * base) % mod
        if i >= window - 1:
            best = h if best is None else min(best, h)
    return best


def winnow_column(
    texts, k: int = 8, w: int = 4, base: int = 257, mod: int = (1 << 61) - 1
) -> tuple[np.ndarray, np.ndarray]:
    """Robust winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS document fingerprinting scheme) over
    the stride-1 ``k``-byte rolling hashes: in every window of ``w``
    consecutive k-gram hashes select the RIGHTMOST minimum; consecutive
    windows reselecting the same position emit one fingerprint.  Rows
    shorter than the guarantee threshold ``k + w - 1`` bytes (fewer
    than ``w`` k-grams) emit none.

    Returns ``(n_fp, fp_xor)`` int64 arrays per row: the fingerprint
    count and the XOR of the selected hashes (a compact set signature;
    hash values < 2^61 so the XOR fits int64).  Fully vectorized: ``w``
    columnwise min/tie passes over the flat hash buffer (O(W) extra
    memory — never a W x w window matrix), bincount /
    bitwise_xor.reduceat per-row reductions — no per-row Python.
    """
    h, bounds = window_hashes_column(texts, window=k, base=base, mod=mod)
    n = bounds.size - 1
    n_fp = np.zeros(n, dtype=np.int64)
    fp_xor = np.zeros(n, dtype=np.int64)
    nh = np.diff(bounds)
    n_win = np.maximum(nh - w + 1, 0)
    if h.size == 0 or int(n_win.sum()) == 0:
        return n_fp, fp_xor
    ok = n_win > 0
    starts = bounds[:-1][ok]
    ends = (bounds[1:] - w + 1)[ok]
    gi = _flat_ranges(starts, ends)  # flat start index of every window
    # rightmost minimum in w columnwise passes (<= on later columns so
    # the later index wins ties) — O(W) extra memory, never the O(W*w)
    # fancy-indexed window matrix
    best = h[gi]
    pos = gi.copy()
    for j in range(1, w):
        v = h[gi + j]
        take = v <= best
        best = np.where(take, v, best)
        pos = np.where(take, gi + j, pos)
    per_row = ends - starts
    row_off = np.zeros(per_row.size, dtype=np.int64)
    np.cumsum(per_row[:-1], out=row_off[1:])
    emit = np.ones(pos.size, dtype=bool)
    emit[1:] = pos[1:] != pos[:-1]
    emit[row_off] = True  # a row's first window always emits
    sel_rows = np.repeat(np.arange(per_row.size), per_row)[emit]
    sel_h = h[pos[emit]]
    cnt = np.bincount(sel_rows, minlength=per_row.size)
    off = np.zeros(per_row.size, dtype=np.int64)
    np.cumsum(cnt[:-1], out=off[1:])
    rows_ok = np.flatnonzero(ok)
    n_fp[rows_ok] = cnt
    # every surviving row emits >= 1 fingerprint, so reduceat segments
    # are all non-empty
    fp_xor[rows_ok] = np.bitwise_xor.reduceat(sel_h, off).astype(np.int64)
    return n_fp, fp_xor
