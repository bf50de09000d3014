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


def hash_str_array(strs: np.ndarray | list[str]) -> np.ndarray:
    """Stable uint64 hash per string (FNV-1a over utf-8, then splitmix64).

    Python-loop FNV is fine: callers hash *shingles/terms*, already the
    reduced representation, not raw documents.
    """
    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return splitmix64(out)


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
