"""Geo kernels: deterministic synthetic coordinates, web-mercator
geotile ids, haversine distance.

The corpus has no geo columns, so geo entries derive a deterministic
(lat, lon) per document from ``doc_id`` with EXACT integer arithmetic
(affine map mod a pinned modulus) that DuckDB reproduces verbatim —
no md5-per-row Python loop, fully vectorizable.  Micro-degree integers
are the source of truth; floats appear only at the last step, written
with the IDENTICAL operation order on both engines so IEEE doubles
match bit-for-bit wherever no libm call intervenes (tile-x is pure
integer division; mercator tile-y and haversine use libm and rely on
the round(,6) cross-engine float policy).

Latitudes are capped to ±85° (inside the web-mercator singularity at
±85.05112878°) so geotile y never needs clamping.
"""

from __future__ import annotations

import numpy as np

# affine-mod coordinate synthesis (pinned; mirrored in SQL oracles)
LAT_MULT = 2654435761  # Knuth multiplicative constants
LAT_ADD = 1013904223
LAT_MOD = 170_000_000  # -> lat_e6 in [-85e6, 85e6)
LON_MULT = 2246822519
LON_ADD = 3266489917
LON_MOD = 360_000_000  # -> lon_e6 in [-180e6, 180e6)

EARTH_R_KM = 6371.0


def synth_coords_e6(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Micro-degree (lat_e6, lon_e6) int64 arrays for a doc_id array.

    Products are kept under 2**63 by reducing both operands mod the
    modulus first ((3.6e8)**2 ~ 1.3e17 < 9.2e18).
    """
    d = np.asarray(doc_id, dtype=np.int64)
    lat = ((d % LAT_MOD) * (LAT_MULT % LAT_MOD) + LAT_ADD) % LAT_MOD - LAT_MOD // 2
    lon = ((d % LON_MOD) * (LON_MULT % LON_MOD) + LON_ADD) % LON_MOD - LON_MOD // 2
    return lat, lon


# SQL fragments computing the identical integer coordinates (DuckDB
# BIGINT arithmetic; same reductions so intermediates match exactly).
SQL_LAT_E6 = (
    f"(((doc_id % {LAT_MOD}) * ({LAT_MULT} % {LAT_MOD}) + {LAT_ADD})"
    f" % {LAT_MOD} - {LAT_MOD // 2})"
)
SQL_LON_E6 = (
    f"(((doc_id % {LON_MOD}) * ({LON_MULT} % {LON_MOD}) + {LON_ADD})"
    f" % {LON_MOD} - {LON_MOD // 2})"
)


def geotile_xy(lat_e6: np.ndarray, lon_e6: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """ES geotile_grid cell (x, y) at ``zoom``.

    x is EXACT integer division: (lon_e6 + 180e6) * 2^z // 360e6.
    y is the web-mercator row, computed in doubles with the operation
    order mirrored verbatim in the SQL oracle.
    """
    n = np.int64(1) << zoom
    x = (lon_e6 + 180_000_000) * n // 360_000_000
    lat = lat_e6 / 1e6
    rad = np.radians(lat)
    merc = np.log(np.tan(rad) + 1.0 / np.cos(rad))
    y = np.floor((1.0 - merc / np.pi) / 2.0 * n).astype(np.int64)
    return x.astype(np.int64), y


def sql_geotile_xy(zoom: int) -> tuple[str, str]:
    """SQL expressions for (x, y) over columns lat_e6 / lon_e6 — the
    same arithmetic as :func:`geotile_xy`, operation for operation."""
    n = 1 << zoom
    x = f"((lon_e6 + 180000000) * {n} // 360000000)"
    y = (
        f"CAST(floor((1.0 - ln(tan(radians(lat_e6 / 1e6)) + "
        f"1.0 / cos(radians(lat_e6 / 1e6))) / pi()) / 2.0 * {n}) AS BIGINT)"
    )
    return x, y


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 4  # chars -> 20 bits (10 lon + 10 lat)


def geohash_bits(lat_e6: np.ndarray, lon_e6: np.ndarray) -> np.ndarray:
    """Standard geohash cell id at :data:`GEOHASH_PRECISION` as one
    int64 (the 20-bit interleaved stream, lon bit first — the classic
    Niemeyer layout).  Pure integer arithmetic: bin indexes are exact
    floor divisions of the micro-degree coordinates, the interleave is
    shifts and masks — bit-identical in any engine, mirrored verbatim
    by :func:`sql_geohash_bits`."""
    nbits = 5 * GEOHASH_PRECISION // 2  # 10 bits per axis
    n = np.int64(1) << nbits
    lonb = (lon_e6 + 180_000_000) * n // 360_000_000
    latb = (lat_e6 + 90_000_000) * n // 180_000_000
    g = np.zeros(len(lonb), dtype=np.int64)
    for j in range(nbits):
        g |= ((lonb >> np.int64(nbits - 1 - j)) & 1) << np.int64(
            2 * nbits - 1 - 2 * j
        )
        g |= ((latb >> np.int64(nbits - 1 - j)) & 1) << np.int64(
            2 * nbits - 2 - 2 * j
        )
    return g


def geohash_str(g: np.ndarray) -> np.ndarray:
    """Base32 geohash strings from the packed 20-bit cell ids."""
    chars = np.frombuffer(GEOHASH_BASE32.encode(), dtype=np.uint8)
    nch = GEOHASH_PRECISION
    out = np.empty((len(g), nch), dtype=np.uint8)
    for c in range(nch):
        out[:, c] = chars[(g >> (5 * (nch - 1 - c))) & 31]
    return out.view(f"S{nch}").ravel().astype(str)


def sql_geohash_bits() -> str:
    """DuckDB BIGINT expression over columns lat_e6 / lon_e6 computing
    the identical packed cell id as :func:`geohash_bits`."""
    nbits = 5 * GEOHASH_PRECISION // 2
    n = 1 << nbits
    lonb = f"((lon_e6 + 180000000) * {n} // 360000000)"
    latb = f"((lat_e6 + 90000000) * {n} // 180000000)"
    terms = []
    for j in range(nbits):
        terms.append(
            f"(({lonb} // {1 << (nbits - 1 - j)}) % 2) * "
            f"{1 << (2 * nbits - 1 - 2 * j)}"
        )
        terms.append(
            f"(({latb} // {1 << (nbits - 1 - j)}) % 2) * "
            f"{1 << (2 * nbits - 2 - 2 * j)}"
        )
    return "(" + " + ".join(terms) + ")"


def sql_geohash_str(g_col: str = "g") -> str:
    """DuckDB expression turning the packed cell id column into the
    base32 geohash string (same alphabet / bit groups)."""
    parts = [
        f"substr('{GEOHASH_BASE32}', "
        f"CAST(({g_col} // {1 << (5 * (GEOHASH_PRECISION - 1 - c))}) "
        f"% 32 AS INTEGER) + 1, 1)"
        for c in range(GEOHASH_PRECISION)
    ]
    return " || ".join(parts)


def haversine_km(
    lat1_e6: np.ndarray, lon1_e6: np.ndarray, lat2_deg: float, lon2_deg: float
) -> np.ndarray:
    """Great-circle km from micro-degree points to a fixed origin, the
    formula written in the same order as :func:`sql_haversine_km`."""
    p1 = np.radians(lat1_e6 / 1e6)
    l1 = np.radians(lon1_e6 / 1e6)
    p2 = np.radians(lat2_deg)
    l2 = np.radians(lon2_deg)
    a = (
        np.sin((p2 - p1) / 2.0) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin((l2 - l1) / 2.0) ** 2
    )
    return 2.0 * EARTH_R_KM * np.arcsin(np.sqrt(a))


def sql_haversine_km(lat2_deg: float, lon2_deg: float) -> str:
    """DuckDB expression over columns lat_e6 / lon_e6."""
    return (
        f"(2.0 * {EARTH_R_KM} * asin(sqrt("
        f"pow(sin((radians({lat2_deg}) - radians(lat_e6 / 1e6)) / 2.0), 2) + "
        f"cos(radians(lat_e6 / 1e6)) * cos(radians({lat2_deg})) * "
        f"pow(sin((radians({lon2_deg}) - radians(lon_e6 / 1e6)) / 2.0), 2))))"
    )
