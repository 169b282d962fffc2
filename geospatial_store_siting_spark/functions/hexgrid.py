"""Vectorized numpy hex-tile codec — mirror of functions/hex_sql.py.

Used inside Arrow pandas UDFs (kernels batched per partition, never
per-row Python — the constraint the reference states at
``/root/reference/notebooks/10_feature_engineering.py:77-81``) and as the
independent oracle for codec tests.  Must stay bit-identical with the SQL
formulation: same constants, same floor(x+0.5) rounding, same packing.
"""

from __future__ import annotations

import numpy as np

from ..config import AXIS_OFFSET, AXIS_SHIFT, HEX_SIZE_DEG, RES_CODE_SHIFT

SQRT3 = 1.7320508075688772
SQRT3_OVER_3 = 0.5773502691896258


def latlng_to_qr(lat: np.ndarray, lon: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point → axial hex coords (cube rounding)."""
    s = HEX_SIZE_DEG[res]
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    xf = (lon * SQRT3_OVER_3 - lat / 3.0) / s
    zf = (lat / 1.5) / s
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def qr_to_cell(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    return (
        np.int64(res - 6) * RES_CODE_SHIFT
        + (np.asarray(q, dtype=np.int64) + AXIS_OFFSET) * AXIS_SHIFT
        + (np.asarray(r, dtype=np.int64) + AXIS_OFFSET)
    )


def latlng_to_cell(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    q, r = latlng_to_qr(lat, lon, res)
    return qr_to_cell(q, r, res)


def cell_to_qr(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell_id → (q, r, res)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // RES_CODE_SHIFT + 6
    rem = cell % RES_CODE_SHIFT
    q = rem // AXIS_SHIFT - AXIS_OFFSET
    r = rem % AXIS_SHIFT - AXIS_OFFSET
    return q, r, res


def cell_to_latlng(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """cell_id → centroid (lat, lon)."""
    q, r, res = cell_to_qr(cell)
    sizes = np.vectorize(HEX_SIZE_DEG.__getitem__, otypes=[np.float64])(res)
    lat = r * 1.5 * sizes
    lon = (q + r / 2.0) * SQRT3 * sizes
    return lat, lon


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Re-encode a cell's centroid at a coarser resolution."""
    lat, lon = cell_to_latlng(cell)
    return latlng_to_cell(lat, lon, parent_res)


def ring_offsets(k: int) -> np.ndarray:
    """(n, 2) array of axial k-disk offsets, 1+3k(k+1) rows."""
    out = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if abs(dq + dr) <= k
    ]
    return np.asarray(out, dtype=np.int64)


def k_ring(cell: np.ndarray, k: int) -> np.ndarray:
    """Vectorized k-disk expansion: (n,) cells → (n, 1+3k(k+1)) neighbor ids."""
    q, r, res = cell_to_qr(cell)
    offs = ring_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    res_code = (np.asarray(cell, dtype=np.int64) // RES_CODE_SHIFT)[:, None]
    return res_code * RES_CODE_SHIFT + (qq + AXIS_OFFSET) * AXIS_SHIFT + (rr + AXIS_OFFSET)


def cell_to_string(cell: np.ndarray) -> np.ndarray:
    """Canonical 15-hex-char lowercase rendering — satisfies the reference's
    H3 validity contract (regex ^[0-9a-f]+$, length 15 —
    ``/root/reference/notebooks/00_quality_checks.py:91-98``)."""
    cell = np.asarray(cell, dtype=np.int64)
    return np.char.zfill(np.char.lower(np.char.mod("%x", cell)), 15)


def string_to_cell(s: np.ndarray) -> np.ndarray:
    return np.asarray([int(x, 16) for x in np.asarray(s)], dtype=np.int64)


def haversine_miles(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Numpy mirror of the SQL haversine (oracle for tests)."""
    lat1, lon1, lat2, lon2 = (np.asarray(a, dtype=np.float64) for a in (lat1, lon1, lat2, lon2))
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    a = (
        np.sin(dlat / 2.0) ** 2
        + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2)) * np.sin(dlon / 2.0) ** 2
    )
    return 7917.511798 * np.arcsin(np.sqrt(a))
