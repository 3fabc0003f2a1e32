"""Spatial cell index + tiling conventions.

The engine's shuffle key is a deterministic equal-angle cell grid (an
S2/H3-style discrete global grid simplified to lat/lon bins so that cell
assignment is pure arithmetic — exactly reproducible in SQL for the
correctness oracle, and computable vectorized with zero state).

Cell id layout (int64): ``iy * nx + ix`` with
``ix = floor((lon+180)/res)``, ``iy = floor((lat+90)/res)`` — row-major,
mirroring the reference's row-first tile indexing convention
(`kernel/pl_sample_nearest.opencl:37-39`: index = col + row·tiles_across).

Partitioning assumption documented for all downstream joins: two features
interact only if they share a cell (or a cell within `ring` neighbors);
callers must choose ``res_deg`` ≥ the interaction radius.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RES_DEG = 5.0


def nx(res_deg: float) -> int:
    return int(round(360.0 / res_deg))


def ny(res_deg: float) -> int:
    return int(round(180.0 / res_deg))


def cell_id(lon, lat, res_deg: float = DEFAULT_RES_DEG) -> np.ndarray:
    """Vectorized cell assignment. Clamps to the valid grid (poles/antimeridian
    guard) so every finite point gets a cell."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    _nx, _ny = nx(res_deg), ny(res_deg)
    ix = np.clip(np.floor((lon + 180.0) / res_deg).astype(np.int64), 0, _nx - 1)
    iy = np.clip(np.floor((lat + 90.0) / res_deg).astype(np.int64), 0, _ny - 1)
    return iy * _nx + ix


def cell_bounds(cid: np.ndarray, res_deg: float = DEFAULT_RES_DEG):
    """(lon_min, lat_min, lon_max, lat_max) of cells."""
    cid = np.asarray(cid, np.int64)
    _nx = nx(res_deg)
    ix = cid % _nx
    iy = cid // _nx
    lon_min = ix * res_deg - 180.0
    lat_min = iy * res_deg - 90.0
    return lon_min, lat_min, lon_min + res_deg, lat_min + res_deg


def cell_neighbors(cid: np.ndarray, res_deg: float = DEFAULT_RES_DEG, ring: int = 1):
    """For each cell id return the (2·ring+1)² neighborhood (with lon wrap,
    lat clamped) — the kNN candidate-generation ring. Returns array of shape
    (len(cid), k)."""
    cid = np.asarray(cid, np.int64).ravel()
    _nx, _ny = nx(res_deg), ny(res_deg)
    ix = cid % _nx
    iy = cid // _nx
    offs = np.arange(-ring, ring + 1)
    dx, dy = np.meshgrid(offs, offs)
    nbr_x = (ix[:, None] + dx.ravel()[None, :]) % _nx  # wrap antimeridian
    nbr_y = np.clip(iy[:, None] + dy.ravel()[None, :], 0, _ny - 1)
    return nbr_y * _nx + nbr_x


def cells_covering_bbox(lon_min, lat_min, lon_max, lat_max,
                        res_deg: float = DEFAULT_RES_DEG) -> np.ndarray:
    """All cell ids intersecting a bounding box (small, driver-side helper for
    broadcasting polygon cell sets). No antimeridian split (inputs here live in
    the reference's validity window)."""
    _nx, _ny = nx(res_deg), ny(res_deg)
    ix0 = int(np.clip(np.floor((lon_min + 180.0) / res_deg), 0, _nx - 1))
    ix1 = int(np.clip(np.floor((lon_max + 180.0) / res_deg), 0, _nx - 1))
    iy0 = int(np.clip(np.floor((lat_min + 90.0) / res_deg), 0, _ny - 1))
    iy1 = int(np.clip(np.floor((lat_max + 90.0) / res_deg), 0, _ny - 1))
    xs = np.arange(ix0, ix1 + 1)
    ys = np.arange(iy0, iy1 + 1)
    gx, gy = np.meshgrid(xs, ys)
    return (gy * _nx + gx).ravel()


# ---------------------------------------------------------------------------
# Tile cutting (the logical descendant of PLImageArrayBuffer, projcl_warp.h:22-28)
# ---------------------------------------------------------------------------


def tile_index(tile_col: np.ndarray, tile_row: np.ndarray, tiles_across: int) -> np.ndarray:
    """Row-first tile id: col + row·tiles_across (pl_sample_nearest.opencl:37-39)."""
    return np.asarray(tile_col) + np.asarray(tile_row) * tiles_across


def cut_tiles(img: np.ndarray, tile_size: int):
    """Cut (H, W, C) into equal tiles of tile_size (edge tiles zero-padded to
    full size, as the reference's image arrays require equal-size tiles).

    Yields (tile_col, tile_row, tile_idx, tile_pixels).
    """
    h, w = img.shape[:2]
    tiles_across = (w + tile_size - 1) // tile_size
    tiles_down = (h + tile_size - 1) // tile_size
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            tile = img[ty * tile_size : (ty + 1) * tile_size, tx * tile_size : (tx + 1) * tile_size]
            if tile.shape[0] != tile_size or tile.shape[1] != tile_size:
                pad = np.zeros((tile_size, tile_size) + img.shape[2:], dtype=img.dtype)
                pad[: tile.shape[0], : tile.shape[1]] = tile
                tile = pad
            yield tx, ty, int(tile_index(tx, ty, tiles_across)), tile
