"""Projection framework: parameter record, shared numerics, registry.

The reference dispatches per (projection, direction, sphere|ellipsoid) to an
OpenCL kernel with host-precomputed scalar args (`/root/reference/src/projcl_run.c:65-111,
236-264,287-298`).  Here each projection is a pair of vectorized float64 NumPy
functions built once from a :class:`ProjParams` — the "prep" step is the host
precompute, the returned closures are the kernels.

Conventions preserved from the reference:
- inputs/outputs are degrees for geographic coordinates;
- ``out = (x0, y0) + folded_scale * f(λ−λ0, φ)`` with the same constant folding
  per projection (e.g. Albers folds ``scale·a/n``, TM folds ``scale·a·krueger_A``);
- longitude wrap via ``pl_mod_pi`` (`kernel/peel.opencl:55-57`);
- iterative inverses converge to tolerance instead of the reference's fixed
  float32 iteration counts (`kernel/peel.opencl:12-15`) — strictly tighter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Callable

import numpy as np

from ..spheroid import SpheroidInfo, get_spheroid, is_spherical

DEG_TO_RAD = math.pi / 180.0
RAD_TO_DEG = 180.0 / math.pi


@dataclass(frozen=True)
class ProjParams:
    """User-facing projection parameters (mirror of PLProjectionParams,
    projcl_types.h:127-137; defaults per src/projcl_params.c:7-50)."""

    spheroid: str = "SPHERE"
    scale: float = 1.0
    x0: float = 0.0
    y0: float = 0.0
    lon0: float = 0.0
    lat0: float = 0.0
    rlat1: float = math.nan
    rlat2: float = math.nan

    @property
    def info(self) -> SpheroidInfo:
        return get_spheroid(self.spheroid)

    @property
    def spherical(self) -> bool:
        return is_spherical(self.spheroid)

    def with_(self, **kw) -> "ProjParams":
        return replace(self, **kw)


# A prepared projection: two vectorized closures over float64 ndarrays.
# forward: (lon_deg, lat_deg) -> (x, y);  inverse: (x, y) -> (lon_deg, lat_deg)
PointFn = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]


@dataclass(frozen=True)
class PreparedProjection:
    name: str
    params: ProjParams
    forward: PointFn
    inverse: PointFn


# name -> prepare(params) -> PreparedProjection
_REGISTRY: dict[str, Callable[[ProjParams], PreparedProjection]] = {}

PROJECTION_NAMES = (
    "albers_equal_area",
    "american_polyconic",
    "lambert_conformal_conic",
    "lambert_azimuthal_equal_area",
    "mercator",
    "oblique_stereographic",
    "robinson",
    "transverse_mercator",
    "winkel_tripel",
)


def register(name: str):
    def deco(prep_fn):
        _REGISTRY[name] = prep_fn
        return prep_fn

    return deco


def prepare(name: str, params: ProjParams | None = None, **kw) -> PreparedProjection:
    """Resolve and precompute a projection; the analogue of kernel lookup +
    host param precompute (projcl_run.c:256-264 + per-proj prep).

    Raises KeyError for unknown names and ValueError for unsupported
    spheroid/projection combinations (the reference's kernel-not-found cases:
    oblique_stereographic is ellipsoid-only, robinson/winkel sphere-only).
    """
    if params is None:
        params = ProjParams(**kw)
    elif kw:
        params = params.with_(**kw)
    # LCC with symmetric standard parallels degenerates; the reference rewrites
    # it to a shifted Mercator (src/projcl_project.c:99-109, projcl_params.c:52-61).
    if (
        name == "lambert_conformal_conic"
        and not (math.isnan(params.rlat1) or math.isnan(params.rlat2))
        and abs((params.rlat1 + params.rlat2) * DEG_TO_RAD) < 1e-7
    ):
        info = params.info
        cosphi1 = math.cos(params.rlat1 * DEG_TO_RAD)
        merc = ProjParams(
            spheroid=params.spheroid,
            scale=params.scale * cosphi1,
            x0=params.x0 - params.scale * info.major_axis * cosphi1 * params.lon0 * DEG_TO_RAD,
            y0=params.y0
            - params.scale * info.major_axis * cosphi1 * math.asinh(math.tan(params.lat0 * DEG_TO_RAD)),
        )
        prepped = _REGISTRY["mercator"](merc)
        return PreparedProjection("lambert_conformal_conic", params, prepped.forward, prepped.inverse)
    if name not in _REGISTRY:
        raise KeyError(f"unknown projection {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](params)


def projection_names() -> tuple[str, ...]:
    return PROJECTION_NAMES


# ---------------------------------------------------------------------------
# Shared numerics (host helpers _pl_mlfn/_pl_qsfn/_pl_msfn/_pl_tsfn,
# projcl_run.c:214-233, and kernel helpers in peel.opencl), vectorized float64.
# ---------------------------------------------------------------------------


def mlfn(phi, sphi, cphi, en):
    """Meridional arc length series (projcl_run.c:214-218)."""
    cphi = cphi * sphi
    sphi2 = sphi * sphi
    return en[0] * phi - cphi * (en[1] + sphi2 * (en[2] + sphi2 * (en[3] + sphi2 * en[4])))


def mlfn1(phi, sphi, cphi, en):
    """d(mlfn)/dphi (kernel pl_mlfn1, pl_project_american_polyconic.opencl:11-17)."""
    cphi2 = cphi * cphi
    sphi2 = sphi * sphi
    return en[0] - (
        en[1] * (cphi2 - sphi2)
        + sphi2
        * (
            en[2] * (3 * cphi2 - sphi2)
            + sphi2 * (en[3] * (5 * cphi2 - sphi2) + sphi2 * (en[4] * (7 * cphi2 - sphi2)))
        )
    )


def qsfn(sinphi, e, one_es):
    """Authalic q (projcl_run.c:220-223 / peel.opencl:34-37)."""
    con = e * sinphi
    return one_es * (sinphi / (1.0 - con * con) + np.arctanh(con) / e)


def msfn(sinphi, cosphi, es):
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def tsfn(phi, sinphi, e):
    con = e * sinphi
    return np.tan(0.5 * (0.5 * math.pi - phi)) / np.power((1.0 - con) / (1.0 + con), 0.5 * e)


def as_float(arr):
    """float64 by default, but PRESERVE float32 inputs — the warp pixel path
    feeds float32 grids to halve memory traffic; exact-point APIs pass float64."""
    a = np.asarray(arr)
    if a.dtype == np.dtype(np.float32):
        return a
    return np.asarray(a, np.float64)


def dtype_tol(arr, f64=1e-15, f32=2e-7):
    """Convergence tolerance matched to the working dtype — float32 pipelines
    (the warp pixel path) exit iterative inverses as soon as they hit float32
    resolution instead of running to the iteration cap."""
    return f32 if getattr(arr, "dtype", None) == np.dtype(np.float32) else f64


def phi2(log_ts, e, tol=None, max_iter=20):
    """Inverse of the conformal latitude: solve φ from log(ts).

    Reference: pl_phi2 fixed-point loop (peel.opencl:39-53), run to float64
    tolerance here.
    """
    if tol is None:
        tol = dtype_tol(np.asarray(log_ts))
    phi = -np.arctan(np.sinh(log_ts))
    for _ in range(max_iter):
        con = e * np.sin(phi)
        dphi = -np.arctan(np.sinh(log_ts - e * np.arctanh(con))) - phi
        phi = phi + dphi
        if np.all(np.abs(dphi) <= tol):
            break
    return phi


def mod_pi(lam):
    """Wrap radians longitude into (−π, π] the way pl_mod_pi does
    (peel.opencl:55-57): a single ±2π correction."""
    return np.where(np.abs(lam) > math.pi, lam - np.copysign(2.0 * math.pi, lam), lam)
