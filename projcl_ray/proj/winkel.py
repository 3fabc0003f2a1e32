"""Winkel Tripel (sphere only).

Semantics per `kernel/pl_project_winkel_tripel.opencl:10-112` and host prep
`src/projcl_run.c:611-635`: cosphi1 defaults to 2/π when rlat1 is NaN; forward
is closed form; inverse is the Ipbuker & Bildirici (2005) 2×2 Newton with the
reference's corrected df1lam, run to float64 tolerance (the reference runs 4
fixed iterations).
"""

from __future__ import annotations

import math

import numpy as np

from .base import as_float, DEG_TO_RAD, RAD_TO_DEG, PreparedProjection, ProjParams, dtype_tol, register


@register("winkel_tripel")
def prepare_winkel(params: ProjParams) -> PreparedProjection:
    if not params.spherical:
        raise ValueError("winkel_tripel is sphere-only in the reference (no _e kernels)")
    info = params.info
    lam0 = params.lon0 * DEG_TO_RAD
    x0, y0 = params.x0, params.y0
    k = params.scale * info.major_axis
    cosphi1 = 2.0 / math.pi if math.isnan(params.rlat1) else math.cos(params.rlat1 * DEG_TO_RAD)

    def forward(lon, lat):
        lam = as_float(lon) * DEG_TO_RAD - lam0
        phi = as_float(lat) * DEG_TO_RAD
        lam2 = 0.5 * lam
        sinp, cosp = np.sin(phi), np.cos(phi)
        sinl2, cosl2 = np.sin(lam2), np.cos(lam2)
        cosD = cosp * cosl2
        d = np.arccos(np.clip(cosD, -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            d_over_sin = np.where(d == 0.0, 1.0, d / np.sqrt(np.maximum(1.0 - cosD * cosD, 1e-300)))
        x = lam2 * cosphi1 + d_over_sin * cosp * sinl2
        y = 0.5 * (phi + d_over_sin * sinp)
        return x0 + k * x, y0 + k * y

    def inverse(x, y):
        xx = (as_float(x) - x0) / k
        yy = (as_float(y) - y0) / k
        phi = yy.copy() if isinstance(yy, np.ndarray) else np.float64(yy)
        sinp, cosp = np.sin(phi), np.cos(phi)
        lam = 2.0 * xx / (cosp + cosphi1)
        _ctol = dtype_tol(xx, 1e-14, 1e-6)
        for _ in range(24):
            sin2phi = 2.0 * sinp * cosp
            sinl2, cosl2 = np.sin(0.5 * lam), np.cos(0.5 * lam)
            sinl = 2.0 * sinl2 * cosl2
            d = np.arccos(np.clip(cosp * cosl2, -1.0, 1.0))
            c = np.sin(d)
            with np.errstate(divide="ignore", invalid="ignore"):
                invC = 1.0 / (c * c)
                invC12 = 1.0 / c
            dInvC32 = d * invC * invC12
            f1 = d * cosp * sinl2 * invC12 + 0.5 * lam * cosphi1 - xx
            f2 = 0.5 * d * sinp * invC12 + 0.5 * phi - yy
            df1phi = 0.25 * sinl * sin2phi * invC - dInvC32 * sinp * sinl2
            df1lam = 0.5 * (
                cosp * cosp * sinl2 * sinl2 * invC
                + dInvC32 * cosp * cosl2 * sinp * sinp
                + cosphi1
            )
            df2phi = 0.5 * (
                sinp * sinp * cosl2 * invC + dInvC32 * sinl2 * sinl2 * cosp + 1.0
            )
            df2lam = 0.125 * (sin2phi * sinl2 * invC - dInvC32 * sinp * cosp * cosp * sinl)
            inv_det = 1.0 / (df1phi * df2lam - df2phi * df1lam)
            dphi = -(f1 * df2lam - f2 * df1lam) * inv_det
            dlam = -(f2 * df1phi - f1 * df2phi) * inv_det
            # guard the λ=φ=0 singularity where the Jacobian degenerates
            dphi = np.where(np.isfinite(dphi), dphi, 0.0)
            dlam = np.where(np.isfinite(dlam), dlam, 0.0)
            phi = phi + dphi
            lam = lam + dlam
            sinp, cosp = np.sin(phi), np.cos(phi)
            if np.all(np.abs(dphi) < _ctol) and np.all(np.abs(dlam) < _ctol):
                break
        return (lam + lam0) * RAD_TO_DEG, phi * RAD_TO_DEG

    return PreparedProjection("winkel_tripel", params, forward, inverse)
