"""Mercator (sphere + ellipsoid).

Semantics per `kernel/pl_project_mercator.opencl:1-91` and host prep
`src/projcl_run.c:502-518`: folded scale = scale·a; lon0 is ignored (the
reference kernel takes no λ0 argument); x0/y0 applied after scaling.
"""

from __future__ import annotations

import numpy as np

from .base import DEG_TO_RAD, RAD_TO_DEG, PreparedProjection, ProjParams, phi2, register


@register("mercator")
def prepare_mercator(params: ProjParams) -> PreparedProjection:
    info = params.info
    k = params.scale * info.major_axis
    x0, y0 = params.x0, params.y0

    if params.spherical:

        def forward(lon, lat):
            lam = np.asarray(lon, np.float64) * DEG_TO_RAD
            phi = np.asarray(lat, np.float64) * DEG_TO_RAD
            return x0 + k * lam, y0 + k * np.arcsinh(np.tan(phi))

        def inverse(x, y):
            lam = (np.asarray(x, np.float64) - x0) / k
            yy = (np.asarray(y, np.float64) - y0) / k
            return lam * RAD_TO_DEG, np.arctan(np.sinh(yy)) * RAD_TO_DEG

    else:
        e = info.ecc

        def forward(lon, lat):
            lam = np.asarray(lon, np.float64) * DEG_TO_RAD
            phi = np.asarray(lat, np.float64) * DEG_TO_RAD
            y = np.arcsinh(np.tan(phi)) - e * np.arctanh(e * np.sin(phi))
            return x0 + k * lam, y0 + k * y

        def inverse(x, y):
            lam = (np.asarray(x, np.float64) - x0) / k
            yy = (np.asarray(y, np.float64) - y0) / k
            return lam * RAD_TO_DEG, phi2(-yy, e) * RAD_TO_DEG

    return PreparedProjection("mercator", params, forward, inverse)
