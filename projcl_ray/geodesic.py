"""Geodesic solvers: spherical closed forms + Vincenty ellipsoidal direct/inverse.

Reference semantics:
- haversine many-to-many distance (`kernel/pl_geodesic.opencl:31-59`, runner
  `src/projcl_run.c:637-692` applies an optional output ``scale``);
- spherical direct, fixed distance × many azimuths and fixed azimuth × many
  distances (`kernel/pl_geodesic.opencl:61-122`);
- Vincenty direct for the ellipsoid: the reference ships the NGS
  Vincenty/Rainsford routine commented out (`kernel/pl_geodesic.opencl:139-209`,
  listed in its TODO); we implement the published algorithm (Vincenty 1975,
  Survey Review 23(176)) in float64, plus the inverse problem the reference
  lacks entirely (required by the north-star spec).

All angles degrees in/out, distances meters (radius defaults to the
reference's SPHERE radius 6370997.0, projcl_spheroid.c:20).
"""

from __future__ import annotations

import math

import numpy as np

from .spheroid import get_spheroid

SPHERE_RADIUS = 6370997.0
DEG = math.pi / 180.0


def haversine(lon1, lat1, lon2, lat2, radius: float = SPHERE_RADIUS):
    """Pairwise (element-wise, broadcasting) great-circle distance in meters.

    Same formula as pl_inverse_geodesic_s: 2R·asin√(sin²(Δφ/2)+cosφ1·cosφ2·sin²(Δλ/2)).
    """
    lam1 = np.asarray(lon1, np.float64) * DEG
    phi1 = np.asarray(lat1, np.float64) * DEG
    lam2 = np.asarray(lon2, np.float64) * DEG
    phi2 = np.asarray(lat2, np.float64) * DEG
    shp = np.sin(0.5 * (phi2 - phi1))
    shl = np.sin(0.5 * (lam2 - lam1))
    h = shp * shp + np.cos(phi1) * np.cos(phi2) * shl * shl
    return 2.0 * radius * np.arcsin(np.minimum(np.sqrt(h), 1.0))


def haversine_matrix(lon1, lat1, lon2, lat2, radius: float = SPHERE_RADIUS):
    """n1×n2 distance table (the reference's 2D NDRange cross product)."""
    return haversine(
        np.asarray(lon1, np.float64)[:, None],
        np.asarray(lat1, np.float64)[:, None],
        np.asarray(lon2, np.float64)[None, :],
        np.asarray(lat2, np.float64)[None, :],
        radius,
    )


def forward_sphere(lon, lat, azimuth_deg, distance_m, radius: float = SPHERE_RADIUS):
    """Spherical direct problem (closed form, pl_forward_geodesic_fixed_distance_s).

    Broadcasts over all inputs; distance in meters; returns (lon2, lat2) degrees.
    Longitude wrapped with the reference's single ±2π correction.
    """
    lam1 = np.asarray(lon, np.float64) * DEG
    phi1 = np.asarray(lat, np.float64) * DEG
    az = np.asarray(azimuth_deg, np.float64) * DEG
    d = np.asarray(distance_m, np.float64) / radius
    sin_d, cos_d = np.sin(d), np.cos(d)
    sin_p, cos_p = np.sin(phi1), np.cos(phi1)
    sin_az, cos_az = np.sin(az), np.cos(az)
    phi2 = np.arcsin(np.clip(sin_p * cos_d + cos_p * sin_d * cos_az, -1.0, 1.0))
    lam2 = lam1 + np.arctan2(sin_d * sin_az, cos_p * cos_d - sin_p * sin_d * cos_az)
    lam2 = np.where(np.abs(lam2) > math.pi, lam2 - np.copysign(2 * math.pi, lam2), lam2)
    return lam2 / DEG, phi2 / DEG


def vincenty_direct(lon, lat, azimuth_deg, distance_m, spheroid: str = "WGS_84"):
    """Ellipsoidal direct problem (Vincenty 1975, eqs. 1-11; the algorithm the
    reference's commented-out pl_forward_geodesic_e transcribes).

    Returns (lon2_deg, lat2_deg, back_azimuth_deg). Vectorized, broadcasting.
    """
    info = get_spheroid(spheroid)
    a, b = info.major_axis, info.minor_axis
    f = info.flattening

    lam1 = np.asarray(lon, np.float64) * DEG
    phi1 = np.asarray(lat, np.float64) * DEG
    alpha1 = np.asarray(azimuth_deg, np.float64) * DEG
    s = np.asarray(distance_m, np.float64)
    shape = np.broadcast_shapes(lam1.shape, phi1.shape, alpha1.shape, s.shape)
    lam1, phi1, alpha1, s = (np.broadcast_to(v, shape) for v in (lam1, phi1, alpha1, s))

    sin_a1, cos_a1 = np.sin(alpha1), np.cos(alpha1)
    tanU1 = (1.0 - f) * np.tan(phi1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1

    sigma1 = np.arctan2(tanU1, cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma = (s / (b * A)).copy()
    for _ in range(200):
        two_sigma_m = 2.0 * sigma1 + sigma
        cos2sm = np.cos(two_sigma_m)
        sin_s, cos_s = np.sin(sigma), np.cos(sigma)
        dsigma = (
            B
            * sin_s
            * (
                cos2sm
                + 0.25
                * B
                * (
                    cos_s * (-1.0 + 2.0 * cos2sm * cos2sm)
                    - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_s * sin_s) * (-3.0 + 4.0 * cos2sm * cos2sm)
                )
            )
        )
        new_sigma = s / (b * A) + dsigma
        delta = np.abs(new_sigma - sigma)
        sigma = new_sigma
        if np.all(delta < 1e-15):
            break

    sin_s, cos_s = np.sin(sigma), np.cos(sigma)
    cos2sm = np.cos(2.0 * sigma1 + sigma)
    tmp = sinU1 * sin_s - cosU1 * cos_s * cos_a1
    phi2 = np.arctan2(
        sinU1 * cos_s + cosU1 * sin_s * cos_a1,
        (1.0 - f) * np.hypot(sin_alpha, tmp),
    )
    lam = np.arctan2(sin_s * sin_a1, cosU1 * cos_s - sinU1 * sin_s * cos_a1)
    C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - C) * f * sin_alpha * (
        sigma + C * sin_s * (cos2sm + C * cos_s * (-1.0 + 2.0 * cos2sm * cos2sm))
    )
    lam2 = lam1 + L
    lam2 = np.where(np.abs(lam2) > math.pi, lam2 - np.copysign(2 * math.pi, lam2), lam2)
    alpha2 = np.arctan2(sin_alpha, -tmp)
    return lam2 / DEG, phi2 / DEG, (alpha2 / DEG) % 360.0


def vincenty_inverse(lon1, lat1, lon2, lat2, spheroid: str = "WGS_84", max_iter: int = 200):
    """Ellipsoidal inverse problem (Vincenty 1975): distance + fwd/back azimuths.

    The reference has no ellipsoidal inverse kernel (its `_e` lookup fails at
    runtime, src/projcl_geodesic.c:316); this fills that gap per the north-star.
    Near-antipodal pairs where classic Vincenty diverges are refined with
    Newton iterations on the DIRECT problem (see below), so the returned
    geodesic lands on the target to ~1e-13° everywhere, including exactly
    antipodal points.

    Returns (distance_m, azimuth12_deg, azimuth21_deg).
    """
    info = get_spheroid(spheroid)
    a, b = info.major_axis, info.minor_axis
    f = info.flattening

    lam1 = np.asarray(lon1, np.float64) * DEG
    phi1 = np.asarray(lat1, np.float64) * DEG
    lam2 = np.asarray(lon2, np.float64) * DEG
    phi2 = np.asarray(lat2, np.float64) * DEG
    shape = np.broadcast_shapes(lam1.shape, phi1.shape, lam2.shape, phi2.shape)
    lam1, phi1, lam2, phi2 = (np.broadcast_to(v, shape).copy() for v in (lam1, phi1, lam2, phi2))

    L = lam2 - lam1
    tanU1 = (1.0 - f) * np.tan(phi1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1
    tanU2 = (1.0 - f) * np.tan(phi2)
    cosU2 = 1.0 / np.sqrt(1.0 + tanU2 * tanU2)
    sinU2 = tanU2 * cosU2

    lam = L.copy()
    sin_sig = np.zeros(shape)
    cos_sig = np.ones(shape)
    sigma = np.zeros(shape)
    sin_alpha = np.zeros(shape)
    cos2_alpha = np.ones(shape)
    cos2sm = np.ones(shape)
    delta = np.zeros(shape)

    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sig = np.hypot(cosU2 * sin_lam, cosU1 * sinU2 - sinU1 * cosU2 * cos_lam)
        cos_sig = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sig != 0.0, cosU1 * cosU2 * sin_lam / sin_sig, 0.0)
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sm = np.where(
                cos2_alpha != 0.0, cos_sig - 2.0 * sinU1 * sinU2 / cos2_alpha, 0.0
            )
        C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        new_lam = L + (1.0 - C) * f * sin_alpha * (
            sigma + C * sin_sig * (cos2sm + C * cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm))
        )
        delta = np.abs(new_lam - lam)
        lam = new_lam
        if np.all(delta < 1e-14):
            break

    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsigma = (
        B
        * sin_sig
        * (
            cos2sm
            + 0.25
            * B
            * (
                cos_sig * (-1.0 + 2.0 * cos2sm * cos2sm)
                - B / 6.0 * cos2sm * (-3.0 + 4.0 * sin_sig * sin_sig) * (-3.0 + 4.0 * cos2sm * cos2sm)
            )
        )
    )
    s = b * A * (sigma - dsigma)
    alpha1 = np.arctan2(cosU2 * np.sin(lam), cosU1 * sinU2 - sinU1 * cosU2 * np.cos(lam))
    alpha2 = np.arctan2(cosU1 * np.sin(lam), -sinU1 * cosU2 + cosU1 * sinU2 * np.cos(lam))

    # Near-antipodal pairs where classic Vincenty fails to converge: refine
    # (s, α1) with Newton on the DIRECT problem (robust everywhere), so the
    # returned geodesic lands exactly on the target point. The direct solver
    # is the forward model; finite-difference Jacobian, refinement applied to
    # the (rare) non-converged subset only.
    bad = np.nonzero(np.ravel(delta) > 1e-12)[0]
    if len(bad):
        fl1 = np.ravel(lam1)[bad] / DEG
        fp1 = np.ravel(phi1)[bad] / DEG
        fl2 = np.ravel(lam2)[bad] / DEG
        fp2 = np.ravel(phi2)[bad] / DEG
        s_b = np.ravel(s)[bad].copy()
        a_b = np.ravel(alpha1)[bad] / DEG
        for _ in range(30):
            lo0, la0, _ = vincenty_direct(fl1, fp1, a_b, s_b, spheroid)
            err_lon = (lo0 - fl2 + 180.0) % 360.0 - 180.0
            err_lat = la0 - fp2
            if max(np.max(np.abs(err_lon)), np.max(np.abs(err_lat))) < 1e-12:
                break
            da, ds_ = 1e-7, 0.1  # deg, meters
            lo_a, la_a, _ = vincenty_direct(fl1, fp1, a_b + da, s_b, spheroid)
            lo_s, la_s, _ = vincenty_direct(fl1, fp1, a_b, s_b + ds_, spheroid)
            j00 = ((lo_a - lo0 + 180.0) % 360.0 - 180.0) / da
            j01 = ((lo_s - lo0 + 180.0) % 360.0 - 180.0) / ds_
            j10 = (la_a - la0) / da
            j11 = (la_s - la0) / ds_
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            d_alpha = (-err_lon * j11 + err_lat * j01) / det
            d_s = (err_lon * j10 - err_lat * j00) / det
            # damp huge steps (Jacobian is ill-conditioned exactly antipodally)
            d_alpha = np.clip(d_alpha, -5.0, 5.0)
            d_s = np.clip(d_s, -2e5, 2e5)
            a_b = a_b + d_alpha
            s_b = np.maximum(s_b + d_s, 0.0)
        _, _, back_az = vincenty_direct(fl1, fp1, a_b, s_b, spheroid)
        s_flat = np.ravel(s)
        a1_flat = np.ravel(alpha1)
        a2_flat = np.ravel(alpha2)
        s_flat[bad] = s_b
        a1_flat[bad] = (a_b % 360.0) * DEG
        a2_flat[bad] = ((back_az + 180.0) % 360.0) * DEG  # forward az at point 2
        s = s_flat.reshape(shape)
        alpha1 = a1_flat.reshape(shape)
        alpha2 = a2_flat.reshape(shape)

    return s, (alpha1 / DEG) % 360.0, (alpha2 / DEG) % 360.0
