"""Datum-shift correctness (FIXTURES.md §5): fused single-matrix path vs the
explicit two-step through WGS84, round-trips, identity shifts, and the
rotation+scale datum (CH_1903)."""

import numpy as np

from projcl_ray.datums import (
    DATUM_PARAMS,
    cartesian_to_geodetic,
    concat_shift_matrix,
    geodetic_to_cartesian,
    helmert_matrix,
    shift_datum,
)
from projcl_ray.geodesic import haversine

rng = np.random.default_rng(7)
LON = rng.uniform(-10, 20, 1000)
LAT = rng.uniform(35, 60, 1000)


def test_xyz_roundtrip():
    x, y, z = geodetic_to_cartesian(LON, LAT, "WGS_84")
    lon2, lat2 = cartesian_to_geodetic(x, y, z, "WGS_84")
    # Bowring/Toms non-iterative: ~5 mm for surface points (reference parity)
    assert np.max(np.hypot(lon2 - LON, lat2 - LAT)) < 1e-7


def test_identity_shift_is_noop():
    lon2, lat2 = shift_datum(LON, LAT, "WGS_84", "WGS_84")
    assert np.max(np.hypot(lon2 - LON, lat2 - LAT)) < 1e-7


def test_fused_matrix_equals_two_step():
    """The reference's pre-concatenation optimization must be exact to <1e-6 m
    in XYZ (it is pure linear algebra)."""
    m_fused = concat_shift_matrix("CH_1903", "NAD_27")
    m_two = np.linalg.inv(helmert_matrix("NAD_27")) @ helmert_matrix("CH_1903")
    np.testing.assert_allclose(m_fused, m_two, atol=1e-12)
    # and applied end-to-end vs going through WGS84 coordinates
    lo_a, la_a = shift_datum(LON, LAT, "CH_1903", "NAD_27",
                             src_spheroid="BESSEL_1841", dst_spheroid="CLARKE_1866")
    lo_w, la_w = shift_datum(LON, LAT, "CH_1903", "WGS_84",
                             src_spheroid="BESSEL_1841", dst_spheroid="WGS_84")
    lo_b, la_b = shift_datum(lo_w, la_w, "WGS_84", "NAD_27",
                             src_spheroid="WGS_84", dst_spheroid="CLARKE_1866")
    # two Bowring conversions vs one → sub-cm agreement
    d = haversine(lo_a, la_a, lo_b, la_b)
    assert np.max(d) < 0.01


def test_roundtrips_across_datum_pairs():
    for src, dst in [("WGS_84", "NAD_27"), ("NAD_83", "NAD_27"), ("ED_50", "WGS_84"),
                     ("CH_1903", "WGS_84"), ("WGS_72", "WGS_84")]:
        lon2, lat2 = shift_datum(LON, LAT, src, dst)
        lon3, lat3 = shift_datum(lon2, lat2, dst, src)
        d = haversine(lon3, lat3, LON, LAT)
        assert np.max(d) < 0.02, (src, dst, np.max(d))  # ~cm (two Bowring passes)


def test_shift_magnitudes_plausible():
    """ED50→WGS84 in Europe is a well-known ~100-200 m shift."""
    lon2, lat2 = shift_datum(np.array([10.0]), np.array([50.0]), "ED_50", "WGS_84")
    d = haversine(10.0, 50.0, lon2[0], lat2[0])
    assert 80 < d < 250


def test_datum_table_complete():
    assert len(DATUM_PARAMS) == 27
    assert DATUM_PARAMS["WGS_84"] == (0.0,) * 7
    # rotation+ppm datums present
    assert DATUM_PARAMS["CH_1903"][6] == 5.66
