"""projcl_ray — a Ray-Data-native geospatial engine with the capabilities of
evanmiller/ProjCL (map projections, geodesics, datum shifts, image warping)
plus a spatial-join + tiling layer and large-scale data-pipeline operators
(dedup, ANN, text analysis), built on `ray.data.Dataset` / `map_batches` over
zero-copy Arrow batches.

Nothing in this package calls ``ray.init()`` — sessions are owned by the
driver, bench.py, or the test fixture.
"""

__version__ = "0.1.0"
