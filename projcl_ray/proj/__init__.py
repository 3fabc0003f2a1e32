"""Projection registry — importing this package registers all nine projections.

The registry mirrors the reference's `_pl_projection_info[]` dispatch table
(`src/projcl_run.c:65-111`): one entry per projection name, resolved at
pipeline-build time into a pair of vectorized float64 closures.
"""

from .base import (  # noqa: F401
    PreparedProjection,
    ProjParams,
    prepare,
    projection_names,
)

# Importing registers each projection with the registry.
from . import (  # noqa: F401, E402
    albers,
    laea,
    lcc,
    mercator,
    polyconic,
    robinson,
    stereographic,
    tmerc,
    winkel,
)

__all__ = ["ProjParams", "PreparedProjection", "prepare", "projection_names"]
