"""Pure-numpy geospatial kernels (no Ray, no third-party geo libs).

The sandbox has no ``h3`` / ``s2`` / ``shapely`` wheels (SURVEY.md §7.1),
and the north rule requires the H3/S2 index, point-in-polygon and kNN to
be built from scratch anyway (BASELINE.json:14). Everything here is
deterministic, vectorized numpy, importable without a Ray session.
"""

from engine.geo import h3like, knn, pip, s2like  # noqa: F401
