from .kernels import (  # noqa: F401
    points_in_ring,
    points_in_polygon,
    shoelace_area,
    signed_area,
    is_clockwise,
    centroid,
    ring_bbox,
    segment_intersection,
    lcos,
    planar_dist_m,
    spherical_area_km2,
    sutherland_hodgman,
    clip_chain_parts,
)
from .cells import cell_of, cell_cover_bbox, cell_bounds, CELL_LEVEL_DEFAULT  # noqa: F401
