from .reference import (  # noqa: F401
    stitch_rings_oracle,
    self_intersection_breaks_oracle,
    split_parts_from_breaks,
    merge_roads_oracle,
    stitch_coastlines_oracle,
    classify_lakes_islands_oracle,
)
