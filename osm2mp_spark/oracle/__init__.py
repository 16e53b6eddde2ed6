from .reference import (  # noqa: F401
    stitch_rings_oracle,
    self_intersection_splits_oracle,
    merge_roads_oracle,
    stitch_coastlines_oracle,
    classify_lakes_islands_oracle,
)
