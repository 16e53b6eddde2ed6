from .index import PolygonIndex, Polygon  # noqa: F401
from .bsp import BSPTileTree, build_bsp_tiles, density_histogram  # noqa: F401
