from .points import (  # noqa: F401
    LON_MULT,
    LON_MOD,
    LAT_MULT,
    LAT_MOD,
    derived_lon_sql,
    derived_lat_sql,
    derived_points_np,
    with_derived_position,
)
from .layers import CITIES, REGIONS, COUNTRIES, ACCESS_AREAS, city_polygons  # noqa: F401
