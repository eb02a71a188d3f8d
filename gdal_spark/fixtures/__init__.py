from gdal_spark.fixtures.georef import (  # noqa: F401
    LCG_A,
    LCG_C,
    LCG_M,
    ANCHOR_ZOOM,
    with_image_geo,
    with_zone_geo,
    with_site_geo,
    sql_images_cte,
    sql_zones_cte,
    sql_sites_cte,
)
