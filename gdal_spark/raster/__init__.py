from gdal_spark.raster.codecs import decode_image, encode_image  # noqa: F401
from gdal_spark.raster.checksum import gdal_checksum  # noqa: F401
