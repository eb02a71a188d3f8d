"""spark-submit job: the full `gdal raster tile` pipeline.

Renders the base zoom from the images table, builds the overview
pyramid down to z_min (2x2 average per level), encodes {z}/{x}/{y}.png
payloads, and commits every level through the resumable snapshot
writer — re-running after a crash re-renders only missing tiles
(apps/gdalalg_raster_tile.cpp:377 resume semantics; per-level loop
:3080).

Local smoke:
    python jobs/run_tiles.py --images-n 50 --z-max 12 --z-min 10 \\
        --out /tmp/tile_pyramid
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet of image ids (column i)")
    ap.add_argument("--images-n", type=int, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--z-max", type=int, default=12)
    ap.add_argument("--z-min", type=int, default=10)
    ap.add_argument("--png", action="store_true", help="also write png payloads")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.fixtures import georef
    from gdal_spark.operators.render import build_pyramid, encode_png_tiles
    from gdal_spark.session import get_spark

    spark = get_spark("gdal-spark-tiles")
    if args.images_n is not None:
        ids = spark.range(args.images_n).withColumnRenamed("id", "i")
    else:
        ids = spark.read.parquet(args.images).select("i")
    images = georef.with_image_geo(ids, "i")

    levels = build_pyramid(images, args.z_max, args.z_min, out_dir=args.out)
    stats = {}
    for z, df in levels.items():
        n = df.select("tile_x", "tile_y").distinct().count()
        stats[z] = n
        if args.png:
            pngs = encode_png_tiles(df, z)
            pngs.write.mode("overwrite").parquet(f"{args.out}/png_z={z}")
    print(json.dumps({"tiles_per_level": stats, "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
