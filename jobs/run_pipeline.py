"""spark-submit entry point for the full engine pipeline.

Cluster usage (the north-rule deployment shape):

    zip -r gdal_spark.zip gdal_spark
    spark-submit --py-files gdal_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        jobs/run_pipeline.py \\
        --images /path/images_ids.parquet --zones-n 10000 \\
        --out /warehouse/tiles --zoom 12 --resume

Stages: derive georef (Column math) -> PIP join vs zones -> zoom-z
tile assignment -> per-tile counts, committed through the resumable
snapshot writer (anti-join skip of already-committed tiles, lineage
columns, per-run metrics). Local smoke: `python jobs/run_pipeline.py
--images-n 100000 --out /tmp/tiles`.
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="parquet of image ids (column i)")
    ap.add_argument("--images-n", type=int, default=None,
                    help="synthesize N image ids instead of reading parquet")
    ap.add_argument("--zones-n", type=int, default=1000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--resume", action="store_true", default=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gdal_spark.fixtures import georef
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.operators.scale import ResumableWriter
    from gdal_spark.operators.spatial_join import pip_join
    from gdal_spark.operators.tiling import assign_tiles
    from gdal_spark.session import get_spark

    spark = get_spark("gdal-spark-pipeline")
    if args.images_n is not None:
        ids = spark.range(args.images_n).withColumnRenamed("id", "i")
    else:
        ids = spark.read.parquet(args.images).select("i")
    images = georef.with_image_geo(ids, "i")
    zones = build_zones(spark, n=args.zones_n)

    run_id = uuid.uuid4().hex
    n_pairs = pip_join(images, zones).count()

    tiles = (
        assign_tiles(images, args.zoom)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.count("*").alias("n_images"))
    )
    writer = ResumableWriter(spark, args.out, keys=["tile_z", "tile_x", "tile_y"])
    metrics = writer.run(tiles, job_run_id=run_id)

    print(json.dumps({
        "job_run_id": run_id,
        "pip_pairs": n_pairs,
        "tile_metrics": metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
