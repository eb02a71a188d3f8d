"""Dump formatted physical plans of the flagship operators to
PLANS.md — the plan-quality evidence: broadcast joins where expected,
filter/column pushdown into parquet scans, whole-stage codegen over
the Column-math paths, AQE enabled.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from gdal_spark.session import get_spark

    spark = get_spark("plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections = {
        "tile_assign (Column-math explode; no UDF, no shuffle)": entry.q_tile_assign,
        "pip_join (cell equi-join + broadcast edge-parity refine)": entry.q_pip_join,
        "knn (ring candidates + window re-rank)": entry.q_knn,
        "rasterize_tile_add (narrow runs -> one agg shuffle)": entry.q_rasterize_tile_add,
        "tile_render (covering-tiles explode -> one shuffle -> applyInPandas)": entry.q_tile_render,
        "minhash_pairs (LSH bucket equi-join, no cross join)": entry.q_minhash_pairs,
        "ann_topk (broadcast queries + JVM dot products; brute-force baseline, BNLJ by design)": entry.q_ann_topk,
        "ann_lsh (banded signature equi-join; no nested loop)": entry.q_ann_lsh,
        "ann_lsh_ring (query-side probe explosion equi-join)": entry.q_ann_lsh_ring,
        "overlay_geom (planar cell equi-join -> pair kernel)": entry.q_overlay_geom,
        "dedup_clusters (edge-list label propagation; final join stage)": entry.q_dedup_clusters,
        "overlay (cell join + bbox reject + Arrow clip refine)": entry.q_overlay,
        "tile_render_utm (suggested-output + transformer chain)": entry.q_tile_render_utm,
        "ogr_where_orderby_limit (pushdown check)": entry.q_ogr_where_orderby_limit,
        "overlay_deg_union (arrangement kernel on coincident boundaries)": entry.q_overlay_deg_union,
        "grid_tin (DataFrame points -> halo cell explode -> one (cx,cy) shuffle)": entry.q_grid_tin,
        "contour_polygons (halo slivers -> per-tile march -> per-band assembly)": entry.q_contour_polygons,
        "phash_pairs (4x16-bit band equi-join)": entry.q_phash_pairs,
        "datum_shift (pure Column/Arrow math, no shuffle)": entry.q_datum_shift,
        "mdim_view (chained views collapse to one scan predicate)": entry.q_mdim_view,
        "mdim_resample (one groupBy with map-side partials)": entry.q_mdim_resample,
        "stac_latest (item cells explode -> cell equi-join, no range BNLJ)": entry.q_stac_latest,
        "ntv2_shift (broadcast-grid Arrow map, no shuffle)": entry.q_ntv2_shift,
        "hex_cell_counts (vectorized encode -> one bigint-key shuffle)": entry.q_hex_cell_counts,
        "simplify_coverage (segment-key groupBy -> chain kernel -> ring regroup)": entry.q_simplify_coverage,
        "zarr_roundtrip (binaryFile chunk scan -> narrow decode -> one agg)": entry.q_zarr_roundtrip,
        "ogr_sql_exec (translated dialect: pushdown + ilike)": entry.q_ogr_sql_exec,
        # round 4
        "proj_albers (registry reproject: narrow Arrow map, no shuffle)": entry.q_proj_albers,
        "tile_render_albers (registry warp: suggest -> covering explode -> one shuffle)": entry.q_tile_render_albers,
        "ogr_sql_join (dialect JOIN -> first-match row_number + LEFT join)": entry.q_ogr_sql_join,
        "geoloc_transform (broadcast geoloc arrays, narrow bilinear map)": entry.q_geoloc_transform,
        "netcdf_roundtrip (byte-range slab scan -> narrow decode -> one agg)": entry.q_netcdf_roundtrip,
        "gnm_k_shortest (top-K relaxation: final explode stage)": entry.q_gnm_k_shortest,
        # round 4, second sweep
        "ngram_jaccard (shingle LSH bucket equi-join + hash-set verify)": entry.q_ngram_jaccard,
        "cosine_dedup (sign-LSH banded SELF equi-join, no all-pairs)": entry.q_cosine_dedup,
        "proj_krovak (oblique conic: narrow Arrow map, no shuffle)": entry.q_proj_krovak,
        "info_vector (one distributed agg, no collect)": entry.q_info_vector,
        "gif_roundtrip (narrow mapInPandas codec kernel)": entry.q_gif_roundtrip,
        "osm_roundtrip (node-id equi-join assembly + relation member join)": entry.q_osm_roundtrip,
        # round 4, third sweep
        "dup_spans (shingle groupBy -> LEFT SEMI join back -> per-doc window)": entry.q_dup_spans,
        "kmeans_train (broadcast centroids; one (cell,dim) agg per iteration)": entry.q_kmeans_train,
        "repetition_quality (pure Column math, zero shuffle)": entry.q_repetition_quality,
        "wrapdateline (narrow Arrow map over WKB, no shuffle)": entry.q_wrapdateline,
        "grib_roundtrip (narrow mapInPandas codec kernel)": entry.q_grib_roundtrip,
        # round 4, fourth sweep
        "filter_funnel (pure Column math signals, zero shuffle)": entry.q_filter_funnel,
        "mixing_sample (stratified window sample: one source-key shuffle)": entry.q_mixing_sample,
        "lm_perplexity (bigram model join: broadcast model side)": entry.q_lm_perplexity,
        # round 4, fifth sweep
        "bpe_pair_counts (one corpus groupBy -> TakeOrderedAndProject top-k)": entry.q_bpe_pair_counts,
        "semdedup (cell-key self-join; cluster-bounded pairwise)": entry.q_semdedup,
        "line_locate (constant-path Column math, zero shuffle)": entry.q_line_locate,
        "arrow_roundtrip (footer-indexed by-batch distributed scan)": entry.q_arrow_roundtrip,
        "gdal_compare (image_id equi-join -> one mapInPandas decode+compare)": entry.q_gdal_compare,
        "histogram_match (narrow decode+LUT kernel, zero shuffle)": entry.q_histogram_match,
        "corpus_shuffle (shard-partitioned hash rank, no global sort)": entry.q_corpus_shuffle,
        # round 5
        "geodesic_ellipsoid (vectorized Karney-class inverse, zero shuffle)": entry.q_geodesic_ellipsoid,
        "hdf5_roundtrip (byte-range chunk scan -> narrow inflate -> one agg)": entry.q_hdf5_roundtrip,
        "db_scan (JDBC-style stride partitions, predicate pushed)": entry.q_db_scan,
        "surface_roundtrip (narrow WKB surface kernel, zero shuffle)": entry.q_surface_roundtrip,
        "rat (pixel histogram -> one value-key agg)": entry.q_rat,
        "jp2_roundtrip (narrow mapInPandas MQ/EBCOT codec kernel)": entry.q_jp2_roundtrip,
        # round 5, second sweep
        "gdaltindex (metadata-only Column math; one dedup exchange)": entry.q_gdaltindex,
        "ogrtindex (WKB bounds pass -> map-side-combined shard agg)": entry.q_ogrtindex,
        "retile (grid Column math + narrow tile kernel, zero shuffle)": entry.q_retile,
        "raster_update (narrow in-place warp kernel, zero shuffle)": entry.q_raster_update,
        "progressive_jpeg (narrow multi-scan codec kernel, zero shuffle)": entry.q_progressive_jpeg,
        "url_dedup (Column-math canonicalize -> url-key dedup -> domain-cap windows)": entry.q_url_dedup,
        "split_assign (salted md5 Column math, zero shuffle)": entry.q_split_assign,
        "jp2_reduce (resolution-pruned packet decode, narrow kernel)": entry.q_jp2_reduce,
        "mrf_roundtrip (tile-indexed container kernel, zero shuffle)": entry.q_mrf_roundtrip,
        "raw_fleet2 (seven-codec narrow kernel, zero shuffle)": entry.q_raw_fleet2,
        "gtfs (CSV scans -> stop-join -> ONE trip groupBy with array_sort)": entry.q_gtfs,
        "esric (bundle-granular distributed scan)": entry.q_esric,
        "stacta (binaryFile tile scan filtered by limits)": entry.q_stacta,
    }
    out = [
        "# PLANS.md — physical plans of the flagship operators",
        "",
        f"Generated by `python tools/explain_plans.py {sf_dir}`.",
        "What to look for: `PushedFilters`/`ReadSchema` on parquet scans",
        "(pushdown + pruning), `BroadcastHashJoin` for the small sides,",
        "`WholeStageCodegen` spans over the Column-math paths, and",
        "`AdaptiveSparkPlan` everywhere (AQE on).",
        "",
    ]
    for title, fn in sections.items():
        df = fn(spark, sf_dir)
        out.append(f"## {title}\n\n```\n{plan(df).strip()}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
