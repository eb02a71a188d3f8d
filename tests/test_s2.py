"""S2 cell encoder: structural Hilbert-curve properties, published
level-0 anchors, numpy-vs-Spark parity, and key/token consistency.

The tables are re-derived from the public S2 algorithm description
(cube face + quadratic ST + 4-orientation Hilbert); these tests pin
the properties that DEFINE that construction rather than golden ids:
a true Hilbert curve is a bijection with unit-step adjacency, the
level-0 face cells have the published tokens 1/3/5/7/9/b, and parents
contain children.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.tiles import s2

FACE_CENTERS = [  # (lng, lat) -> face 0..5
    (0.0, 0.0),
    (90.0, 0.0),
    (0.0, 90.0),
    (180.0, 0.0),
    (-90.0, 0.0),
    (0.0, -90.0),
]


def test_face_selection_centers():
    lngs = [c[0] for c in FACE_CENTERS]
    lats = [c[1] for c in FACE_CENTERS]
    face, u, v = s2.np_face_uv(lngs, lats)
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    np.testing.assert_allclose(u, 0.0, atol=1e-12)
    np.testing.assert_allclose(v, 0.0, atol=1e-12)


def test_level0_tokens_are_published_face_tokens():
    """S2's six level-0 cells have tokens 1,3,5,7,9,b (id = face<<61 | 1<<60)."""
    lngs = [c[0] for c in FACE_CENTERS]
    lats = [c[1] for c in FACE_CENTERS]
    face, u, v = s2.np_face_uv(lngs, lats)
    i = s2.np_st_to_ij(s2.np_uv_to_st(u), s2.MAX_LEVEL)
    j = s2.np_st_to_ij(s2.np_uv_to_st(v), s2.MAX_LEVEL)
    pos0 = s2.np_hilbert_pos(face, i, j) >> 60  # always 0 at level 0
    toks = s2.np_token(face, pos0, 0)
    assert toks.tolist() == ["1", "3", "5", "7", "9", "b"]


def test_uv_to_st_quadratic():
    # fixed points of the quadratic projection
    assert s2.np_uv_to_st([0.0]).tolist() == [0.5]
    assert s2.np_uv_to_st([1.0]).tolist() == [1.0]
    assert s2.np_uv_to_st([-1.0]).tolist() == [0.0]
    # odd symmetry about (0, 0.5)
    u = np.linspace(-1, 1, 101)
    st = s2.np_uv_to_st(u)
    np.testing.assert_allclose(st + st[::-1], 1.0, atol=1e-12)


@pytest.mark.parametrize("face", range(6))
def test_hilbert_bijection_and_adjacency(face):
    """The defining Hilbert properties at level 5 on every face: all
    1024 positions distinct, and consecutive positions are grid
    neighbors (|di|+|dj| == 1)."""
    L = 5
    n = 1 << L
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    pos = s2.np_hilbert_pos(
        np.full(ii.shape, face), ii << (30 - L), jj << (30 - L)
    ) >> (2 * (30 - L))
    assert len(set(pos.tolist())) == n * n
    order = np.argsort(pos)
    steps = np.abs(np.diff(ii[order])) + np.abs(np.diff(jj[order]))
    assert np.all(steps == 1)


def test_canonical_first_quadrant_order():
    """Face 0 (orientation 0) visits (0,0),(0,1),(1,1),(1,0) — the
    canonical kPosToIJ[0] order."""
    L = 1
    pts = [(0, 0), (0, 1), (1, 1), (1, 0)]
    pos = [
        int(
            s2.np_hilbert_pos([0], [i << 29], [j << 29])[0] >> 58
        )
        for i, j in pts
    ]
    assert pos == [0, 1, 2, 3]


def test_parent_contains_child():
    """key at level L-1 is the child's position >> 2 under the same face."""
    rng = np.random.default_rng(7)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    for lv in (4, 9, 14):
        child = s2.np_cell_key(lng, lat, lv)
        parent = s2.np_cell_key(lng, lat, lv - 1)
        face = child >> (2 * lv)
        cpos = child - (face << (2 * lv))
        assert np.all(parent == (face << (2 * (lv - 1))) + (cpos >> 2))


def test_token_hi_lo_split_matches_python_bigint():
    rng = np.random.default_rng(11)
    lng = rng.uniform(-180, 180, 64)
    lat = rng.uniform(-85, 85, 64)
    for lv in (3, 12, 20, 29):
        face, u, v = s2.np_face_uv(lng, lat)
        i = s2.np_st_to_ij(s2.np_uv_to_st(u), s2.MAX_LEVEL)
        j = s2.np_st_to_ij(s2.np_uv_to_st(v), s2.MAX_LEVEL)
        pos = s2.np_hilbert_pos(face, i, j) >> (2 * (s2.MAX_LEVEL - lv))
        toks = s2.np_token(face, pos, lv)
        for f, p, t in zip(face.tolist(), pos.tolist(), toks.tolist()):
            full = (f << 61) | (p << (61 - 2 * lv)) | (1 << (60 - 2 * lv))
            assert t == f"{full:016x}".rstrip("0")


def test_spark_matches_numpy(spark):
    rng = np.random.default_rng(3)
    lng = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-85, 85, 300)
    df = spark.createDataFrame(
        [(k, float(a), float(b)) for k, (a, b) in enumerate(zip(lng, lat))],
        "k int, lng double, lat double",
    )
    out = (
        s2.with_s2_cell(df, F.col("lng"), F.col("lat"), 12)
        .orderBy("k")
        .collect()
    )
    want_key = s2.np_cell_key(lng, lat, 12)
    face, u, v = s2.np_face_uv(lng, lat)
    i = s2.np_st_to_ij(s2.np_uv_to_st(u), s2.MAX_LEVEL)
    j = s2.np_st_to_ij(s2.np_uv_to_st(v), s2.MAX_LEVEL)
    pos = s2.np_hilbert_pos(face, i, j) >> (2 * (s2.MAX_LEVEL - 12))
    want_tok = s2.np_token(face, pos, 12)
    got_key = np.array([r.s2_key for r in out])
    got_tok = [r.s2_token for r in out]
    assert np.array_equal(got_key, want_key)
    assert got_tok == want_tok.tolist()


def test_spark_plan_is_broadcast_joins(spark):
    """The Hilbert fold must plan as broadcast joins (probe-only narrow
    map), never a shuffle join on the corpus side."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.7 - 80).alias("lng"),
        (F.col("id") * 0.5 - 25).alias("lat"),
    )
    plan = (
        s2.with_s2_cell(df, F.col("lng"), F.col("lat"), 12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_numpy_method_bit_identical(spark):
    """The Arrow fast path and the 8-join Column path must agree on
    every output column."""
    from pyspark.sql import functions as F

    from gdal_spark.fixtures.images import build_images
    from gdal_spark.tiles import s2 as s2mod

    ids = spark.range(2000).select(F.col("id").alias("i"))
    img = build_images(spark, ids_df=ids, with_payload=False)
    cols = ["i", "s2_face", "s2_pos", "s2_key", "s2_token"]
    a = (
        s2mod.with_s2_cell(img, F.col("lon_c"), F.col("lat_c"), 12)
        .select(cols).toPandas().sort_values("i").reset_index(drop=True)
    )
    b = (
        s2mod.with_s2_cell(
            img, F.col("lon_c"), F.col("lat_c"), 12, method="numpy"
        )
        .select(cols).toPandas().sort_values("i").reset_index(drop=True)
    )
    assert a.equals(b)
