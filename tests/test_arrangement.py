"""Arrangement-kernel tests: degenerate overlay classes + randomized
consistency + differential grid-truth checks.

Reference semantics: GEOS snap-rounded overlay as used by
OGRGeometry::Intersection/Union/Difference (ogr/ogrgeometry.cpp:4893,
5012,5331) and exercised on adjacency data by
autotest/ogr/ogr_layer_algebra.py.
"""

import numpy as np
import pytest

from gdal_spark.geo.arrangement import overlay_rings, set_precision
from gdal_spark.geo.boolean import boolean_op, polyset_area
from gdal_spark.geo.geom import points_in_ring, ring_area


def sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


def sarea(rings):
    """Signed-sum area: exact for the kernel's traced orientation."""
    return sum(ring_area(r) for r in rings)


DEGENERATE_CASES = [
    # (name, a, b, {op: expected even-odd area})
    ("identical", [sq(0, 0, 2, 2)], [sq(0, 0, 2, 2)],
     {"inter": 4, "union": 4, "diff": 0, "xor": 0}),
    ("adjacent-edge", [sq(0, 0, 2, 2)], [sq(2, 0, 4, 2)],
     {"inter": 0, "union": 8, "diff": 4, "xor": 8}),
    ("corner-touch", [sq(0, 0, 2, 2)], [sq(2, 2, 4, 4)],
     {"inter": 0, "union": 8, "diff": 4, "xor": 8}),
    ("partial-shared-edge", [sq(0, 0, 2, 2)], [sq(0.5, 2, 1.5, 3)],
     {"inter": 0, "union": 5, "diff": 4, "xor": 5}),
    ("t-junction", [sq(0, 0, 2, 2)], [sq(1, 2, 3, 4)],
     {"inter": 0, "union": 8, "diff": 4, "xor": 8}),
    ("half-overlap-shared-rails", [sq(0, 0, 2, 2)], [sq(1, 0, 3, 2)],
     {"inter": 2, "union": 6, "diff": 2, "xor": 4}),
    ("contained-shared-edge", [sq(0, 0, 4, 4)], [sq(1, 0, 2, 1)],
     {"inter": 1, "union": 16, "diff": 15, "xor": 15}),
    ("island", [sq(0, 0, 4, 4)], [sq(1, 1, 2, 2)],
     {"inter": 1, "union": 16, "diff": 15, "xor": 15}),
    ("b-equals-hole", [sq(0, 0, 4, 4), sq(1, 1, 2, 2)], [sq(1, 1, 2, 2)],
     {"inter": 0, "union": 16, "diff": 15, "xor": 16}),
    ("b-overlaps-hole-edge", [sq(0, 0, 4, 4), sq(1, 1, 2, 2)],
     [sq(1, 1, 3, 2)],
     {"inter": 1, "union": 16, "diff": 14, "xor": 15}),
    ("shared-vertex-diagonal", [sq(0, 0, 2, 2)], [sq(1, 1, 3, 3)],
     {"inter": 1, "union": 7, "diff": 3, "xor": 6}),
    ("multipart-bridge", [sq(0, 0, 1, 1), sq(2, 0, 3, 1)],
     [sq(0.5, 0, 2.5, 1)],
     {"inter": 1, "union": 3, "diff": 1, "xor": 2}),
]


class TestDegenerateOverlay:
    @pytest.mark.parametrize(
        "name,a,b,exp", DEGENERATE_CASES, ids=[c[0] for c in DEGENERATE_CASES]
    )
    def test_case(self, name, a, b, exp):
        for op, want in exp.items():
            got = sarea(overlay_rings(a, b, op))
            assert got == pytest.approx(want, abs=1e-9), f"{name}/{op}"

    def test_boolean_op_accepts_degenerates(self):
        # the public kernel entry point no longer raises on these
        a = [sq(0, 0, 2, 2)]
        assert polyset_area(boolean_op(a, [sq(2, 0, 4, 2)], "inter")) == 0.0
        assert polyset_area(boolean_op(a, [sq(0, 0, 2, 2)], "union")) == 4.0


class TestRandomizedConsistency:
    def test_identities_hold(self):
        rng = np.random.default_rng(123)

        def rand_poly(cx, cy, r, n, rot):
            # evenly spaced angles + bounded jitter: every angular gap
            # < pi, so the radial polygon is always SIMPLE
            base = np.linspace(0, 2 * np.pi, n, endpoint=False)
            ang = base + rng.uniform(0, 2 * np.pi / n * 0.9, n) + rot
            rad = rng.uniform(0.4 * r, r, n)
            pts = np.stack(
                [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
            )
            return np.vstack([pts, pts[:1]])

        for _trial in range(150):
            a = [rand_poly(0, 0, 2.0, int(rng.integers(4, 12)), rng.uniform(0, 1))]
            b = [rand_poly(rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                           2.0, int(rng.integers(4, 12)), rng.uniform(0, 1))]
            ai = sarea(overlay_rings(a, b, "inter"))
            au = sarea(overlay_rings(a, b, "union"))
            ad = sarea(overlay_rings(a, b, "diff"))
            ax = sarea(overlay_rings(a, b, "xor"))
            aa = abs(ring_area(a[0]))
            ab = abs(ring_area(b[0]))
            # 2^-20 snap moves areas by <= ~perimeter * 5e-7
            assert abs(ai + ad - aa) < 1e-4
            assert abs(au - (aa + ab - ai)) < 1e-4
            assert abs(ax - (au - ai)) < 1e-4

    def test_membership_against_grid(self):
        # differential check vs dense point sampling for one
        # non-trivial crossing pair (the shape class that exposed the
        # old GH kernel's mis-trace)
        a = [np.array([[-0.9, 1.7], [-1.05, 0.8], [-1.4, -1.4],
                       [1.4, 0.03], [-0.9, 1.7]])]
        b = [np.array([[-1.8, 0.44], [-0.8, 0.55], [-0.37, -0.46],
                       [1.47, 0.76], [-1.8, 0.44]])]
        N = 400
        xs = np.linspace(-2.0, 2.0, N)
        ys = np.linspace(-2.0, 2.0, N)
        X, Y = np.meshgrid(xs, ys)
        px, py = X.ravel(), Y.ravel()
        in_a = points_in_ring(px, py, a[0])
        in_b = points_in_ring(px, py, b[0])
        for op, truth in (
            ("inter", in_a & in_b),
            ("union", in_a | in_b),
            ("diff", in_a & ~in_b),
        ):
            rings = overlay_rings(a, b, op)
            got = np.zeros(len(px), dtype=bool)
            for r in rings:
                got ^= points_in_ring(px, py, r)
            # mismatches only within a snap-width of boundaries
            assert (got != truth).mean() < 0.005, op


class TestSetPrecision:
    def test_snaps_and_cleans(self):
        r = np.array([[0.0003, 0.0], [3.9996, 0.0004], [4.0, 4.0],
                      [0.0, 3.9997], [0.0003, 0.0]])
        out = set_precision([r], 0.001)
        assert len(out) == 1
        assert np.allclose(out[0] * 1000, np.rint(out[0] * 1000))

    def test_collapsed_ring_dropped(self):
        r = np.array([[0.0, 0.0], [0.0004, 0.0], [0.0004, 0.0004],
                      [0.0, 0.0]])
        assert set_precision([r], 0.01) == []

    def test_spike_removed(self):
        r = np.array([[0.0, 0.0], [4.0, 0.0], [8.0, 0.0], [4.0, 0.0],
                      [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        out = set_precision([r], 1.0)
        assert len(out) == 1
        assert abs(ring_area(out[0])) == 16.0
