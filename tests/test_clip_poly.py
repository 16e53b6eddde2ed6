"""G3 general polygon clipping kernel (Greiner-Hormann) vs hand-computed
fixtures — concave subjects, multi-piece results, differences, holes."""

import pytest

from osm2mp_spark.geometry.clip_poly import (
    DegenerateClip,
    clip_region_with_holes,
    gh_clip,
    gh_clip_robust,
    ring_area_abs,
)

SQ = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def total_area(rings):
    return sum(ring_area_abs(r) for r in rings)


class TestGHIntersection:
    def test_overlapping_squares(self):
        c = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)]
        out = gh_clip(SQ, c, "int")
        assert len(out) == 1
        assert total_area(out) == pytest.approx(4.0)
        assert set(out[0]) == {(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)}

    def test_concave_u_two_pieces(self):
        u = [(0.0, 0.0), (6.0, 0.0), (6.0, 5.0), (4.0, 5.0), (4.0, 2.0),
             (2.0, 2.0), (2.0, 5.0), (0.0, 5.0)]
        rect = [(-1.0, 3.0), (7.0, 3.0), (7.0, 7.0), (-1.0, 7.0)]
        out = gh_clip(u, rect, "int")
        assert len(out) == 2
        assert total_area(out) == pytest.approx(8.0)  # two 2x2 arm pieces

    def test_contained_subject(self):
        inner = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
        out = gh_clip(inner, SQ, "int")
        assert total_area(out) == pytest.approx(1.0)

    def test_disjoint(self):
        far = [(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0)]
        assert gh_clip(far, SQ, "int") == []


class TestGHDifference:
    def test_corner_bite(self):
        c = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0)]
        out = gh_clip(SQ, c, "diff")
        assert total_area(out) == pytest.approx(12.0)  # 16 - 4

    def test_bite_splits_subject(self):
        # clip band cuts the square into two pieces
        band = [(-1.0, 1.5), (5.0, 1.5), (5.0, 2.5), (-1.0, 2.5)]
        out = gh_clip(SQ, band, "diff")
        assert len(out) == 2
        assert total_area(out) == pytest.approx(16.0 - 4.0)

    def test_disjoint_diff_keeps_subject(self):
        far = [(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0)]
        out = gh_clip(SQ, far, "diff")
        assert total_area(out) == pytest.approx(16.0)


class TestDegeneracy:
    def test_shared_edge_raises(self):
        c = [(4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0)]
        with pytest.raises(DegenerateClip):
            gh_clip(SQ, c, "int")

    def test_robust_perturbs(self):
        c = [(4.0, 0.0), (8.0, 0.0), (8.0, 4.0), (4.0, 4.0)]
        out = gh_clip_robust(SQ, c, "int")
        assert total_area(out) == pytest.approx(0.0, abs=1e-6)

    def test_vertex_on_edge_robust(self):
        tri = [(4.0, 2.0), (8.0, 1.0), (8.0, 3.0)]  # apex touches SQ edge
        out = gh_clip_robust(tri, SQ, "int")
        assert total_area(out) == pytest.approx(0.0, abs=1e-6)


class TestRegionWithHoles:
    OUTER = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    HOLE = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)]

    def test_subject_overlapping_hole_corner(self):
        subj = [(1.0, 1.0), (5.0, 1.0), (5.0, 5.0), (1.0, 5.0)]
        res = clip_region_with_holes(subj, self.OUTER, [self.HOLE])
        assert res["inners"] == []
        assert total_area(res["outers"]) == pytest.approx(16.0 - 1.0)

    def test_hole_strictly_inside_subject(self):
        subj = [(1.0, 1.0), (9.0, 1.0), (9.0, 9.0), (1.0, 9.0)]
        res = clip_region_with_holes(subj, self.OUTER, [self.HOLE])
        assert total_area(res["outers"]) == pytest.approx(64.0)
        assert len(res["inners"]) == 1
        assert ring_area_abs(res["inners"][0]) == pytest.approx(4.0)

    def test_concave_outer(self):
        # concave L-shaped region
        l_outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
                   (4.0, 10.0), (0.0, 10.0)]
        subj = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]
        res = clip_region_with_holes(subj, l_outer, [])
        # subject ∩ L = L-shaped piece: area = 6x2 + 2x4 = 20... compute:
        # x 2-8, y 2-4 => 12 ; x 2-4, y 4-8 => 8 ; total 20
        assert total_area(res["outers"]) == pytest.approx(20.0)


class TestClipPolygonsSpark:
    def test_clipped_area_matches_grid_sampling(self, spark):
        """Independent oracle: per-hexagon clipped area from the GH kernel
        must match a dense-grid PIP estimate of |hexagon ∩ region|."""
        import numpy as np

        from osm2mp_spark.geometry.kernels import points_in_polygon
        from osm2mp_spark.queries.geometry import (
            CONCAVE_HOLE,
            CONCAVE_OUTER,
            clip_polygons_concave,
        )
        from osm2mp_spark.sources.points import derived_points_np

        out = clip_polygons_concave(spark, "/root/testdata/sf0.001").toPandas()
        assert len(out) > 0
        hex_area = 3 * (3 ** 0.5) / 2 * 4.0  # regular hexagon r=2
        assert (out[~out.is_inner].area <= hex_area + 1e-6).all()
        # net clipped area per polygon = outer pieces - contained holes
        net = (
            out.assign(signed=np.where(out.is_inner, -out.area, out.area))
            .groupby("poly_id").signed.sum()
        )
        # grid estimate over each hexagon's bbox
        ids = net.index.to_numpy()
        cx, cy = derived_points_np(ids)
        g = np.linspace(-2.0, 2.0, 45)
        gx, gy = np.meshgrid(g, g)
        gx, gy = gx.ravel(), gy.ravel()
        cell = (g[1] - g[0]) ** 2
        ang = np.radians(np.arange(6) * 60.0 + 10.0)
        est = np.zeros(len(ids))
        for k, (x0, y0) in enumerate(zip(cx, cy)):
            hexr = list(zip(x0 + 2 * np.cos(ang), y0 + 2 * np.sin(ang)))
            px, py = gx + x0, gy + y0
            in_hex = points_in_polygon(px, py, [hexr]) == 1
            in_reg = (
                points_in_polygon(px, py, [CONCAVE_OUTER], [CONCAVE_HOLE]) == 1
            )
            est[k] = (in_hex & in_reg).sum() * cell
        diff = np.abs(est - net.to_numpy())
        assert diff.max() < 0.35  # grid resolution bound (cell ≈ 0.0083°²)

    def test_operator_multi_piece(self, spark):
        from osm2mp_spark.operators.clip import clip_polygons_to_region

        # subject square straddling the concave notch of an L-region:
        # intersection = two pieces
        l_outer = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (6.0, 10.0),
                   (6.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0)]
        df = spark.createDataFrame(
            [(1, [{"lon": 1.0, "lat": 5.0}, {"lon": 9.0, "lat": 5.0},
                  {"lon": 9.0, "lat": 9.0}, {"lon": 1.0, "lat": 9.0}])],
            "poly_id bigint, ring array<struct<lon:double, lat:double>>",
        )
        out = clip_polygons_to_region(df, l_outer).toPandas()
        assert len(out) == 2
        assert out.area.sum() == pytest.approx(3 * 4 * 2.0)  # two 3x4 pieces


class TestGHProperties:
    """Property: for simple convex-ish random polygons,
    area(A∩B) + area(A∖B) == area(A) (the boolean ops partition A)."""

    def test_area_additivity_random_convex(self):
        import math
        import random

        from osm2mp_spark.geometry.clip_poly import (
            DegenerateClip,
            gh_clip_robust,
        )

        rng = random.Random(20260816)

        def rand_convex(cx, cy, r, n):
            angs = sorted(rng.uniform(0, 2 * math.pi) for _ in range(n))
            return [
                (cx + r * (0.6 + 0.4 * rng.random()) * math.cos(a),
                 cy + r * (0.6 + 0.4 * rng.random()) * math.sin(a))
                for a in angs
            ]

        checked = 0
        for trial in range(60):
            a = rand_convex(0.0, 0.0, 5.0, rng.randint(4, 9))
            b = rand_convex(rng.uniform(-4, 4), rng.uniform(-4, 4),
                            rng.uniform(2, 6), rng.randint(4, 9))
            try:
                inter = gh_clip_robust(a, b, "int")
                diff = gh_clip_robust(a, b, "diff")
            except DegenerateClip:
                continue  # genuinely degenerate random contact — skip
            area_a = total_area([a + [a[0]]])
            got = total_area(inter) + total_area(diff)
            assert got == pytest.approx(area_a, rel=1e-9), (a, b)
            checked += 1
        assert checked >= 50  # the suite must actually exercise the kernel
