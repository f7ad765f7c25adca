"""Multi-view attention experiments: geometry roundtrips, triplane pooling,
epipolar correspondence attention."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.diffusion.correspondence import (
    build_correspondence_tables,
    epipolar_attention,
    make_epipolar_processor,
)
from gaussctrl_exp_tpu.diffusion.geometry import (
    bilinear_sample,
    depth_to_world_points,
    project_points,
)
from gaussctrl_exp_tpu.diffusion.triplane_attention import (
    make_triplane_processor,
    sample_plane,
    scatter_mean_plane,
)


def _cam(eye, H=32, W=32, f=40.0):
    return make_camera(look_at(np.array(eye), np.zeros(3)), f, f, W / 2, H / 2, W, H)


class TestGeometry:
    def test_unproject_project_roundtrip(self):
        cam = _cam([0.0, -4.0, 1.0])
        depth = jnp.full((32, 32), 4.0)
        pts = depth_to_world_points(depth, cam)
        xy, z = project_points(pts, cam)
        # reprojecting into the SAME camera recovers pixel centers and depth
        xs = jnp.arange(32, dtype=jnp.float32)
        px, py = jnp.meshgrid(xs, xs)
        np.testing.assert_allclose(np.asarray(xy[..., 0]), np.asarray(px), atol=1e-3)
        np.testing.assert_allclose(np.asarray(xy[..., 1]), np.asarray(py), atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), 4.0, rtol=1e-5)

    def test_world_point_consistency_across_views(self):
        """A world point seen by two cameras projects consistently."""
        cam_a = _cam([0.0, -4.0, 0.0])
        cam_b = _cam([2.0, -3.5, 0.5])
        pt = jnp.asarray([[0.2, 0.1, -0.3]])
        xy_a, za = project_points(pt, cam_a)
        # unproject from a's pixel at depth za → same world point
        depth_map = jnp.full((32, 32), float(za[0]))
        pts = depth_to_world_points(depth_map, cam_a)
        xi = int(round(float(xy_a[0, 0])))
        yi = int(round(float(xy_a[0, 1])))
        rec = pts[yi, xi]
        assert float(jnp.linalg.norm(rec - pt[0])) < 0.1  # pixel-quantized

    def test_bilinear_sample(self):
        grid = jnp.arange(16.0).reshape(4, 4, 1)
        v = bilinear_sample(grid, jnp.asarray([[1.5, 1.5]]))
        np.testing.assert_allclose(v, [[(5 + 6 + 9 + 10) / 4]], atol=1e-5)
        # outside → 0
        v2 = bilinear_sample(grid, jnp.asarray([[-5.0, -5.0]]))
        np.testing.assert_allclose(v2, [[0.0]])


class TestTriplane:
    def test_scatter_sample_roundtrip_constant(self):
        feats = jnp.ones((100, 4))
        uv = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (100, 2)).astype(np.float32))
        plane = scatter_mean_plane(feats, uv, 8)
        # occupied cells hold the mean (1.0)
        occ = np.asarray(plane).sum(-1) > 0
        np.testing.assert_allclose(np.asarray(plane)[occ], 1.0, atol=1e-6)

    def test_processor_shapes_and_mix(self):
        V, S, Hh, D = 2, 64, 2, 8
        rng = np.random.default_rng(1)
        pts = jnp.asarray(rng.normal(size=(V, S, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(2 * V, Hh, S, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2 * V, Hh, S, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2 * V, Hh, S, D)).astype(np.float32))
        proc = make_triplane_processor(pts, mix=0.5, plane_res=8)
        out = proc(q, k, v, False)
        assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()
        # mix=1 → plain self attention
        from gaussctrl_exp_tpu.diffusion.attention import _sdpa

        proc1 = make_triplane_processor(pts, mix=1.0, plane_res=8)
        np.testing.assert_allclose(
            np.asarray(proc1(q, k, v, False)), np.asarray(_sdpa(q, k, v)), atol=1e-5
        )
        # wrong sequence length → passthrough
        q2 = q[:, :, : S // 2]
        np.testing.assert_allclose(
            np.asarray(proc(q2, k[:, :, : S // 2], v[:, :, : S // 2], False)),
            np.asarray(_sdpa(q2, k[:, :, : S // 2], v[:, :, : S // 2])),
            atol=1e-6,
        )


class TestEpipolar:
    def test_tables_self_view_identity(self):
        """View-to-itself correspondence: center tap hits the same token with
        weight ≈ 1 (perfect depth consistency)."""
        cam = _cam([0.0, -4.0, 0.0])
        depth = jnp.full((32, 32), 4.0)
        idx, w = build_correspondence_tables([depth], [cam], feat_hw=8)
        S = 64
        center = idx[0, 0, :, 4]  # center of the 3x3 pattern
        np.testing.assert_array_equal(np.asarray(center), np.arange(S))
        assert float(w[0, 0, :, 4].min()) > 0.9

    def test_epipolar_attention_shapes(self):
        rng = np.random.default_rng(2)
        Hh, S, D = 2, 64, 8
        q = jnp.asarray(rng.normal(size=(Hh, S, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(Hh, S, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(Hh, S, D)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, S, (S, 9)).astype(np.int32))
        w = jnp.ones((S, 9))
        out = epipolar_attention(q, k, v, idx, w)
        assert out.shape == (Hh, S, D) and np.isfinite(np.asarray(out)).all()

    def test_processor_runs_two_views(self):
        cams = [_cam([0.0, -4.0, 0.0]), _cam([1.0, -3.8, 0.3])]
        depths = [jnp.full((32, 32), 4.0)] * 2
        idx, w = build_correspondence_tables(depths, cams, feat_hw=8)
        proc = make_epipolar_processor(idx, w, mix=0.5)
        rng = np.random.default_rng(3)
        B, Hh, S, D = 4, 2, 64, 8  # 2 CFG groups × 2 views
        q = jnp.asarray(rng.normal(size=(B, Hh, S, D)).astype(np.float32))
        out = proc(q, q, q, False)
        assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()
