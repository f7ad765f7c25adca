"""Depth-conditioned multi-view generator (the working rebuild of the
reference's broken mv_generator/mv_model stack, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.diffusion.correspondence import (
    build_correspondence_tables,
    make_multires_epipolar_processor,
    overlap_ratio,
)
from gaussctrl_exp_tpu.diffusion.mv_generator import (
    MVGeneratorConfig,
    init_depth_generator,
    inverse_depth_latent,
)


def _cam(eye, H=32, W=32, f=40.0):
    return make_camera(look_at(np.array(eye), np.zeros(3)), f, f, W / 2, H / 2, W, H)


def _tiny_gen(latent=8, steps=2):
    cfg = MVGeneratorConfig(latent_size=latent, num_steps=steps, guidance_scale=3.0)
    return init_depth_generator(
        jax.random.PRNGKey(0), latent=latent, block_out=(32, 64), heads=2,
        cross_dim=16, layers_per_block=1, cfg=cfg,
    )


class TestDepthLatent:
    def test_inverse_depth_latent_range_and_shape(self):
        d = np.linspace(1.0, 10.0, 32 * 32, dtype=np.float32).reshape(32, 32)
        lat = inverse_depth_latent(d, 8)
        assert lat.shape == (8, 8, 1)
        a = np.asarray(lat)
        assert a.max() <= 1.0 + 1e-6 and a.min() >= 0.0
        # near surfaces (small depth) → large inverse-depth value
        assert a[0, 0, 0] > a[-1, -1, 0]


class TestOverlapMask:
    def test_identical_views_fully_overlap(self):
        cams = [_cam([0.0, -4.0, 0.0])] * 2
        depths = [jnp.full((32, 32), 4.0)] * 2
        _, w = build_correspondence_tables(depths, cams, feat_hw=8)
        r = overlap_ratio(w)
        assert float(r[0, 1]) > 0.9 and float(r[1, 0]) > 0.9

    def test_depth_inconsistent_views_masked(self):
        # view b's own depth disagrees with the reprojected depth of view a's
        # points → every tap fails the consistency test → no overlap
        cams = [_cam([0.0, -4.0, 0.0]), _cam([0.5, -3.9, 0.2])]
        depths = [jnp.full((32, 32), 4.0), jnp.full((32, 32), 1.0)]
        _, w = build_correspondence_tables(depths, cams, feat_hw=8)
        r = overlap_ratio(w)
        assert float(r[0, 1]) < 0.2

    def test_multires_processor_masked_pair_falls_back_to_self(self):
        from gaussctrl_exp_tpu.diffusion.attention import _sdpa

        cams = [_cam([0.0, -4.0, 0.0]), _cam([1.0, -3.8, 0.3])]
        depths = [jnp.full((32, 32), 4.0)] * 2
        idx, w = build_correspondence_tables(depths, cams, feat_hw=8)
        tables = {64: (idx, w)}
        # all pairs masked out → pure self-attention regardless of mix
        proc = make_multires_epipolar_processor(tables, mix=0.3, pair_mask=jnp.zeros((2, 2)))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(4, 2, 64, 8)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(proc(q, q, q, False)), np.asarray(_sdpa(q, q, q)), atol=1e-5
        )

    def test_multires_processor_multiple_resolutions(self):
        cams = [_cam([0.0, -4.0, 0.0]), _cam([1.0, -3.8, 0.3])]
        depths = [jnp.full((32, 32), 4.0)] * 2
        tables = {}
        for s in (8, 4):
            idx, w = build_correspondence_tables(depths, cams, feat_hw=s)
            tables[s * s] = (idx, w)
        proc = make_multires_epipolar_processor(tables, mix=0.5)
        rng = np.random.default_rng(1)
        for S in (64, 16):
            q = jnp.asarray(rng.normal(size=(4, 2, S, 8)).astype(np.float32))
            out = proc(q, q, q, False)
            assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()


class TestDepthGenerator:
    def test_sample_shapes_finite_and_consistent(self):
        gen = _tiny_gen()
        V = 2
        cams = [_cam([0.0, -4.0, 0.0]), _cam([0.5, -3.9, 0.2])]
        depths = [np.full((32, 32), 4.0, np.float32)] * V
        ctx_c = jnp.asarray(np.random.default_rng(0).normal(size=(V, 77, 16)).astype(np.float32))
        ctx_u = jnp.zeros((V, 77, 16))
        lat = gen.sample(jax.random.PRNGKey(1), ctx_c, ctx_u, depths, cams)
        assert lat.shape == (V, 8, 8, 4)
        assert np.isfinite(np.asarray(lat)).all()

    def test_attention_resolutions(self):
        gen = _tiny_gen(latent=8)
        assert gen.attention_resolutions() == [8, 4]

    @pytest.mark.slow
    def test_train_step_reduces_loss(self):
        gen = _tiny_gen()
        opt = optax.adam(1e-3)
        step = gen.make_train_step(opt)
        params = gen.unet_params
        opt_state = opt.init(params)
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32)) * 0.1
        dl = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(2, 77, 16)).astype(np.float32))
        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(8):
            # fixed key → same (t, noise) draw; loss must strictly improve
            params, opt_state, loss = step(params, opt_state, key, x0, dl, ctx)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
