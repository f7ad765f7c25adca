"""Latent-blending inpainting (the capability of the reference's inpaint
experiments, my_inpaint_test.py / my_multi_edit.py, SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.diffusion.inpaint import (
    InpaintConfig,
    SDInpaintPipeline,
    mask_to_latent,
)
from gaussctrl_exp_tpu.diffusion.sd_pipeline import SDControlNetPipeline, init_random_models

TINY = dict(block_out=(32, 64), vae_block_out=(32, 32, 32, 32), heads=2, cross_dim=32,
            layers_per_block=1)


@pytest.fixture(scope="module")
def tiny_pipe():
    models = init_random_models(jax.random.PRNGKey(0), latent=8, **TINY)
    return SDControlNetPipeline(models)


class TestMaskToLatent:
    def test_shape_and_values(self):
        m = np.zeros((64, 64), np.float32)
        m[16:48, 16:48] = 1.0
        lat = mask_to_latent(m, 8)
        assert lat.shape == (8, 8, 1)
        a = np.asarray(lat)
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert a[4, 4, 0] > 0.9 and a[0, 0, 0] < 0.1

    def test_blur_softens_edges(self):
        m = np.zeros((64, 64), np.float32)
        m[:, 32:] = 1.0
        hard = np.asarray(mask_to_latent(m, 8, blur=0))
        soft = np.asarray(mask_to_latent(m, 8, blur=2))
        # blur spreads mass across the edge but stays in [0,1]
        assert soft.min() >= 0.0 and soft.max() <= 1.0
        assert np.abs(soft - hard).max() > 0.01


class TestInpaintLatents:
    def test_keep_region_preserved_exactly(self, tiny_pipe):
        cfg = InpaintConfig(num_steps=3, guidance_scale=2.0)
        ip = SDInpaintPipeline(tiny_pipe, cfg)
        rng = np.random.default_rng(0)
        orig = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        mask = jnp.zeros((8, 8, 1)).at[2:6, 2:6].set(1.0)
        ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
        out = ip.inpaint_latents(jax.random.PRNGKey(1), orig, mask, ctx, jnp.zeros_like(ctx))
        assert out.shape == orig.shape and np.isfinite(np.asarray(out)).all()
        keep = np.asarray(1.0 - mask)[None] > 0.5
        np.testing.assert_allclose(
            np.asarray(out)[np.broadcast_to(keep, out.shape)],
            np.asarray(orig)[np.broadcast_to(keep, orig.shape)],
            atol=1e-5,
        )
        # the edit region was actually regenerated (differs from the original)
        edit = ~keep
        diff = np.abs(np.asarray(out) - np.asarray(orig))[np.broadcast_to(edit, out.shape)]
        assert diff.mean() > 1e-3

    def test_controlnet_hint_path(self, tiny_pipe):
        cfg = InpaintConfig(num_steps=2, guidance_scale=1.5)
        ip = SDInpaintPipeline(tiny_pipe, cfg)
        rng = np.random.default_rng(1)
        orig = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        mask = jnp.ones((8, 8, 1))
        ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
        hint = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        out = ip.inpaint_latents(
            jax.random.PRNGKey(2), orig, mask, ctx, jnp.zeros_like(ctx), hint=hint
        )
        assert out.shape == orig.shape and np.isfinite(np.asarray(out)).all()


class TestInpaintImages:
    def test_pixel_composite_outside_mask(self, tiny_pipe):
        ip = SDInpaintPipeline(tiny_pipe, InpaintConfig(num_steps=2, guidance_scale=1.5))
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        mask = np.zeros((64, 64), np.float32)
        mask[16:48, 16:48] = 1.0
        ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
        out = ip.inpaint_images(jax.random.PRNGKey(3), img, mask, ctx, jnp.zeros_like(ctx))
        assert out.shape == img.shape and np.isfinite(np.asarray(out)).all()
        outside = mask < 0.5
        np.testing.assert_allclose(
            np.asarray(out)[0][outside], np.asarray(img)[0][outside], atol=1e-6
        )
