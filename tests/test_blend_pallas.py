"""Pallas blend kernel (interpret mode on CPU) vs the jnp oracle: forward
outputs and hand-written backward vs autodiff of the oracle."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.blend import rasterize_tiles_jnp
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import BLOCK, project_gaussians

from conftest import make_test_scene


def _setup(rng, n=200, H=64, W=64, f=80.0, n_chan=4):
    means, scales, quats, colors, opacs = make_test_scene(rng, n=n)
    c2w = look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3))
    cam = make_camera(c2w, fx=f, fy=f, cx=W / 2, cy=H / 2, width=W, height=H)
    vm, pm, fm = camera_matrices(cam)
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), 1.0, jnp.asarray(quats),
        vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, H, W,
    )
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK
    bins = bin_gaussians(proj, tiles_x, tiles_y, 1 << 12)
    chan = jnp.concatenate([jnp.asarray(colors), proj.depths[:, None]], -1)[:, :n_chan]
    # pallas path takes original-order arrays; jnp path takes depth-sorted
    args = (proj.xys, proj.conics, chan, jnp.asarray(opacs))
    order = bins.order
    args_sorted = (proj.xys[order], proj.conics[order], chan[order], jnp.asarray(opacs)[order])
    return args, args_sorted, bins, H, W


@pytest.mark.parametrize(
    "n", [pytest.param(40, marks=pytest.mark.slow), 300]
)
def test_forward_matches_jnp(rng, n):
    args, args_sorted, bins, H, W = _setup(rng, n=n)
    out_p = rasterize_tiles_pallas(*args, bins, H, W, interpret=True)
    out_j = rasterize_tiles_jnp(*args_sorted, bins, H, W, max_per_tile=512)
    np.testing.assert_allclose(np.asarray(out_p.img), np.asarray(out_j.img), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_T), np.asarray(out_j.final_T), atol=1e-5)


def test_forward_empty_scene(rng):
    args, _, bins, H, W = _setup(rng, n=8)
    # kill all gaussians via opacity 0 → alpha < 1/255 → skip everywhere
    args = (args[0], args[1], args[2], jnp.zeros_like(args[3]))
    out_p = rasterize_tiles_pallas(*args, bins, H, W, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p.img), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_p.final_T), 1.0, atol=1e-7)


def test_backward_matches_jnp_autodiff(rng):
    args, args_sorted, bins, H, W = _setup(rng, n=150)
    order = bins.order
    tgt_rng = np.random.default_rng(5)
    g_img = jnp.asarray(tgt_rng.normal(size=(H, W, 4)).astype(np.float32))
    g_T = jnp.asarray(tgt_rng.normal(size=(H, W)).astype(np.float32))

    def loss_pallas(xys, conics, chan, opacs):
        o = rasterize_tiles_pallas(xys, conics, chan, opacs, bins, H, W, interpret=True)
        return jnp.sum(o.img * g_img) + jnp.sum(o.final_T * g_T)

    def loss_jnp(xys, conics, chan, opacs):
        o = rasterize_tiles_jnp(
            xys[order], conics[order], chan[order], opacs[order], bins, H, W, max_per_tile=512
        )
        return jnp.sum(o.img * g_img) + jnp.sum(o.final_T * g_T)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    gj = jax.grad(loss_jnp, argnums=(0, 1, 2, 3))(*args)
    names = ["xys", "conics", "colors", "opacs"]
    for a, b, nm in zip(gp, gj, names):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=3e-3 * scale, rtol=2e-3, err_msg=nm)
