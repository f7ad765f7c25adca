"""Multi-device sharded render/train on the virtual 8-device CPU mesh:
sharded loss equals the single-device loss; a sharded train step runs and
reduces the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.models.gaussians import init_random
from gaussctrl_exp_tpu.parallel.sharded import (
    ShardedRenderConfig,
    make_mesh,
    make_sharded_render_loss,
    make_sharded_train_step,
    shard_params,
)


def _scene_and_cams(B=2, H=64, W=64, n=96, cap=128):
    gs = init_random(n, capacity=cap, sh_degree=1, seed=3)
    cams = []
    for i in range(B):
        ang = 0.4 * i
        eye = np.array([4.0 * np.sin(ang), -4.0 * np.cos(ang), 1.0])
        cams.append(make_camera(look_at(eye, np.zeros(3)), 80.0, 80.0, W / 2, H / 2, W, H))
    cam_arrays = (
        jnp.stack([c.c2w for c in cams]),
        jnp.stack([c.fx for c in cams]),
        jnp.stack([c.fy for c in cams]),
        jnp.stack([c.cx for c in cams]),
        jnp.stack([c.cy for c in cams]),
    )
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    return gs, cam_arrays, gt


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(data=2, model=4)


def test_sharded_loss_matches_single_device(mesh):
    gs, cam_arrays, gt = _scene_and_cams()
    cfg = ShardedRenderConfig(height=64, width=64, isect_capacity_per_device=1 << 12, sh_degree=1)
    loss_fn = jax.jit(make_sharded_render_loss(mesh, cfg))
    params_s, alive_s = shard_params(gs.params, gs.alive, mesh)
    loss_sharded = float(loss_fn(params_s, alive_s, cam_arrays, gt, jnp.int32(0)))

    # single-device reference: same math on one device via a 1x1 mesh
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    cfg1 = ShardedRenderConfig(height=64, width=64, isect_capacity_per_device=1 << 13, sh_degree=1)
    loss_fn1 = jax.jit(make_sharded_render_loss(mesh1, cfg1))
    losses = []
    for b in range(2):
        one_cam = tuple(a[b : b + 1] for a in cam_arrays)
        p1, a1 = shard_params(gs.params, gs.alive, mesh1)
        losses.append(float(loss_fn1(p1, a1, one_cam, gt[b : b + 1], jnp.int32(0))))
    np.testing.assert_allclose(loss_sharded, np.mean(losses), rtol=2e-4)


def test_sharded_grads_match_single_device(mesh):
    gs, cam_arrays, gt = _scene_and_cams()
    cfg = ShardedRenderConfig(height=64, width=64, isect_capacity_per_device=1 << 12, sh_degree=1)
    loss_fn = make_sharded_render_loss(mesh, cfg)
    params_s, alive_s = shard_params(gs.params, gs.alive, mesh)
    grads = jax.jit(jax.grad(lambda p: loss_fn(p, alive_s, cam_arrays, gt, jnp.int32(0))))(
        params_s
    )
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(flat))
    assert sum(flat) > 0.0, "gradients are all zero"


def test_sharded_train_step_reduces_loss(mesh):
    gs, cam_arrays, gt = _scene_and_cams()
    cfg = ShardedRenderConfig(height=64, width=64, isect_capacity_per_device=1 << 12, sh_degree=1)
    # render the scene itself as gt so the loss is reducible
    loss_fn = make_sharded_render_loss(mesh, cfg)
    opt = optax.adam(5e-3)
    params_s, alive_s = shard_params(gs.params, gs.alive, mesh)
    opt_state = opt.init(params_s)
    step_fn = make_sharded_train_step(mesh, cfg, opt)
    losses = []
    p = params_s
    for i in range(8):
        p, opt_state, loss = step_fn(p, alive_s, opt_state, cam_arrays, gt, jnp.int32(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"no progress: {losses}"
    # params remain sharded over model axis
    shard0 = p.means.sharding
    assert "model" in str(shard0.spec) or shard0.is_fully_replicated is False
