"""Auxiliary subsystems: writers, LPIPS architecture, colormaps, cliconf."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.engine.writer import EventWriter, Profiler
from gaussctrl_exp_tpu.ops.lpips import LPIPS, convert_torch_lpips, lpips_random
from gaussctrl_exp_tpu.utils.colormaps import apply_depth_colormap, apply_turbo


def test_event_writer_jsonl(tmp_path):
    w = EventWriter(tmp_path, quiet=True)
    w.put_scalars(1, {"loss": 0.5})
    w.put_scalars(2, {"loss": 0.25, "ssim": 0.9})
    w.put_image(2, "eval", np.zeros((8, 8, 3)))
    w.close()
    lines = [json.loads(l) for l in (tmp_path / "events.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 0.5 and lines[1]["ssim"] == 0.9
    assert (tmp_path / "eval_000002.png").exists()


@pytest.mark.slow
def test_lpips_properties():
    model, params = lpips_random()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    d_same = model.apply({"params": params}, a, a)
    d_diff = model.apply({"params": params}, a, b)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    # random lins can be negative-weighted; just require a nonzero response
    assert np.all(np.abs(np.asarray(d_diff)) > 1e-8)


def test_lpips_torch_conversion_structure():
    # synthetic torchvision-style vgg features + lpips lins
    vgg_sd = {}
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256), (256, 256),
             (256, 512), (512, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    layer_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for lid, (ci, co) in zip(layer_ids, chans):
        vgg_sd[f"features.{lid}.weight"] = np.zeros((co, ci, 3, 3), np.float32)
        vgg_sd[f"features.{lid}.bias"] = np.zeros((co,), np.float32)
    lin_sd = {f"lin{i}.model.1.weight": np.ones((1, c, 1, 1), np.float32)
              for i, c in enumerate([64, 128, 256, 512, 512])}
    params = convert_torch_lpips(vgg_sd, lin_sd)
    model = LPIPS()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))["params"]
    # same structure and shapes as a fresh init
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_new = jax.tree_util.tree_leaves_with_path(params)
    paths_ref = {jax.tree_util.keystr(p): l.shape for p, l in flat_ref}
    paths_new = {jax.tree_util.keystr(p): l.shape for p, l in flat_new}
    assert paths_ref == paths_new


def test_colormaps():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    img = apply_turbo(x)
    assert img.shape == (8, 8, 3) and img.min() >= 0 and img.max() <= 1
    depth = np.full((8, 8), 1000.0)
    depth[2:6, 2:6] = np.linspace(1, 5, 16).reshape(4, 4)
    d = apply_depth_colormap(depth)
    assert d.shape == (8, 8, 3)


def test_cliconf_roundtrip():
    from gaussctrl_exp_tpu.configs import GaussCtrlConfig
    from gaussctrl_exp_tpu.utils.cliconf import parse_config

    cfg, _ = parse_config(
        GaussCtrlConfig,
        ["--max-num-iterations", "123", "--pipeline.guidance-scale", "7.5",
         "--train.model.render.isect-capacity", "4096", "--capacity", "999"],
    )
    assert cfg.max_num_iterations == 123
    assert cfg.pipeline.guidance_scale == 7.5
    assert cfg.train.model.render.isect_capacity == 4096
    assert cfg.capacity == 999


def test_profiler_noop(tmp_path):
    p = Profiler(tmp_path, enabled=False)
    p.start(); p.stop()  # no-ops without enabling
