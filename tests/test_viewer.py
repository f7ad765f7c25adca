"""Live viewer: renders a CHANGING scene during training, /status reports
step/loss, /reset restores unedited images (the reference's in-train viewer +
reset control, gc_trainer.py:96-144)."""

import json
import urllib.request

import numpy as np
import pytest

from gaussctrl_exp_tpu.models.gaussians import init_random
from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig
from gaussctrl_exp_tpu.ops.renderer import RenderConfig


def _get(port, path):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=30) as r:
        return r.read()


def _post(port, path):
    req = urllib.request.Request(f"http://localhost:{port}{path}", method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read()


@pytest.mark.slow
def test_live_viewer_attach():
    from tests.test_train import FakeDataManager, _make_target_scene
    from gaussctrl_exp_tpu.cli.viewer import attach_live_viewer
    from gaussctrl_exp_tpu.engine.trainer import TrainConfig, Trainer
    from gaussctrl_exp_tpu.models.densify import DensifyConfig

    cams, images = _make_target_scene()
    dm = FakeDataManager(cams, images)
    dm.unedited = [im.copy() for im in images]
    resets = []

    def reset_images():
        resets.append(1)
        for i, im in enumerate(dm.unedited):
            dm.images[i] = im.copy()

    dm.reset_images = reset_images
    # simulate an edit write-back so reset has something to restore
    dm.images[0] = np.zeros_like(dm.images[0])

    gs = init_random(40, capacity=64, sh_degree=0, seed=5)
    cfg = TrainConfig(
        model=SplatModelConfig(
            sh_degree=0, background_color="white",
            render=RenderConfig(impl="jnp", isect_capacity=1 << 12, max_per_tile=128),
        ),
        densify=DensifyConfig(warmup_length=10_000),
    )
    trainer = Trainer(gs, dm, cfg)
    httpd = attach_live_viewer(trainer, dm, cfg.model, port=0, size=48)
    port = httpd.server_address[1]
    try:
        st = json.loads(_get(port, "/status"))
        assert st["live"] is True and st["step"] == 0

        img_before = _get(port, "/render?az=0&el=0.3&r=3.5")
        trainer.train(3, log_every=1)
        st = json.loads(_get(port, "/status"))
        assert st["step"] == 3 and st["loss"] is not None
        img_after = _get(port, "/render?az=0&el=0.3&r=3.5")
        assert img_before != img_after, "render did not change as the scene trained"

        # reset-to-unedited restores the pre-edit image batch
        _post(port, "/reset")
        assert resets == [1]
        np.testing.assert_allclose(dm.images[0], dm.unedited[0])

        # page + depth render still served
        assert b"Reset to unedited" in _get(port, "/")
        assert _get(port, "/render?az=0&el=0.3&r=3.5&depth=1")
    finally:
        httpd.shutdown()
