"""Checkpointing: orbax roundtrip, splatfacto torch import/export roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussctrl_exp_tpu.engine.checkpoint import (
    export_splatfacto_checkpoint,
    import_splatfacto_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from gaussctrl_exp_tpu.engine.trainer import TrainConfig, init_train_state
from gaussctrl_exp_tpu.models.gaussians import init_random


def test_orbax_roundtrip(tmp_path):
    gs = init_random(32, capacity=64, sh_degree=1, seed=0)
    state = init_train_state(gs, TrainConfig())
    d = save_checkpoint(tmp_path / "ckpts", state, step=100)
    assert d.name == "step-000000100"
    restored, step = load_checkpoint(tmp_path / "ckpts", state)
    assert step == 100
    np.testing.assert_allclose(np.asarray(restored.params.means), np.asarray(state.params.means))
    np.testing.assert_array_equal(np.asarray(restored.alive), np.asarray(state.alive))


def test_keep_only_latest(tmp_path):
    gs = init_random(8, capacity=16, sh_degree=1, seed=0)
    state = init_train_state(gs, TrainConfig())
    save_checkpoint(tmp_path / "c", state, step=1)
    save_checkpoint(tmp_path / "c", state, step=2)
    dirs = [d.name for d in (tmp_path / "c").iterdir()]
    assert dirs == ["step-000000002"]


def test_splatfacto_import_export_roundtrip(tmp_path):
    gs = init_random(40, capacity=40, sh_degree=3, seed=1)
    p = tmp_path / "step-000029999.ckpt"
    export_splatfacto_checkpoint(gs, p, step=29999)
    restored, step = import_splatfacto_checkpoint(p, capacity=64)
    assert step == 29999
    assert restored.params.capacity == 64
    assert int(jnp.sum(restored.alive)) == 40
    np.testing.assert_allclose(
        np.asarray(restored.params.means[:40]), np.asarray(gs.params.means[:40]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(restored.params.features_rest[:40]),
        np.asarray(gs.params.features_rest[:40]),
        rtol=1e-6,
    )
    # opacities keep their (n, 1) shape
    assert restored.params.opacities.shape == (64, 1)
