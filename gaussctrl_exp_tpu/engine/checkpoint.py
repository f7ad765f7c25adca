"""Checkpointing: orbax save/load of the training state + splatfacto import.

Replicates the reference's checkpoint behaviors
(/root/reference/gaussctrl/gc_trainer.py:146-174):
  * saves {step, model params, optimizer state} every ``steps_per_save``,
  * ``save_only_latest_checkpoint`` pruning,
  * loads a *splatfacto* torch checkpoint (``step-000029999.ckpt``) to start
    editing (the ``--load-checkpoint`` flow, scripts/bear.sh:3); diffusion
    weights are never serialized (the reference filters ``ip2p.`` keys).

The splatfacto importer maps nerfstudio's ``_model.gauss_params.{means,scales,
quats,features_dc,features_rest,opacities}`` tensors into our fixed-capacity
GaussianState.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianParams, GaussianState


def save_checkpoint(path: str | Path, state, step: int, keep_only_latest: bool = True) -> Path:
    """Save a TrainState (or any pytree) with orbax; returns the ckpt dir."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckpt_dir = path / f"step-{step:09d}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, jax.device_get(state), force=True)
    if keep_only_latest:
        for d in path.iterdir():
            if d.is_dir() and d.name.startswith("step-") and d != ckpt_dir:
                import shutil

                shutil.rmtree(d)
    return ckpt_dir


def load_checkpoint(path: str | Path, example_state):
    """Restore the latest (or exact) checkpoint into example_state's structure."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.is_dir() and not path.name.startswith("step-"):
        steps = sorted(d for d in path.iterdir() if d.name.startswith("step-"))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = steps[-1]
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(example_state))
    return jax.tree.map(jnp.asarray, restored), int(path.name.split("-")[-1])


def import_splatfacto_checkpoint(
    ckpt_path: str | Path,
    capacity: Optional[int] = None,
) -> tuple[GaussianState, int]:
    """Load a nerfstudio splatfacto torch checkpoint into a GaussianState.

    Accepts the dict layout the reference trains from
    (gc_trainer.py:156-168): {"step", "pipeline": state_dict with
    ``_model.gauss_params.*`` keys} — also tolerates the bare state_dict.
    """
    import torch

    raw = torch.load(str(ckpt_path), map_location="cpu", weights_only=False)
    step = int(raw.get("step", 0)) if isinstance(raw, dict) else 0
    sd = raw.get("pipeline", raw) if isinstance(raw, dict) else raw

    def find(name):
        for prefix in ("_model.gauss_params.", "model.gauss_params.", "gauss_params.", ""):
            key = prefix + name
            if key in sd:
                return np.asarray(sd[key].detach().cpu().numpy(), np.float32)
        raise KeyError(f"cannot find {name} in checkpoint (keys: {list(sd)[:8]}…)")

    means = find("means")
    n = means.shape[0]
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < checkpoint gaussians {n}")

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((cap - n,) + x.shape[1:], fill, np.float32)], axis=0
        )

    params = GaussianParams(
        means=jnp.asarray(pad(means)),
        scales=jnp.asarray(pad(find("scales"), -10.0)),
        quats=jnp.asarray(pad(find("quats"))),
        features_dc=jnp.asarray(pad(find("features_dc"))),
        features_rest=jnp.asarray(pad(find("features_rest"))),
        opacities=jnp.asarray(pad(find("opacities").reshape(n, 1), -10.0)),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    return GaussianState(params=params, alive=alive), step


def export_splatfacto_checkpoint(state: GaussianState, path: str | Path, step: int = 0) -> None:
    """Write our GaussianState as a splatfacto-compatible torch checkpoint
    (compacted to alive gaussians) so reference tooling can consume it."""
    import torch

    alive = np.asarray(jax.device_get(state.alive))
    idx = np.nonzero(alive)[0]

    def take(x):
        return torch.from_numpy(np.asarray(jax.device_get(x))[idx])

    sd = {
        "_model.gauss_params.means": take(state.params.means),
        "_model.gauss_params.scales": take(state.params.scales),
        "_model.gauss_params.quats": take(state.params.quats),
        "_model.gauss_params.features_dc": take(state.params.features_dc),
        "_model.gauss_params.features_rest": take(state.params.features_rest),
        "_model.gauss_params.opacities": take(state.params.opacities),
    }
    torch.save({"step": step, "pipeline": sd}, str(path))
