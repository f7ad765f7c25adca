"""Capture a jax.profiler trace of the honest bench train step (bear, 512²).

Writes the xplane trace to /tmp/jaxprof; parse with
scripts/parse_profile.py to get per-HLO-op durations.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as BM
from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.models.gaussians import GaussianParams, GaussianState
from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, render_model
from gaussctrl_exp_tpu.ops.renderer import RenderConfig
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = BM.S
gs = BM.load_scene_high_n() if len(sys.argv) > 1 and sys.argv[1] == "garden" else BM.load_scene()
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
    fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
)
rng = np.random.default_rng(1)
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))
CAP, ACAP, n_isects = BM._pick_capacity(gs, cam)
cfg = SplatModelConfig(
    sh_degree=BM.SH_DEGREE, background_color="white",
    render=RenderConfig(impl="pallas", isect_capacity=CAP, aligned_capacity=ACAP),
)
step = jnp.int32(30_000)
print(f"CAP={CAP} n_isects={n_isects}")


@jax.jit
def train_grads(params: GaussianParams):
    def loss_fn(params, xys_offset):
        out = render_model(
            GaussianState(params, gs.alive), cam, step, cfg,
            training=True, background_override=jnp.ones(3), xys_offset=xys_offset,
        )
        loss, _ = splatfacto_loss(out.rgb, target)
        return loss

    xys_offset = jnp.zeros((params.capacity, 2))
    _, (pg, xg) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, xys_offset)
    acc = jnp.zeros((2, 2)) + jnp.sum(xg) + sum(jnp.sum(leaf) for leaf in pg)
    return acc


jax.block_until_ready(train_grads(gs.params))  # compile
with jax.profiler.trace("/tmp/jaxprof"):
    for _ in range(10):
        jax.block_until_ready(train_grads(gs.params))
print("trace written to /tmp/jaxprof")
