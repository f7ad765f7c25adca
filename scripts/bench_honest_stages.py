"""Stage attribution for the honest train-step bench (bench.py headline).

Slope-times three cumulative stages at bear scale:
  s0: pre-blend FORWARD only (transforms + SH colors + projection + binning)
  s1: fwd+bwd of everything EXCEPT the blend (rasterize replaced by a cheap
      surrogate consuming xys/conics/colors/opacs) — isolates projection/SH/
      transform backward cost
  s2: the full honest train grads (= bench.py's timed body)
blend fwd+bwd (kernels + slot-grad reduction) ≈ s2 − s1.

Usage: python scripts/bench_honest_stages.py [fast]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as BM
from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.models.gaussians import GaussianParams, GaussianState
from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, model_colors, render_model
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.projection import BLOCK, project_gaussians
from gaussctrl_exp_tpu.ops.renderer import RenderConfig
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = BM.S
gs = BM.load_scene()
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
    fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
)
tx = ty = (S + BLOCK - 1) // BLOCK
rng = np.random.default_rng(1)
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))
CAP, ACAP, n_isects = BM._pick_capacity(gs, cam)
cfg = SplatModelConfig(
    sh_degree=BM.SH_DEGREE, background_color="white",
    render=RenderConfig(impl="pallas", isect_capacity=CAP, aligned_capacity=ACAP),
)
step = jnp.int32(30 * cfg.sh_degree_interval)
print(f"CAP={CAP} n_isects={n_isects}")


def slope(body_fn, k_hi=50):
    walls = {}
    for K in (5, k_hi):

        @jax.jit
        def run(p0: GaussianParams):
            def body(i, carry):
                p = p0._replace(means=p0.means + carry[:1, :1] * 1e-30)
                return carry + body_fn(p)

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(gs.params))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(gs.params))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[k_hi] - walls[5]) / (k_hi - 5) * 1e3


def s0_pre_fwd(params):
    vm, pm, fm = camera_matrices(cam)
    colors = model_colors(params, cam, step, cfg)
    p = project_gaussians(
        params.means, jnp.exp(params.scales), 1.0, params.quats, vm, fm,
        cam.fx, cam.fy, cam.cx, cam.cy, S, S,
        opacities=jax.nn.sigmoid(params.opacities[:, 0]),
    )
    b = bin_gaussians(p, tx, ty, CAP, ACAP)
    out = jnp.sum(
        (b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4]
         + b.chunk_base[:4] + b.cum[:4] + b.order[:4]).astype(jnp.float32)
    ) * 1e-6 + jnp.sum(colors[:2]) * 1e-9
    return jnp.full((2, 2), out)


def s1_nonblend_grads(params):
    def loss_fn(params, xys_offset):
        vm, pm, fm = camera_matrices(cam)
        colors = model_colors(params, cam, step, cfg)
        p = project_gaussians(
            params.means, jnp.exp(params.scales), 1.0, params.quats, vm, fm,
            cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=jax.nn.sigmoid(params.opacities[:, 0]),
        )
        b = bin_gaussians(p, tx, ty, CAP, ACAP)
        xys = p.xys + xys_offset
        # surrogate for the blend: consumes the same tensors with grads
        fake = (
            jnp.sum(xys * 1e-6) + jnp.sum(p.conics * 1e-6) + jnp.sum(colors * 1e-6)
            + jnp.sum(jax.nn.sigmoid(params.opacities)) * 1e-6
            + jnp.sum(b.aligned_gid[:4].astype(jnp.float32)) * 1e-9
        )
        img = jnp.broadcast_to(fake * 1e-3, (S, S, 3)) + target * 0.5
        loss, _ = splatfacto_loss(img, target)
        return loss

    xys_offset = jnp.zeros((params.capacity, 2))
    _, (pg, xg) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, xys_offset)
    acc = jnp.zeros((2, 2)) + jnp.sum(xg) + sum(jnp.sum(leaf) for leaf in pg)
    return acc * 1e-6


def s2_full_grads(params):
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
    return acc * 1e-6


if __name__ == "__main__":
    a = slope(s0_pre_fwd)
    print(f"s0 pre-blend fwd only:          {a:7.2f} ms", flush=True)
    b_ = slope(s1_nonblend_grads)
    print(f"s1 non-blend fwd+bwd:           {b_:7.2f} ms", flush=True)
    c = slope(s2_full_grads)
    print(f"s2 full honest step:            {c:7.2f} ms", flush=True)
    print(f"   blend fwd+bwd (s2-s1):       {c - b_:7.2f} ms")
    print(f"   non-blend backward (s1-s0):  {b_ - a:7.2f} ms")
