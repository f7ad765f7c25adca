"""Split the honest bench's non-blend backward: SSIM loss vs projection bwd.

Slope-times:
  t0: splatfacto_loss fwd+bwd alone at 512² (banded-matmul SSIM)
  t1: splatfacto_loss fwd+bwd with the shift-add separable filter (candidate)
  t2: projection+transforms+SH fwd+bwd alone (no binning, no loss)
Usage: python scripts/bench_nonblend_micro.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as BM
from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, model_colors
from gaussctrl_exp_tpu.ops.projection import project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = 512
gs = BM.load_scene()
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
    fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
)
cfg = SplatModelConfig(sh_degree=3)
step = jnp.int32(30_000)
rng = np.random.default_rng(1)
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))
img0 = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))


def slope(body_fn, k_hi=50):
    walls = {}
    for K in (5, k_hi):

        @jax.jit
        def run(x0):
            def body(i, carry):
                return carry + body_fn(x0, carry[:1, :1] * 1e-30)

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(img0))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(img0))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[k_hi] - walls[5]) / (k_hi - 5) * 1e3


def t0_loss(img, eps):
    g = jax.grad(lambda im: splatfacto_loss(im, target)[0])(img + eps)
    return g[:2, :2, 0]


def _shift_filter(stack, size=11, sigma=1.5):
    """(C, H, W) valid separable gaussian via shifted adds (VPU, no matmul)."""
    from gaussctrl_exp_tpu.ops.ssim import _gaussian_kernel_1d

    k = _gaussian_kernel_1d(size, sigma)
    C, H, W = stack.shape
    out = sum(float(k[t]) * stack[:, :, t : W - size + 1 + t] for t in range(size))
    out2 = sum(float(k[t]) * out[:, t : H - size + 1 + t, :] for t in range(size))
    return out2


def _ssim_shift(a, b):
    c1, c2 = 0.01**2, 0.03**2
    at = jnp.transpose(a, (2, 0, 1))
    bt = jnp.transpose(b, (2, 0, 1))
    stats = jnp.concatenate([at, bt, at * at, bt * bt, at * bt], axis=0)
    f = _shift_filter(stats)
    C = a.shape[-1]
    mu_a, mu_b, mu_aa, mu_bb, mu_ab = (f[i * C : (i + 1) * C] for i in range(5))
    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def t1_loss_shift(img, eps):
    def loss(im):
        l1v = jnp.mean(jnp.abs(im - target))
        return 0.8 * l1v + 0.2 * (1.0 - _ssim_shift(im, target))

    return jax.grad(loss)(img + eps)[:2, :2, 0]


def t2_proj(img, eps):
    def f(params):
        vm, pm, fm = camera_matrices(cam)
        colors = model_colors(params, cam, step, cfg)
        p = project_gaussians(
            params.means, jnp.exp(params.scales), 1.0, params.quats, vm, fm,
            cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=jax.nn.sigmoid(params.opacities[:, 0]),
        )
        return (
            jnp.sum(p.xys * 1e-6) + jnp.sum(p.conics * 1e-6)
            + jnp.sum(colors * 1e-6) + jnp.sum(p.depths) * 1e-9
        )

    p = gs.params._replace(means=gs.params.means + eps[:1, :1] * 0)
    g = jax.grad(f)(p)
    acc = jnp.zeros((2, 2))
    for leaf in g:
        acc = acc + leaf.reshape(-1)[:4].reshape(2, 2)
    return acc


if __name__ == "__main__":
    print(f"t0 splatfacto_loss fwd+bwd (banded matmul): {slope(t0_loss):7.2f} ms", flush=True)
    print(f"t1 splatfacto_loss fwd+bwd (shift-add):     {slope(t1_loss_shift):7.2f} ms", flush=True)
    print(f"t2 proj+SH+transforms fwd+bwd:              {slope(t2_proj):7.2f} ms", flush=True)
