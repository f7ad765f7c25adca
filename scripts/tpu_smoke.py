"""TPU smoke + timing: render a bear-scale scene with the Pallas kernels.

Run on the real chip (default JAX_PLATFORMS=axon):
    python scripts/tpu_smoke.py [n_gaussians] [size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.ops import RenderConfig, render
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
IMPL = sys.argv[3] if len(sys.argv) > 3 else "pallas"

print(f"devices: {jax.devices()}  N={N} size={S} impl={IMPL}")
rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.8)
scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.5 - 4.2))
quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
opacs = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))

cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
    fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
)
cfg = RenderConfig(impl=IMPL, isect_capacity=1 << 20, max_per_tile=1024)
bg = jnp.zeros(3)
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))


@jax.jit
def fwd(means, colors, opacs):
    out = render(means, scales, quats, colors, opacs, cam, bg, cfg)
    return out.rgb, out.alpha, out.depth, out.bins.n_isects


@jax.jit
def fwd_bwd(means, colors, opacs):
    def loss_fn(m, c, o):
        out = render(m, scales, quats, c, o, cam, bg, cfg)
        loss, _ = splatfacto_loss(out.rgb, target)
        return loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(means, colors, opacs)
    return loss, grads


t0 = time.time()
rgb, alpha, depth, n_isects = jax.block_until_ready(fwd(means, colors, opacs))
print(f"fwd compile+run: {time.time()-t0:.1f}s  n_isects={int(n_isects)}  "
      f"rgb[{float(rgb.min()):.3f},{float(rgb.max()):.3f}] alpha_mean={float(alpha.mean()):.3f}")
assert np.isfinite(np.asarray(rgb)).all()

iters = 10
t0 = time.time()
for _ in range(iters):
    out = fwd(means, colors, opacs)
jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print(f"fwd: {dt*1e3:.2f} ms/frame  ({S*S/dt/1e6:.1f} Mpix/s)")

t0 = time.time()
loss, grads = jax.block_until_ready(fwd_bwd(means, colors, opacs))
print(f"fwd+bwd compile+run: {time.time()-t0:.1f}s loss={float(loss):.4f}")
for g, nm in zip(grads, ["means", "colors", "opacs"]):
    assert np.isfinite(np.asarray(g)).all(), nm

t0 = time.time()
for _ in range(iters):
    out = fwd_bwd(means, colors, opacs)
jax.block_until_ready(out)
dt = (time.time() - t0) / iters
print(f"fwd+bwd: {dt*1e3:.2f} ms/frame  ({S*S/dt/1e6:.1f} Mpix/s)")
