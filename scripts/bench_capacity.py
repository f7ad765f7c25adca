"""Capacity sweep: n_isects on the bench scene + slope-timed fwd+bwd per CAP.

The static intersection capacity is a jit cache key chosen by
``estimate_capacity``; this script verifies what the bear bench scene actually
needs and what each power-of-two capacity costs end-to-end.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = bench.S
means, scales, quats, chan, opacs = bench.load_scene()
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
    fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
)
vm, pm, fm = camera_matrices(cam)
tx = ty = (S + 15) // 16
rng = np.random.default_rng(1)
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))

p = jax.jit(
    lambda m: project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
)(means)
total = int(jax.device_get(jnp.sum(p.num_tiles_hit)))
print(f"bench scene: N={means.shape[0]} n_isects={total} (1<<17={1<<17}, 1<<18={1<<18})")


def slope(fn, K_LO=5, K_HI=50):
    walls = {}
    for K in (K_LO, K_HI):
        @jax.jit
        def run(m0):
            def body(i, acc):
                return acc + fn(m0 + acc[:1, :1] * 1e-30) * 1e-6
            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))
        jax.device_get(run(means))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


for CAP in (1 << 17, 1 << 18):
    def loss_fn(m, CAP=CAP):
        pr = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
        b = bin_gaussians(pr, tx, ty, CAP)
        out = rasterize_tiles_pallas(pr.xys, pr.conics, chan, opacs, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    def fwd_only(m, CAP=CAP):
        pr = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
        b = bin_gaussians(pr, tx, ty, CAP)
        out = rasterize_tiles_pallas(pr.xys, pr.conics, chan, opacs, b, S, S)
        return out.img[:2, :2, 0] + out.final_T[:2, :2]

    def bins_only(m, CAP=CAP):
        pr = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
        b = bin_gaussians(pr, tx, ty, CAP)
        return (
            b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4] + b.chunk_base[:4]
            + b.chunk_cnt[:4] + b.cum[:4] + b.nt_sorted[:4] + b.order[:4]
            + b.tile_start[:4] + b.tile_cnt[:4]
        ).astype(jnp.float32).reshape(2, 2)

    t_b = slope(bins_only)
    t_f = slope(fwd_only)
    t_fb = slope(lambda m, CAP=CAP: jax.grad(lambda mm: loss_fn(mm, CAP))(m)[:2, :2])
    print(f"CAP={CAP:>7}: binning {t_b:6.2f}  +fwd {t_f:6.2f}  fwd+bwd {t_fb:6.2f} ms")
