"""Scaling evidence on ONE chip: shard_map overhead + ICI byte/efficiency model.

No multi-chip hardware exists in this environment (one v5e via the axon
tunnel), so the BASELINE "≥0.8 efficiency at 2 hosts" axis is supported by:

  1. MEASURED: the sharded train-loss step on a 1×1 mesh (full shard_map +
     band machinery + degenerate collectives) vs the plain unsharded loss —
     the per-step fixed cost the sharding machinery adds.
  2. COUNTED: the exact collective bytes per step of parallel/sharded.py's
     design (payload all-gather over 'model', gradient reduce-scatter from
     shard_map autodiff), evaluated at bear/garden scale.
  3. MODELED: ring-collective time on v5e ICI (4 links/chip, public figure
     ~100 GB/s per direction aggregate) → projected efficiency at 8/16 chips
     (2 hosts = 16 chips of a v5e pod, all ICI — DCN is not crossed below
     256 chips).

Usage: python scripts/bench_scaling_model.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.models.gaussians import init_random
from gaussctrl_exp_tpu.parallel.sharded import (
    ShardedRenderConfig,
    make_mesh,
    make_sharded_render_loss,
    shard_params,
)

S = 512
N, CAPG = 100_000, 100_352  # mid-scale scene


def slope(fn, arg, k_hi=30):
    walls = {}
    for K in (5, k_hi):

        @jax.jit
        def run(x0):
            def body(i, carry):
                p = jax.tree.map(lambda a: a, x0)
                p = p._replace(means=x0.means + carry[:1, :1] * 1e-30)
                return carry + fn(p)

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(arg))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(arg))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[k_hi] - walls[5]) / (k_hi - 5) * 1e3


def main():
    gs = init_random(N, capacity=CAPG, sh_degree=1, seed=0)
    cam = make_camera(
        look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
        S * 1.05, S * 1.05, S / 2, S / 2, S, S,
    )
    cam_arrays = tuple(
        jnp.asarray(x)[None] for x in (cam.c2w, cam.fx, cam.fy, cam.cx, cam.cy)
    )
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (1, S, S, 3)).astype(np.float32))
    cfg = ShardedRenderConfig(height=S, width=S, isect_capacity_per_device=1 << 18,
                              sh_degree=1, impl="pallas")

    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    loss_sharded = make_sharded_render_loss(mesh1, cfg)
    ps, al = shard_params(gs.params, gs.alive, mesh1)

    def sharded_step(p):
        g = jax.grad(lambda pp: loss_sharded(pp, al, cam_arrays, gt, jnp.int32(0)))(p)
        return sum(jnp.sum(l) for l in g) + jnp.zeros((2, 2))

    # unsharded reference: identical math without shard_map/collectives
    from gaussctrl_exp_tpu.models.gaussians import GaussianState
    from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, render_model
    from gaussctrl_exp_tpu.ops.renderer import RenderConfig
    from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

    mcfg = SplatModelConfig(
        sh_degree=1, background_color="black",
        render=RenderConfig(impl="pallas", isect_capacity=1 << 18),
    )

    def plain_step(p):
        def loss_fn(pp):
            out = render_model(GaussianState(pp, gs.alive), cam, jnp.int32(0), mcfg,
                               training=True, background_override=jnp.zeros(3))
            return splatfacto_loss(out.rgb, gt[0])[0]

        g = jax.grad(loss_fn)(p)
        return sum(jnp.sum(l) for l in g) + jnp.zeros((2, 2))

    ms_plain = slope(plain_step, gs.params)
    print(f"unsharded step:      {ms_plain:7.2f} ms", flush=True)
    ms_shard = slope(sharded_step, ps)
    print(f"1x1-mesh sharded:    {ms_shard:7.2f} ms  (shard_map overhead "
          f"{ms_shard - ms_plain:+.2f} ms, {100*(ms_shard/ms_plain-1):+.1f}%)", flush=True)

    # --- collective byte model (counted from parallel/sharded.py's payload)
    for name, n in (("bear 34k", 34_174), ("garden 300k", 300_000)):
        fwd_rows_f32 = 2 + 1 + 1 + 3 + 1 + 4 + 3 + 1  # xys dep radii conic nth bbox color opac
        fwd_bytes = n * (fwd_rows_f32 * 4 + 1)  # + bool mask
        bwd_rows = 2 + 1 + 3 + 3 + 1  # grads: xys depths conics colors opacs
        bwd_bytes = n * bwd_rows * 4
        ici_per_dir = 100e9  # v5e: 4 ICI links, ~100 GB/s aggregate per direction
        for D in (4, 8, 16):
            ag = (D - 1) / D * fwd_bytes / ici_per_dir * 1e3
            rs = (D - 1) / D * bwd_bytes / ici_per_dir * 1e3
            comm = ag + rs
            # compute scales ~1/D on the gaussian-proportional part (~60% of
            # the step at bear per the op profile; blend is image-bound and
            # splits over 'model' bands too), overhead measured above
            t1 = ms_plain
            tD = t1 / D + (ms_shard - ms_plain) + comm
            eff = t1 / (D * tD)
            print(f"{name}: D={D:2d} all-gather {ag:5.2f} ms + reduce-scatter "
                  f"{rs:5.2f} ms -> projected efficiency {eff:.2f}")

    # the BASELINE axis is 2 HOSTS (16 chips vs 8, one v5e pod, all-ICI):
    ov = ms_shard - ms_plain
    for name, t1 in (("bear-honest 9.2ms", 9.2), ("garden 31ms", 31.0)):
        t8 = t1 / 8 + ov + 0.2
        t16 = t1 / 16 + ov + 0.3
        print(f"2-host efficiency ({name}): t8={t8:.2f} t16={t16:.2f} "
              f"eff(8->16)={t8/(2*t16):.2f}")


if __name__ == "__main__":
    main()
