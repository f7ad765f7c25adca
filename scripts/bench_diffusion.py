"""bf16 diffusion denoise-step benchmark on the real chip.

Measures the edit phase's wall-clock dominator: one CFG denoise step
(UNet + ControlNet ε at batch 2·views) at 512² image / 64² latent resolution,
full SD1.x dims, in bf16 and f32. This is the per-iteration cost of the
reference's 20+20 DDIM inversion/sampling loops
(/root/reference/gaussctrl/ad_pipeline.py:148-151,216-226) which it runs fp16
on the A5000; our TPU-native equivalent runs bf16 on the MXU.

Batch = 9 views (chunk 5 + 4 AttnAlign refs, README.md:120 bound is 3 on the
24 GB A5000) → CFG batch 18. Slope-timed over the denoise loop like
bench_stages.py so relay overhead cancels.

Usage: python scripts/bench_diffusion.py [views] [latent]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.diffusion.sd_pipeline import SDControlNetPipeline, init_random_models

VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 9
LAT = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K_LO, K_HI = 2, 6


def bench(dtype):
    models = init_random_models(dtype=dtype, latent=LAT)
    pipe = SDControlNetPipeline(models)
    B = 2 * VIEWS  # CFG pairs
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(B, LAT, LAT, 4)).astype(np.float32), dtype)
    ctx = jnp.asarray(rng.normal(size=(B, 77, 768)).astype(np.float32), dtype)
    hint = jnp.asarray(rng.uniform(0, 1, (B, LAT * 8, LAT * 8, 3)).astype(np.float32), dtype)

    mp = pipe.params  # params as jit args, NOT captured constants (5 GB ship)

    def make_run(K):
        @jax.jit
        def run(mp, lat0):
            def body(i, l):
                t = jnp.full((B,), 500 - i, jnp.int32)
                eps = pipe._eps(l, t, ctx, hint, 1.0, params=mp)
                return l - 0.001 * eps.astype(l.dtype)

            return jax.lax.fori_loop(0, K, body, lat0)

        return lambda lat0: run(mp, lat0)

    # analytic FLOPs of ONE denoise step from the compiled executable (XLA's
    # own cost model) — the basis for the MFU figure VERDICT r3 asked for
    one = jax.jit(lambda mp, l: pipe._eps(l, jnp.full((B,), 500, jnp.int32),
                                          ctx, hint, 1.0, params=mp))
    flops = None
    try:
        ca = one.lower(mp, lat).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    walls = {}
    for K in (K_LO, K_HI):
        run = make_run(K)
        jax.block_until_ready(run(lat))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(run(lat))
            best = min(best, time.time() - t0)
        walls[K] = best
    ms = (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3
    return ms, flops


if __name__ == "__main__":
    print(f"views={VIEWS} latent={LAT}² (image {LAT*8}²), CFG batch {2*VIEWS}")
    PEAK = {"bf16": 197e12, "f32": 49.2e12}  # v5e MXU peaks
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        ms, flops = bench(dt)
        per_view = ms / VIEWS
        mfu = f", MFU {flops / (ms * 1e-3) / PEAK[name] * 100:.1f}% ({flops/1e12:.2f} TFLOP/step)" if flops else ""
        print(
            f"{name}: {ms:8.1f} ms / denoise step (UNet×2 + ControlNet, "
            f"{per_view:.1f} ms/view); 20+20 DDIM steps ≈ {ms * 40 / 1e3:.1f} s "
            f"per {VIEWS}-view batch{mfu}",
            flush=True,
        )
