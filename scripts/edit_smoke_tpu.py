"""TPU edit-path smoke: one DDIM inversion + one CFG edit chunk at the REAL
operating point — 512² image, 64² latent, full SD1.x dims, bf16, AttnAlign
processor — with random weights (no checkpoints exist in this env).

This is the rehearsal for docs/EDIT_PROCEDURE.md step 4: it proves the whole
denoise path (VAE encode → DDIM invert → CFG generate with the cross-view
processor → VAE decode) compiles and runs on the chip, which interpret-mode
CPU tests cannot prove. Run before any long real-weights edit.

Usage: python scripts/edit_smoke_tpu.py [views] [steps]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.diffusion.attention import make_cross_view_processor
from gaussctrl_exp_tpu.diffusion.sd_pipeline import (
    SDControlNetPipeline,
    init_random_models,
)

VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2  # edit-chunk views
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2  # DDIM steps (20 in prod)
REF = 4  # AttnAlign reference views (ad_pipeline.py:74-75)
LAT = 64  # 64² latent = 512² image

print(f"devices: {jax.devices()}  views={VIEWS}+{REF} ref, latent {LAT}² (bf16)")
t0 = time.time()
models = init_random_models(jax.random.PRNGKey(0), dtype=jnp.bfloat16, latent=LAT)
pipe = SDControlNetPipeline(models)
print(f"models initialized in {time.time()-t0:.1f}s")

rng = np.random.default_rng(0)
B = REF + VIEWS
imgs = jnp.asarray(rng.uniform(0, 1, (B, LAT * 8, LAT * 8, 3)).astype(np.float32))
disp = jnp.asarray(rng.uniform(0, 1, (B, LAT * 8, LAT * 8, 3)).astype(np.float32))
ctx = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32))

t0 = time.time()
mp = pipe.params  # explicit params: avoid 5 GB captured-constant ship
lat = jax.jit(pipe.image_to_latent)(imgs, params=mp)
jax.block_until_ready(lat)
print(f"VAE encode 512²×{B}: {time.time()-t0:.1f}s (incl. compile)  latent {lat.shape}")

rev = jnp.broadcast_to(ctx, (B,) + ctx.shape[1:])
t0 = time.time()
z0 = jax.jit(lambda p, l, h: pipe.invert(l, rev, h, STEPS, 1.0, params=p))(mp, lat, disp)
jax.block_until_ready(z0)
print(f"DDIM inversion ({STEPS} steps): {time.time()-t0:.1f}s (incl. compile)")

proc = make_cross_view_processor(0.6, REF)
pos = jnp.broadcast_to(ctx, (B,) + ctx.shape[1:])
neg = jnp.broadcast_to(ctx * 0.1, (B,) + ctx.shape[1:])
t0 = time.time()
out_lat = jax.jit(
    lambda p, z, h: pipe.generate(z, pos, neg, h, 5.0, STEPS, 1.0, processor=proc, params=p)
)(mp, z0, disp)
jax.block_until_ready(out_lat)
print(f"CFG generate + AttnAlign ({STEPS} steps, CFG batch {2*B}): "
      f"{time.time()-t0:.1f}s (incl. compile)")

t0 = time.time()
imgs_out = jax.jit(lambda p, l: pipe.latent_to_image(l, params=p))(mp, out_lat)
jax.block_until_ready(imgs_out)
print(f"VAE decode: {time.time()-t0:.1f}s")

arr = np.asarray(imgs_out, np.float32)
assert arr.shape == (B, LAT * 8, LAT * 8, 3), arr.shape
assert np.isfinite(arr).all(), "non-finite pixels out of the edit path"
print("EDIT SMOKE OK —", arr.shape, f"range [{arr.min():.3f}, {arr.max():.3f}]")
