"""View-axis-sharded edit denoise (SURVEY §5.7): the sharded CFG generation
with psum-gathered reference K/V must equal the single-device AttnAlign path
on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.diffusion.attention import make_cross_view_processor
from gaussctrl_exp_tpu.diffusion.sd_pipeline import SDControlNetPipeline, init_random_models
from gaussctrl_exp_tpu.parallel.edit_sharded import (
    make_sharded_generate,
    make_view_mesh,
    shard_views,
    sharded_cross_view_processor,
)

TINY = dict(block_out=(32, 64), vae_block_out=(32, 32, 32, 32), heads=2, cross_dim=32,
            layers_per_block=1)
LAT = 8
V = 8  # views; first 4 are AttnAlign references


@pytest.fixture(scope="module")
def pipe():
    return SDControlNetPipeline(init_random_models(jax.random.PRNGKey(0), latent=LAT, **TINY))


def _inputs():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(V, LAT, LAT, 4)).astype(np.float32))
    ctx_c = jnp.asarray(rng.normal(size=(V, 77, 32)).astype(np.float32))
    ctx_u = jnp.asarray(rng.normal(size=(V, 77, 32)).astype(np.float32))
    hint = jnp.asarray(rng.uniform(0, 1, (V, LAT * 8, LAT * 8, 3)).astype(np.float32))
    return lat, ctx_c, ctx_u, hint


def test_sharded_processor_matches_unsharded(pipe):
    """Raw attention-level parity: the psum-gathered reference K/V mix equals
    make_cross_view_processor on one device."""
    mesh = make_view_mesh(4)
    rng = np.random.default_rng(1)
    B, H, S, D = 2 * V, 2, 16, 8
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32)) for _ in range(3))
    ref = make_cross_view_processor(0.6)(q, k, v, False)

    from jax import shard_map
    from jax.sharding import PartitionSpec as PSpec

    def local(q, k, v):
        # local batch keeps [uncond; cond] structure: (2, Vl, ...) flattened
        return sharded_cross_view_processor(0.6)(q, k, v, False)

    # reshape (2V, ...) → (2, V, ...) → shard V → back to (2*Vl) per device
    qg = q.reshape(2, V, H, S, D).transpose(1, 0, 2, 3, 4)  # (V, 2, H, S, D)
    kg = k.reshape(2, V, H, S, D).transpose(1, 0, 2, 3, 4)
    vg = v.reshape(2, V, H, S, D).transpose(1, 0, 2, 3, 4)

    def body(qs, ks, vs):
        Vl = qs.shape[0]
        ql = qs.transpose(1, 0, 2, 3, 4).reshape(2 * Vl, H, S, D)
        kl = ks.transpose(1, 0, 2, 3, 4).reshape(2 * Vl, H, S, D)
        vl = vs.transpose(1, 0, 2, 3, 4).reshape(2 * Vl, H, S, D)
        out = local(ql, kl, vl)
        return out.reshape(2, Vl, H, S, D).transpose(1, 0, 2, 3, 4)

    fn = shard_map(body, mesh=mesh, in_specs=(PSpec("views"),) * 3,
                   out_specs=PSpec("views"), check_vma=False)
    got = fn(qg, kg, vg)  # (V, 2, H, S, D)
    got = got.transpose(1, 0, 2, 3, 4).reshape(2 * V, H, S, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6)


@pytest.mark.slow  # 28 s; the processor-level parity test above covers the
# collective math and dryrun_multichip runs this integration each round
def test_sharded_generate_matches_single_device(pipe):
    lat, ctx_c, ctx_u, hint = _inputs()
    single = pipe.generate(
        lat, ctx_c, ctx_u, hint, guidance_scale=5.0, num_steps=3,
        processor=make_cross_view_processor(0.6),
    )

    mesh = make_view_mesh(4)
    run = make_sharded_generate(mesh, pipe, self_attn_coeff=0.6)
    lat_s, cc_s, cu_s, h_s = shard_views(mesh, lat, ctx_c, ctx_u, hint)
    sharded = run(lat_s, cc_s, cu_s, h_s, 5.0, 3, pipe.params)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=5e-4, atol=5e-5)
