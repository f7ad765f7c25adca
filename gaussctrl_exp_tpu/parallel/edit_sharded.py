"""View-axis-sharded edit denoise: shard the CFG batch over devices, gather
only the 4 reference views' K/V for AttnAlign.

The reference's edit phase batches chunk+4 reference views through one UNet
forward on one GPU (/root/reference/gaussctrl/ad_pipeline.py:196-226,
utils.py:94-117) — its only scale axis is VRAM-bound chunk size (3 on the
A5000, README.md:120). This module is the SURVEY §5.7 build-side design the
reference never needed: views are sharded over a mesh axis, self-attention
stays local, and only the reference views' K/V cross devices.

Mechanics: every self-attention layer needs (a) the view's own K/V (local by
construction) and (b) K/V of GLOBAL views 0..3 — the AttnAlign reference
views, which live on the first device(s). Each device zero-masks its slice of
the reference block and a ``psum`` over the view axis reconstructs the full
(2, 4, heads, S, D) reference K/V everywhere — per 64²-latent self-attn layer
that is ~21 MB·2 in f32 (half in bf16), ≈3 ms/denoise-step over v5e ICI at 8
chips vs 251 ms of compute (BASELINE.md): the collective is noise, the edit
phase scales ~1/D.

Parity: tests/test_edit_sharded.py asserts the sharded denoise equals the
single-device ``cross_view_processor`` path on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..diffusion.attention import _sdpa


def make_view_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), axis_names=("views",))


def sharded_cross_view_processor(
    self_attn_coeff: float, num_ref_views: int = 4, unet_chunk_size: int = 2,
    axis: str = "views",
):
    """AttnAlign processor for a view-sharded batch: identical math to
    attention.make_cross_view_processor, with the reference views' K/V
    reconstructed by a zero-mask + psum over the view axis."""

    def processor(q, k, v, is_cross: bool) -> jnp.ndarray:
        if is_cross:
            return _sdpa(q, k, v)
        Bl, H, S, D = q.shape
        Vl = Bl // unet_chunk_size  # local views per device
        dev = jax.lax.axis_index(axis)
        kg = k.reshape(unet_chunk_size, Vl, H, S, D)
        vg = v.reshape(unet_chunk_size, Vl, H, S, D)

        # my local slots' GLOBAL view ids; one-hot against the ref ids
        gidx = dev * Vl + jnp.arange(Vl)
        onehot = (jnp.arange(num_ref_views)[:, None] == gidx[None, :]).astype(k.dtype)
        refs_k = jnp.einsum("rv,cvhsd->crhsd", onehot, kg)
        refs_v = jnp.einsum("rv,cvhsd->crhsd", onehot, vg)
        refs_k = jax.lax.psum(refs_k, axis)  # (chunk, num_ref, H, S, D)
        refs_v = jax.lax.psum(refs_v, axis)

        out_self = _sdpa(q, k, v)
        ref_outs = []
        for r in range(num_ref_views):
            k_r = jnp.broadcast_to(refs_k[:, r : r + 1], kg.shape).reshape(Bl, H, S, D)
            v_r = jnp.broadcast_to(refs_v[:, r : r + 1], vg.shape).reshape(Bl, H, S, D)
            ref_outs.append(_sdpa(q, k_r, v_r))
        out_ref = jnp.mean(jnp.stack(ref_outs), axis=0)
        return self_attn_coeff * out_self + (1.0 - self_attn_coeff) * out_ref

    return processor


def make_sharded_generate(mesh: Mesh, pipe, self_attn_coeff: float = 0.6,
                          num_ref_views: int = 4):
    """CFG generation with views sharded over ``mesh``'s 'views' axis.

    latents/ctx_cond/ctx_uncond/hint are (V, ...) arrays, V divisible by the
    mesh size and the first ``num_ref_views`` views are the AttnAlign
    references (ad_pipeline.py:115-120's deterministic selection placed
    first, as diffusion/pipeline.py already arranges). Model params are
    replicated; each device denoises V/D views.
    """
    proc = sharded_cross_view_processor(self_attn_coeff, num_ref_views)

    def run(latents, ctx_cond, ctx_uncond, hint, guidance_scale, num_steps, params):
        fn = shard_map(
            functools.partial(_generate_local, pipe=pipe, proc=proc,
                              guidance_scale=guidance_scale, num_steps=num_steps),
            mesh=mesh,
            in_specs=(PSpec("views"), PSpec("views"), PSpec("views"), PSpec("views"),
                      PSpec()),
            out_specs=PSpec("views"),
            check_vma=False,
        )
        return fn(latents, ctx_cond, ctx_uncond, hint, params)

    return run


def _generate_local(latents, ctx_cond, ctx_uncond, hint, params, *, pipe, proc,
                    guidance_scale, num_steps):
    return pipe.generate(
        latents, ctx_cond, ctx_uncond, hint, guidance_scale,
        num_steps=num_steps, processor=proc, params=params,
    )


def shard_views(mesh: Mesh, *arrays):
    """Place (V, ...) arrays on the mesh's 'views' axis."""
    sh = NamedSharding(mesh, PSpec("views"))
    return tuple(jax.device_put(a, sh) for a in arrays)
