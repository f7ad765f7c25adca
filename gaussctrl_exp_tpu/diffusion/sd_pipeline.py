"""StableDiffusion-ControlNet pipeline: prompt encoding, DDIM inversion,
classifier-free-guided generation — jitted denoise loops.

Functional equivalent of the diffusers pipeline calls the reference makes
(/root/reference/gaussctrl/ad_pipeline.py):
  * ``image2latent``: VAE encode ×0.18215 (:247-254),
  * DDIM inversion at guidance 0 with the reverse prompt + depth ControlNet
    (:141-151),
  * guided sampling from inverted latents with CFG ``guidance_scale``,
    ControlNet scale 1.0, η=0, and a pluggable attention processor
    (:213-226, utils.py:39-133).

Weights: random-init via ``init_params`` (for tests / shape checks) or
converted from torch checkpoints via convert.py. Text encoding uses
transformers' FlaxCLIPTextModel (CLIP ViT-L/14 config).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .controlnet import ControlNet
from .schedulers import DDIMInverseScheduler, DDIMScheduler, SchedulerConfig
from .unet import UNet2DCondition
from .vae import AutoencoderKL


@dataclasses.dataclass
class SDModels:
    unet: UNet2DCondition
    controlnet: ControlNet
    vae: AutoencoderKL
    unet_params: dict
    controlnet_params: dict
    vae_params: dict
    text_encoder: object = None  # FlaxCLIPTextModel
    text_params: dict = None
    tokenizer: object = None


def init_random_models(
    key=None,
    dtype=jnp.float32,
    latent: int = 8,
    block_out=None,
    vae_block_out=None,
    heads: int = None,
    cross_dim: int = None,
    layers_per_block: int = None,
) -> SDModels:
    """Random-weight stack (architecture-faithful; for tests and dry runs).

    Default dims = real SD1.x; pass tiny dims (e.g. block_out=(32, 64)) for
    fast tests. ``latent``: latent spatial size used for init tracing (any
    size works at call time — everything is convolutional/attention)."""
    from .unet import BLOCK_OUT, CROSS_DIM, HEADS, LAYERS_PER_BLOCK
    from .vae import VAE_BLOCK_OUT

    block_out = tuple(block_out or BLOCK_OUT)
    vae_block_out = tuple(vae_block_out or VAE_BLOCK_OUT)
    heads = heads or HEADS
    cross_dim = cross_dim or CROSS_DIM
    layers_per_block = layers_per_block or LAYERS_PER_BLOCK
    temb = block_out[-1]

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    unet = UNet2DCondition(
        block_out=block_out, layers_per_block=layers_per_block, heads=heads,
        cross_dim=cross_dim, temb_dim=temb, dtype=dtype,
    )
    controlnet = ControlNet(
        block_out=block_out, layers_per_block=layers_per_block, heads=heads,
        cross_dim=cross_dim, temb_dim=temb, dtype=dtype,
    )
    vae = AutoencoderKL(block_out=vae_block_out, dtype=dtype)
    sample = jnp.zeros((1, latent, latent, 4), dtype)
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, cross_dim), dtype)
    hint = jnp.zeros((1, latent * 8, latent * 8, 3), dtype)
    unet_params = unet.init(k1, sample, ts, ctx)["params"]
    controlnet_params = controlnet.init(k2, sample, ts, ctx, hint)["params"]
    vae_params = vae.init(k3, jnp.zeros((1, 32, 32, 3), dtype))["params"]
    return SDModels(unet, controlnet, vae, unet_params, controlnet_params, vae_params)


def attach_text_encoder(models: SDModels, pretrained: Optional[str] = None) -> SDModels:
    """CLIP ViT-L/14 text encoder (random init unless a local path is given)."""
    from transformers import CLIPTextConfig, FlaxCLIPTextModel

    if pretrained:
        try:
            te = FlaxCLIPTextModel.from_pretrained(pretrained)
        except (OSError, EnvironmentError):
            # torch-only checkpoint dir (the usual diffusers layout):
            # transformers converts torch→Flax in-process
            te = FlaxCLIPTextModel.from_pretrained(pretrained, from_pt=True)
        models.text_encoder, models.text_params = te, te.params
    else:
        cfg = CLIPTextConfig(  # ViT-L/14 text tower
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12, max_position_embeddings=77,
        )
        te = FlaxCLIPTextModel(cfg, seed=0)
        models.text_encoder, models.text_params = te, te.params
    return models


def encode_prompt_ids(models: SDModels, input_ids: jnp.ndarray) -> jnp.ndarray:
    """(B, 77) token ids → (B, 77, 768) CLIP hidden states."""
    out = models.text_encoder(input_ids=input_ids, params=models.text_params)
    return out.last_hidden_state


def simple_tokenize(texts, max_len: int = 77) -> np.ndarray:
    """Hash-based placeholder tokenizer for weightless testing (real runs use
    the CLIP BPE tokenizer loaded from the checkpoint, tokenizer.py)."""
    ids = np.zeros((len(texts), max_len), np.int32)
    for i, t in enumerate(texts):
        toks = [49406] + [hash(w) % 49000 for w in t.lower().split()][: max_len - 2] + [49407]
        ids[i, : len(toks)] = toks
    return ids


def tokenize(models: SDModels, texts, max_len: int = 77) -> np.ndarray:
    """Tokenize with the checkpoint's real CLIP BPE vocab when available
    (set by convert.load_sd_models), else the hash placeholder."""
    if models.tokenizer is not None:
        return models.tokenizer(texts, max_len=max_len)
    return simple_tokenize(texts, max_len)


class SDControlNetPipeline:
    """Deterministic DDIM inversion + CFG generation with ControlNet hints."""

    def __init__(self, models: SDModels, sched_cfg: SchedulerConfig = SchedulerConfig()):
        self.m = models
        self.scheduler = DDIMScheduler(sched_cfg)
        self.inverse_scheduler = DDIMInverseScheduler(sched_cfg)

    # --- model evaluation -------------------------------------------------
    # Every method takes an optional ``params`` override — (unet, controlnet,
    # vae) param pytrees — so callers can jit with params as ARGUMENTS.
    # Closed-over params are captured as lowering CONSTANTS by jax.jit, which
    # on the axon AOT path ships the full ~5 GB f32 stack through the remote
    # tunnel at every compile (observed; the warning threshold fired). Pass
    # ``pipe.params`` explicitly into jitted wrappers instead.

    @property
    def params(self):
        return (self.m.unet_params, self.m.controlnet_params, self.m.vae_params)

    def _eps(self, latents, t, ctx, hint, cond_scale, processor=None, params=None):
        up, cp, _ = params if params is not None else self.params
        down_res, mid_res = self.m.controlnet.apply(
            {"params": cp},
            latents, t, ctx, hint, cond_scale,
            processor=processor,
        )
        return self.m.unet.apply(
            {"params": up},
            latents, t, ctx,
            processor=processor,
            controlnet_residuals=(down_res, mid_res),
        )

    # --- VAE --------------------------------------------------------------
    def image_to_latent(self, images: jnp.ndarray, key=None, params=None) -> jnp.ndarray:
        """(B, H, W, 3) in [0, 1] → scaled latents (ad_pipeline.py:247-254)."""
        vp = params[2] if params is not None else self.m.vae_params
        x = images * 2.0 - 1.0
        return self.m.vae.apply({"params": vp}, x, key, method=AutoencoderKL.encode)

    def latent_to_image(self, latents: jnp.ndarray, params=None) -> jnp.ndarray:
        vp = params[2] if params is not None else self.m.vae_params
        x = self.m.vae.apply({"params": vp}, latents, method=AutoencoderKL.decode)
        return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)

    # --- DDIM inversion (guidance 0, reverse prompt) ----------------------
    def invert(self, latents, ctx, hint, num_steps: int = 20, cond_scale: float = 1.0,
               processor=None, params=None):
        ts = self.inverse_scheduler.set_timesteps(num_steps)
        # carry in f32 regardless of model dtype: scheduler accumulation is
        # f32 (DDIM precision), the model casts its inputs to its own dtype
        latents = latents.astype(jnp.float32)

        def body(carry, t):
            lat = carry
            eps = self._eps(lat, jnp.full((lat.shape[0],), t), ctx, hint, cond_scale, processor,
                            params=params)
            lat = self.inverse_scheduler.step(eps, t, lat)
            return lat, None

        lat, _ = jax.lax.scan(body, latents, jnp.asarray(ts))
        return lat

    # --- CFG generation from (inverted) latents ---------------------------
    def generate(self, latents, ctx_cond, ctx_uncond, hint, guidance_scale: float,
                 num_steps: int = 20, cond_scale: float = 1.0, processor=None, params=None):
        """Batched CFG: the two halves [uncond; cond] go through the model
        together (the doubled batch the cross-view processor's
        ``unet_chunk_size=2`` accounts for)."""
        ts = self.scheduler.set_timesteps(num_steps)
        latents = latents.astype(jnp.float32)  # f32 carry (see invert)
        B = latents.shape[0]
        ctx2 = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
        hint2 = jnp.concatenate([hint, hint], axis=0)

        def body(carry, t):
            lat = carry
            lat2 = jnp.concatenate([lat, lat], axis=0)
            eps2 = self._eps(lat2, jnp.full((2 * B,), t), ctx2, hint2, cond_scale, processor,
                             params=params)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
            lat = self.scheduler.step(eps, t, lat)
            return lat, None

        lat, _ = jax.lax.scan(body, latents, jnp.asarray(ts))
        return lat
