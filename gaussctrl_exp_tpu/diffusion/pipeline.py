"""The GaussCtrl edit pipeline: render_reverse → edit_images → write-back.

Re-implements the reference's editing orchestration
(/root/reference/gaussctrl/ad_pipeline.py:128-295) on the TPU stack:

  render_reverse (:128-163):
    for every (subsampled) training camera: render RGB + depth with the 3DGS
    renderer, build the disparity hint (1/(d+1e-5), max-normalized, 3-channel,
    :256-274), VAE-encode the render, run 20-step DDIM INVERSION conditioned
    on the reverse prompt + depth ControlNet at guidance 0 → per-view ``z_0``;
    optionally compute an object mask (Lang-SAM in the reference; here a
    pluggable mask provider / precomputed masks, README.md:110-116 documents
    masks as optional).

  edit_images (:165-245):
    select 4 deterministic-random reference views (seed 13789,
    ad_pipeline.py:115-120), install the cross-view attention processor
    (0.6 self / 0.4 reference mixing in the UNet, 0.0 in the ControlNet), and
    regenerate chunks of ``chunk_size`` views + the 4 reference views from
    their inverted latents with the edit prompt at CFG ``guidance_scale``;
    composite the edited foreground over the unedited background with the
    mask (:229-239) and write edited images back into the datamanager
    (:241-242) for the fine-tuning phase.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .attention import make_cross_view_processor
from .sd_pipeline import SDControlNetPipeline, SDModels, encode_prompt_ids
from .sd_pipeline import tokenize as models_tokenize

ADDED_PROMPT = "best quality, extremely detailed"
NEGATIVE_PROMPT = (
    "longbody, lowres, bad anatomy, bad hands, missing fingers, extra digit, "
    "fewer digits, cropped, worst quality, low quality"
)
REF_VIEW_SEED = 13789  # ad_pipeline.py:117


@dataclasses.dataclass
class EditConfig:
    edit_prompt: str = ""
    reverse_prompt: str = ""
    langsam_obj: str = ""
    guidance_scale: float = 5.0
    num_inference_steps: int = 20
    chunk_size: int = 5
    ref_view_num: int = 4
    diffusion_ckpt: str = ""
    self_attn_coeff_unet: float = 0.6  # ad_pipeline.py:169-174
    self_attn_coeff_controlnet: float = 0.0
    controlnet_conditioning_scale: float = 1.0
    latent_size: int = 64  # 512² images → 64² latents
    # cross-view attention processor choice. "attn_align" is the paper path
    # (CrossViewAttnProcessor); "triplane" and "correspondence" surface the
    # reference fork's experimental processors (gc_pipeline.py:329-331,384-398
    # wires TriPlaneAttnProcessor + depth-backprojected pts_world into the
    # pipe; mv_model.py's CPBlocks are the correspondence form) — geometry is
    # computed per chunk from the rendered depths cached by render_reverse.
    attn_processor: str = "attn_align"  # "attn_align" | "triplane" | "correspondence"
    triplane_mix: float = 0.5
    triplane_bbox_length: float = 8.0  # gc_pipeline.py:330
    triplane_plane_res: int = 32
    geom_res_divisor: int = 1  # geometry token grid = latent_size // this
    corr_mix: float = 0.5
    corr_sigma: float = 0.1
    # sidecar round-trip (reference gc_dataset.py:129-158 + ad_pipeline.py:276-282
    # + gc_render.py:826-838): render_reverse persists depth_npy/z_0/mask_npy/
    # unedited per view and a later run resumes them, skipping render+inversion
    sidecar_dir: str = ""  # "" = don't persist/resume
    resume_sidecars: bool = True  # set False to force recompute


def depth_to_disparity(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth → (H, W, 3) normalized disparity hint (ad_pipeline.py:256-274)."""
    disparity = 1.0 / (np.asarray(depth, np.float32) + 1e-5)
    disparity = disparity / max(float(disparity.max()), 1e-12)
    return np.repeat(disparity[..., None], 3, axis=-1)


def select_reference_views(view_num: int, ref_view_num: int = 4) -> list[int]:
    """Deterministic-random anchor sampling (ad_pipeline.py:115-120)."""
    anchors = [(view_num * i) // ref_view_num for i in range(ref_view_num)] + [view_num]
    rng = random.Random(REF_VIEW_SEED)
    return [rng.randint(anchor, anchors[i + 1]) for i, anchor in enumerate(anchors[:-1])]


class GaussCtrlEditPipeline:
    """Host-orchestrated edit loop over jitted device steps."""

    def __init__(
        self,
        cfg: EditConfig,
        models: Optional[SDModels] = None,
        mask_provider: Optional[Callable[[np.ndarray, str], np.ndarray]] = None,
        tokenizer: Optional[Callable[[list], np.ndarray]] = None,
    ):
        self.cfg = cfg
        if models is None:
            from .convert import load_sd_models

            models = load_sd_models(cfg.diffusion_ckpt)
        self.models = models
        self.pipe = SDControlNetPipeline(models)
        self.mask_provider = mask_provider
        # default: the checkpoint's real CLIP BPE vocab when models carry one
        # (load_sd_models attaches it), hash placeholder otherwise
        self.tokenize = tokenizer or (lambda texts: models_tokenize(self.models, texts))
        # callers may also preload per-view masks (e.g. DataManager.load_masks()
        # reading the reference's mask_npy/ sidecars) into self.masks directly
        # per-view caches (the reference stashes these in the dataset,
        # gc_dataset.py metadata / update_datasets ad_pipeline.py:276-282)
        self.z0: dict[int, np.ndarray] = {}
        self.disparity: dict[int, np.ndarray] = {}
        self.depths: dict[int, np.ndarray] = {}  # raw depths (geometry processors)
        self.masks: dict[int, np.ndarray] = {}
        self.unedited: dict[int, np.ndarray] = {}
        self.n_inversions = 0  # views actually rendered+inverted this run
        self.n_resumed = 0  # views loaded from sidecars

    # ------------------------------------------------------------------
    @staticmethod
    def _sidecar_paths(datamanager, local_i: int, root) -> dict:
        """Reference sidecar layout: <root>/{depth_npy,z_0,mask_npy,unedited}/
        frame_{global+1:05d}.npy — global frame numbering survives the 4×10
        view subsetting (gc_dataparser_ns.py:408-420 discovery convention)."""
        from pathlib import Path

        gi = local_i
        vi = getattr(datamanager, "view_indices", None)
        if vi is not None:
            gi = int(vi[local_i])
        root = Path(root)
        stem = f"frame_{gi + 1:05d}"
        return {
            "depth": root / "depth_npy" / f"{stem}.npy",
            "z0": root / "z_0" / f"{stem}.npy",
            "mask": root / "mask_npy" / f"{stem}.npy",
            "unedited": root / "unedited" / f"{stem}.npy",
        }

    def _try_resume_sidecars(self, datamanager, idx: int, root) -> bool:
        sp = self._sidecar_paths(datamanager, idx, root)
        if not (sp["z0"].exists() and sp["depth"].exists() and sp["unedited"].exists()):
            return False
        depth = np.load(sp["depth"])
        self.depths[idx] = depth
        self.disparity[idx] = depth_to_disparity(depth)
        self.z0[idx] = np.load(sp["z0"])
        self.unedited[idx] = np.load(sp["unedited"])
        if sp["mask"].exists():
            self.masks[idx] = np.load(sp["mask"]).astype(np.float32)
        self.n_resumed += 1
        return True

    def _write_sidecars(self, datamanager, idx: int, root, depth: np.ndarray) -> None:
        sp = self._sidecar_paths(datamanager, idx, root)
        for p in sp.values():
            p.parent.mkdir(parents=True, exist_ok=True)
        np.save(sp["depth"], np.asarray(depth, np.float32))
        np.save(sp["z0"], self.z0[idx])
        np.save(sp["unedited"], self.unedited[idx])
        if idx in self.masks:
            np.save(sp["mask"], self.masks[idx])

    # ------------------------------------------------------------------
    def _encode(self, texts: list[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenize(texts))
        return encode_prompt_ids(self.models, ids)

    # ------------------------------------------------------------------
    def render_reverse(self, gs, datamanager, model_cfg, sidecar_root=None,
                       force_recompute: bool = False) -> None:
        """Render + invert every training view (ad_pipeline.py:128-163).

        With a sidecar root (argument or cfg.sidecar_dir), views whose
        depth/z_0/unedited sidecars exist are RESUMED from disk — zero render
        + inversion work — and newly computed views are persisted
        (gc_dataset.py:129-158 / ad_pipeline.py:276-282 round-trip)."""
        from ..models.gaussians import GaussianState
        from ..models.splat_model import render_model

        cfgp = self.cfg
        root = sidecar_root or (cfgp.sidecar_dir or None)
        resume = root is not None and cfgp.resume_sidecars and not force_recompute
        rev_ctx = self._encode([f"{cfgp.reverse_prompt}, {ADDED_PROMPT}"])

        render_jit = jax.jit(
            lambda p, a, cam: render_model(GaussianState(p, a), cam, 30_000, model_cfg)
        )
        # params as jit ARGUMENTS: closed-over params become lowering
        # constants (the full multi-GB f32 stack would ship through the
        # axon relay at each compile)
        mp = self.pipe.params
        invert_jit = jax.jit(
            lambda p, lat, hint: self.pipe.invert(
                lat, rev_ctx, hint, cfgp.num_inference_steps,
                cfgp.controlnet_conditioning_scale, params=p,
            )
        )
        encode_jit = jax.jit(lambda p, img: self.pipe.image_to_latent(img, params=p))

        for idx in range(len(datamanager)):
            if resume and self._try_resume_sidecars(datamanager, idx, root):
                print(f"[render_reverse] view {idx+1}/{len(datamanager)} (sidecar)", end="\r")
                continue
            cam = datamanager.camera(idx)
            out = render_jit(gs.params, gs.alive, cam)
            rgb = np.clip(np.asarray(out.rgb), 0, 1)
            depth = np.asarray(out.depth)[..., 0]
            disparity = depth_to_disparity(depth)
            latents = encode_jit(mp, jnp.asarray(rgb)[None])
            z0 = invert_jit(mp, latents, jnp.asarray(disparity)[None])
            self.unedited[idx] = rgb
            self.depths[idx] = depth
            self.disparity[idx] = disparity
            self.z0[idx] = np.asarray(z0[0])
            self.n_inversions += 1
            if self.mask_provider is not None and cfgp.langsam_obj:
                self.masks[idx] = np.asarray(
                    self.mask_provider(rgb, cfgp.langsam_obj), np.float32
                )
            if root is not None:
                self._write_sidecars(datamanager, idx, root, depth)
            print(f"[render_reverse] view {idx+1}/{len(datamanager)}", end="\r")
        print()

    # ------------------------------------------------------------------
    def _chunk_geometry(self, datamanager, views: list[int]):
        """Per-chunk geometry for the experimental processors: depths cached
        by render_reverse, strided to the feature grid. Returns a pytree of
        arrays (passed through the jit boundary as ARGUMENTS so chunks don't
        recompile) or None for the plain AttnAlign path."""
        cfgp = self.cfg
        if cfgp.attn_processor == "attn_align":
            return None
        from ..cameras import Camera
        from .geometry import depth_to_world_points

        fh = max(cfgp.latent_size // max(cfgp.geom_res_divisor, 1), 1)
        depths = [jnp.asarray(self.depths[i], jnp.float32) for i in views]
        cams = [datamanager.camera(i) for i in views]
        if cfgp.attn_processor == "correspondence":
            from .correspondence import build_correspondence_tables

            return build_correspondence_tables(depths, cams, fh, cfgp.corr_sigma)
        # triplane: back-project strided depths to (V, S, 3) world points
        # (reference feeds pts_world from the rendered depth maps,
        # gc_pipeline.py:384-398)
        pts = []
        for d, c in zip(depths, cams):
            H = d.shape[0]
            stride = max(H // fh, 1)
            ds = d[stride // 2 :: stride, stride // 2 :: stride][:fh, :fh]
            cs = Camera(c2w=c.c2w, fx=c.fx / stride, fy=c.fy / stride,
                        cx=c.cx / stride, cy=c.cy / stride, width=fh, height=fh)
            pts.append(depth_to_world_points(ds, cs).reshape(-1, 3))
        return jnp.stack(pts)  # (V, S, 3)

    def _make_processor(self, geom):
        """Processor for one chunk — called INSIDE the jitted generate (all
        jnp ops), so per-chunk geometry arrays are traced arguments."""
        cfgp = self.cfg
        if cfgp.attn_processor == "attn_align":
            return make_cross_view_processor(cfgp.self_attn_coeff_unet, cfgp.ref_view_num)
        if cfgp.attn_processor == "triplane":
            from .triplane_attention import make_triplane_processor

            return make_triplane_processor(
                geom, mix=cfgp.triplane_mix,
                bbox_length=cfgp.triplane_bbox_length,
                plane_res=cfgp.triplane_plane_res,
            )
        if cfgp.attn_processor == "correspondence":
            from .correspondence import make_multires_epipolar_processor

            nbr_idx, nbr_w = geom
            tables = {nbr_idx.shape[2]: (nbr_idx, nbr_w)}
            return make_multires_epipolar_processor(tables, mix=cfgp.corr_mix)
        raise ValueError(f"unknown attn_processor {cfgp.attn_processor!r}")

    def edit_images(self, datamanager) -> None:
        """Chunked cross-view-consistent regeneration (ad_pipeline.py:165-245)."""
        cfgp = self.cfg
        V = len(datamanager)
        ref_indices = select_reference_views(V, cfgp.ref_view_num)

        pos_ctx = self._encode([f"{cfgp.edit_prompt}, {ADDED_PROMPT}"])
        neg_ctx = self._encode([NEGATIVE_PROMPT])

        def gen(p, z0_batch, hint_batch, geom):
            B = z0_batch.shape[0]
            return self.pipe.generate(
                z0_batch,
                jnp.broadcast_to(pos_ctx, (B,) + pos_ctx.shape[1:]),
                jnp.broadcast_to(neg_ctx, (B,) + neg_ctx.shape[1:]),
                hint_batch,
                cfgp.guidance_scale,
                cfgp.num_inference_steps,
                cfgp.controlnet_conditioning_scale,
                processor=self._make_processor(geom),
                params=p,
            )

        mp = self.pipe.params
        gen_jit = jax.jit(gen)
        decode_jit = jax.jit(lambda p, lat: self.pipe.latent_to_image(lat, params=p))

        ref_z0 = np.stack([self.z0[i] for i in ref_indices])
        ref_disp = np.stack([self.disparity[i] for i in ref_indices])

        # Exact reference chunking (ad_pipeline.py:196-242): iterate ALL views
        # in order (ref views included — each is edited when its own chunk
        # arrives), always prepend the 4 reference z0/disparities, and DISCARD
        # the per-chunk reference outputs (`.images[self.num_ref_views:]`).
        for c0 in range(0, V, cfgp.chunk_size):
            chunk = list(range(c0, min(c0 + cfgp.chunk_size, V)))
            z0 = jnp.asarray(np.concatenate([ref_z0, np.stack([self.z0[i] for i in chunk])]))
            hint = jnp.asarray(
                np.concatenate([ref_disp, np.stack([self.disparity[i] for i in chunk])])
            )
            geom = self._chunk_geometry(datamanager, ref_indices + chunk)
            latents = gen_jit(mp, z0, hint, geom)
            images = np.asarray(decode_jit(mp, latents))[len(ref_indices) :]
            for bi, view in enumerate(chunk):
                edited = images[bi]
                if view in self.masks:
                    m = self.masks[view][..., None]
                    edited = edited * m + self.unedited[view] * (1 - m)  # :233-239
                datamanager.write_back(view, edited)
            print(f"[edit_images] {min(c0+cfgp.chunk_size, V)}/{V} views", end="\r")
        print()
