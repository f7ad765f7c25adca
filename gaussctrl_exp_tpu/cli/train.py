"""``gctpu-train`` — train / edit-finetune a 3DGS scene (≈ ``ns-train gaussctrl``).

Flow (reference: /root/reference/gaussctrl/gc_trainer.py:58-255):
  1. load the scene (transforms.json + images + seed ply), cache/undistort,
     4×10 view subsetting;
  2. init gaussians from the seed cloud, or import a splatfacto checkpoint
     (``--load-checkpoint``);
  3. if an edit prompt is configured and the diffusion stack has weights,
     run the GaussCtrl edit phase (render_reverse → edit_images) and write
     edited images back into the datamanager;
  4. train/finetune with the 7-group Adam recipe, densify/prune callbacks,
     periodic eval renders and checkpoints.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    from ..configs import GaussCtrlConfig
    from ..utils.cliconf import parse_config

    cfg, _ = parse_config(GaussCtrlConfig, argv, description=__doc__)
    run(cfg)


def run(cfg):
    import jax
    import jax.numpy as jnp

    from ..data.datamanager import DataManager
    from ..data.dataparser import DataParserConfig
    from ..engine.checkpoint import import_splatfacto_checkpoint, save_checkpoint
    from ..engine.trainer import Trainer
    from ..models.gaussians import init_from_points, init_random
    from ..utils.colormaps import apply_depth_colormap

    t0 = time.time()
    dm_cfg = cfg.datamanager
    dm_cfg.dataparser.data = Path(cfg.data)
    dm = DataManager(dm_cfg)
    print(f"[data] {len(dm)} train views @ {dm.width}x{dm.height} ({time.time()-t0:.1f}s)")

    if cfg.load_checkpoint:
        gs, start_step = import_splatfacto_checkpoint(cfg.load_checkpoint, capacity=cfg.capacity)
        print(f"[init] splatfacto checkpoint: {int(jnp.sum(gs.alive))} gaussians @ step {start_step}")
    elif dm.parsed.points_xyz is not None:
        gs = init_from_points(dm.parsed.points_xyz, dm.parsed.points_rgb, capacity=cfg.capacity)
        print(f"[init] seed ply: {dm.parsed.points_xyz.shape[0]} points, capacity {cfg.capacity}")
    else:
        gs = init_random(50_000, capacity=cfg.capacity)
        print("[init] random init (no seed points)")

    # --- optional GaussCtrl edit phase
    if cfg.pipeline.edit_prompt:
        from ..diffusion.pipeline import GaussCtrlEditPipeline, EditConfig

        # mask source, in the reference's preference order: live Lang-SAM
        # (SAM + text->box grounding) when checkpoints are configured, else
        # precomputed mask_npy/ sidecars, else no masking (README.md:110-116)
        mask_provider = None
        if cfg.pipeline.langsam_obj and cfg.pipeline.sam_ckpt:
            from ..segmentation.convert import load_sam
            from ..segmentation.lang_sam import LangSAM

            box_provider = None
            if cfg.pipeline.clip_ckpt:
                from ..segmentation.grounding import load_clip_grounder

                box_provider = load_clip_grounder(cfg.pipeline.clip_ckpt)
            mask_provider = LangSAM(
                load_sam(cfg.pipeline.sam_ckpt), box_provider=box_provider
            ).as_mask_provider()

        pipe = GaussCtrlEditPipeline(
            EditConfig(
                edit_prompt=cfg.pipeline.edit_prompt,
                reverse_prompt=cfg.pipeline.reverse_prompt,
                langsam_obj=cfg.pipeline.langsam_obj,
                guidance_scale=cfg.pipeline.guidance_scale,
                num_inference_steps=cfg.pipeline.num_inference_steps,
                chunk_size=cfg.pipeline.chunk_size,
                ref_view_num=cfg.pipeline.ref_view_num,
                diffusion_ckpt=cfg.pipeline.diffusion_ckpt,
                sidecar_dir=cfg.pipeline.sidecar_dir or str(cfg.data),
                resume_sidecars=cfg.pipeline.resume_sidecars,
            ),
            mask_provider=mask_provider,
        )
        if mask_provider is None:
            pipe.masks.update(dm.load_masks())  # precomputed mask_npy/ sidecars
        pipe.render_reverse(gs, dm, cfg.train.model)
        if pipe.n_resumed:
            print(f"[render_reverse] resumed {pipe.n_resumed} views from sidecars, "
                  f"{pipe.n_inversions} inverted")
        pipe.edit_images(dm)

    out_dir = Path(cfg.output_dir) / cfg.experiment_name
    out_dir.mkdir(parents=True, exist_ok=True)

    # observability: JSONL + console (+TB) writer, config dump
    # (gc_trainer.py:120-134, writer.put_config :133)
    from ..engine.writer import EventWriter

    writer = EventWriter(out_dir / "logs")
    writer.put_config(cfg)

    trainer = Trainer(gs, dm, cfg.train)
    num_steps = min(cfg.pipeline.render_rate, cfg.max_num_iterations)

    if cfg.viewer_port:
        from .viewer import attach_live_viewer

        attach_live_viewer(trainer, dm, cfg.train.model, cfg.viewer_port)

    def callback(m):
        step = m.pop("step")
        writer.put_scalars(step, m)

    for start in range(0, num_steps, cfg.steps_per_eval_image):
        n = min(cfg.steps_per_eval_image, num_steps - start)
        trainer.train(n, log_every=50, callback=callback)
        # eval image + eval-split metrics (gc_trainer.py:226-232)
        from ..models.gaussians import GaussianState
        from ..models.splat_model import render_model

        st = trainer.state
        out = render_model(
            GaussianState(st.params, st.alive), dm.camera(0), st.step, cfg.train.model
        )
        rgb = np.clip(np.asarray(out.rgb), 0, 1)
        writer.put_image(trainer.step, "eval", rgb)
        if out.depth is not None:
            dimg = apply_depth_colormap(np.asarray(out.depth), np.asarray(out.alpha))
            writer.put_image(trainer.step, "eval_depth", dimg)
        writer.put_scalars(trainer.step, trainer.evaluate())
        if trainer.step % cfg.steps_per_save < cfg.steps_per_eval_image:
            save_checkpoint(out_dir / "ckpts", trainer.state, trainer.step,
                            cfg.save_only_latest_checkpoint)

    save_checkpoint(out_dir / "ckpts", trainer.state, trainer.step, cfg.save_only_latest_checkpoint)
    (out_dir / "history.json").write_text(json.dumps(trainer.history, indent=1))
    writer.close()
    print(f"[done] {trainer.step} steps, outputs in {out_dir}")
    return trainer


def entrypoint():
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
