"""Metrics/event writers + profiler hooks.

Replicates the reference's observability surface (gc_trainer.py:120-134,
212-232): per-step scalars (train loss, loss dict, memory), periodic eval
images, config dump, and profiler setup. Backends: rich-less console, JSON
lines (always), TensorBoard via flax.metrics when available, and
``jax.profiler`` traces instead of the torch profiler.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class EventWriter:
    """Console + JSONL scalar writer with optional TensorBoard."""

    def __init__(self, log_dir: str | Path, use_tensorboard: bool = False, quiet: bool = False):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "events.jsonl", "a")
        self._t0 = time.time()
        self.quiet = quiet
        self._tb = None
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(str(self.log_dir / "tb"))
            except Exception:
                self._tb = None

    def put_config(self, config) -> None:
        try:
            import dataclasses

            blob = dataclasses.asdict(config)
        except TypeError:
            blob = repr(config)
        (self.log_dir / "config.json").write_text(json.dumps(blob, default=str, indent=1))

    def put_scalars(self, step: int, scalars: dict) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 2)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)
        if not self.quiet:
            body = "  ".join(f"{k} {float(v):.4f}" for k, v in scalars.items())
            print(f"step {step:6d}  {body}")

    def put_image(self, step: int, name: str, image) -> None:
        import numpy as np
        from PIL import Image

        img8 = (np.clip(np.asarray(image), 0, 1) * 255).astype("uint8")
        Image.fromarray(img8).save(self.log_dir / f"{name}_{step:06d}.png")
        if self._tb is not None:
            self._tb.image(name, img8, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Profiler:
    """jax.profiler trace wrapper (the torch-profiler equivalent)."""

    def __init__(self, log_dir: str | Path, enabled: bool = False):
        self.log_dir = str(Path(log_dir) / "profile")
        self.enabled = enabled
        self._active = False

    def start(self) -> None:
        if self.enabled and not self._active:
            import jax

            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def stop(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    def annotate(self, name: str):
        import jax

        return jax.profiler.TraceAnnotation(name)
