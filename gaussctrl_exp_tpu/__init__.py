"""gaussctrl_exp_tpu — TPU-native differentiable 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GaussCtrl
reference (``Ubinya/gaussctrl_exp``): differentiable 3DGS rendering (EWA
projection, SH color, tile binning + depth sort, front-to-back alpha blending),
a 3DGS training loop with on-device densify/prune, multi-chip sharding via
``jax.sharding`` + ``shard_map``, and the text-driven GaussCtrl editing loop.

Layout:
  ops/       — the compute path: projection, SH, binning, blend (jnp oracle +
               Pallas kernels with hand-written VJPs)
  models/    — Gaussian parameter pytrees, render model, densify/prune
  data/      — dataparser (transforms.json/ply), datamanager (view subsetting)
  engine/    — training loop, optimizers, checkpointing
  parallel/  — device-mesh sharded render/train paths
  diffusion/ — Flax Stable-Diffusion + ControlNet editing stack
  cli/       — train/render entry points
"""

__version__ = "0.1.0"

import os as _os


def _ensure_tpu_flags() -> None:
    """Raise libtpu's scoped-VMEM ceiling (default 16 MiB; v5e has 128 MiB of
    VMEM) so the blend backward kernel's vector stack fits without spilling to
    HBM. Must run before the first JAX computation creates the TPU client —
    importing this package before computing (the normal pattern) suffices.
    Appends, never overwrites, so user-provided LIBTPU_INIT_ARGS survive."""
    flag = "--xla_tpu_scoped_vmem_limit_kib"
    cur = _os.environ.get("LIBTPU_INIT_ARGS", "")
    if flag not in cur:
        _os.environ["LIBTPU_INIT_ARGS"] = (cur + f" {flag}=65536").strip()
        # the append is silently ineffective if a TPU client already exists
        # (the flag is read at client creation) — make that case detectable
        import sys as _sys

        jax_mod = _sys.modules.get("jax")
        if jax_mod is not None:
            try:
                import jax._src.xla_bridge as _xb

                if getattr(_xb, "_backends", None):
                    import warnings

                    warnings.warn(
                        "gaussctrl_exp_tpu imported after a JAX backend was "
                        f"created: {flag} will not take effect; import the "
                        "package before the first JAX computation to avoid "
                        "VMEM spills in the blend backward kernel",
                        stacklevel=3,
                    )
            except Exception:
                pass


_ensure_tpu_flags()
