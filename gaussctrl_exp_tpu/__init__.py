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
