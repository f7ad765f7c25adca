"""Real spherical-harmonics color evaluation (degrees 0–4).

Replicates the behavior of gsplat v0.1.2's ``spherical_harmonics`` /
``num_sh_bases`` as called from /root/reference/gaussctrl/gc_model.py:196-201:
per-Gaussian view directions evaluated against SH coefficients laid out as
``[dc, rest]`` along axis 1; degrees above ``degree`` are masked out (the
reference passes the *active* degree n = min(step // interval, sh_degree) and
the kernel ignores higher-order coefficients). Pure jnp — differentiable to the
coefficients and fused by XLA; this is elementwise VPU work, no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) unit view directions → (N, (degree+1)^2) SH basis values.

    ``degree`` is static (max degree compiled in). Use :func:`eval_sh` with a
    traced ``active_degree`` for the reference's degree schedule.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, SH_C0)]
    if degree >= 1:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        out += [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3.0 * xx - yy),
            SH_C4[2] * xy * (7.0 * zz - 1.0),
            SH_C4[3] * yz * (7.0 * zz - 3.0),
            SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SH_C4[5] * xz * (7.0 * zz - 3.0),
            SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SH_C4[7] * xz * (xx - 3.0 * yy),
            SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(
    active_degree,
    dirs: jnp.ndarray,
    coeffs: jnp.ndarray,
) -> jnp.ndarray:
    """Evaluate SH colors with a (possibly traced) active degree.

    Args:
      active_degree: int or traced scalar in [0, max_degree]; bases of SH degree
        > active_degree are masked to zero (matching gsplat's ``degrees_to_use``).
      dirs: (N, 3) unit directions.
      coeffs: (N, K, 3) with K = (max_degree+1)^2, ordered [dc, rest].

    Returns (N, 3) colors (without the reference's ``+0.5`` shift — the model
    layer applies ``clamp(rgbs + 0.5, min=0)`` like gc_model.py:201).
    """
    K = coeffs.shape[-2]
    max_degree = int(round(K**0.5)) - 1
    basis = sh_basis(max_degree, dirs)  # (N, K)
    # degree of each basis index: l such that l^2 <= idx < (l+1)^2
    idx = jnp.arange(K)
    lvl = jnp.floor(jnp.sqrt(idx.astype(jnp.float32) + 1e-6)).astype(jnp.int32)
    mask = (lvl <= active_degree).astype(basis.dtype)
    # broadcast-multiply + reduce instead of einsum: a per-N batched (1,K)@(K,3)
    # einsum lowers to N tiny MXU matmuls (measured ~1.4 ms at N=35k — same
    # pathology as projection's cov algebra); the elementwise form is VPU work
    # that XLA fuses, and its VJP to coeffs is an elementwise outer product
    return jnp.sum((basis * mask)[..., :, None] * coeffs, axis=-2)
