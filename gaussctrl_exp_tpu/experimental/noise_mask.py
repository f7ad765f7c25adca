"""Multi-view-consistent 3D noise masks (TPU rebuild of the OpenGL renderer).

The reference's ``MultiVeiwNoiseRenderer`` (/root/reference/gaussctrl/ad_render.py:195-334,
ad_noise.py:55-108) thresholds a Perlin field on a 100³ grid inside a 2-unit
cube (threshold 0.8), renders the surviving points as GLSL-instanced spheres
(radius 0.015), and keeps only fragments whose depth matches the 3DGS depth
map within a 0.016 window — producing a 3D-anchored, multi-view-consistent
noise mask over the scene surface.

Here the GLSL pipeline is replaced by the framework's own differentiable
rasterizer: each surviving noise point becomes an isotropic Gaussian splat,
the depth-texture visibility test becomes a gather from the rendered depth
map at the projected centers, and the whole render is one jittable call — no
pygame/GLUT/offscreen-context machinery.

The Perlin field is a from-scratch numpy gradient-noise implementation (the
reference uses the C `noise` package's ``pnoise3``), deterministic per seed.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, camera_matrices, view_matrix
from ..ops.projection import project_gaussians
from ..ops.renderer import RenderConfig, render


def _fade(t: np.ndarray) -> np.ndarray:
    return t * t * t * (t * (t * 6 - 15) + 10)


def perlin_noise_3d(
    shape: tuple[int, int, int],
    scale: float = 0.2,
    octaves: int = 1,
    persistence: float = 1.0,
    lacunarity: float = 2.0,
    seed: int = 99,
    normalize: bool = True,
) -> np.ndarray:
    """Classic 3D Perlin gradient noise on a grid, vectorized numpy.

    Parameter names/defaults mirror ``gen_perlin_noise`` (ad_noise.py:71-108)
    and the renderer's operating point (scale 0.2, seed 99, ad_render.py:205-207).
    """
    rng = np.random.default_rng(seed)
    out = np.zeros(shape, np.float64)
    amp, freq = 1.0, scale
    for _ in range(max(octaves, 1)):
        out += amp * _perlin_octave(shape, freq, rng)
        amp *= persistence
        freq *= lacunarity
    if normalize:
        lo, hi = out.min(), out.max()
        out = (out - lo) / max(hi - lo, 1e-12)
    return out


def _perlin_octave(shape, freq: float, rng) -> np.ndarray:
    # sample coordinates in lattice space
    coords = [np.arange(n) * freq for n in shape]
    X, Y, Z = np.meshgrid(*coords, indexing="ij")
    xi, yi, zi = (np.floor(v).astype(int) for v in (X, Y, Z))
    xf, yf, zf = X - xi, Y - yi, Z - zi

    # gradients at lattice corners via a permutation-hash (classic Perlin)
    perm = rng.permutation(256)
    perm = np.concatenate([perm, perm])
    grads = rng.normal(size=(256, 3))
    grads /= np.linalg.norm(grads, axis=1, keepdims=True)

    def g(ix, iy, iz):
        h = perm[perm[perm[ix & 255] + (iy & 255)] + (iz & 255)]
        return grads[h]

    def dot(ix, iy, iz, dx, dy, dz):
        gr = g(ix, iy, iz)
        return gr[..., 0] * dx + gr[..., 1] * dy + gr[..., 2] * dz

    u, v, w = _fade(xf), _fade(yf), _fade(zf)
    n000 = dot(xi, yi, zi, xf, yf, zf)
    n100 = dot(xi + 1, yi, zi, xf - 1, yf, zf)
    n010 = dot(xi, yi + 1, zi, xf, yf - 1, zf)
    n110 = dot(xi + 1, yi + 1, zi, xf - 1, yf - 1, zf)
    n001 = dot(xi, yi, zi + 1, xf, yf, zf - 1)
    n101 = dot(xi + 1, yi, zi + 1, xf - 1, yf, zf - 1)
    n011 = dot(xi, yi + 1, zi + 1, xf, yf - 1, zf - 1)
    n111 = dot(xi + 1, yi + 1, zi + 1, xf - 1, yf - 1, zf - 1)
    nx00 = n000 * (1 - u) + n100 * u
    nx10 = n010 * (1 - u) + n110 * u
    nx01 = n001 * (1 - u) + n101 * u
    nx11 = n011 * (1 - u) + n111 * u
    nxy0 = nx00 * (1 - v) + nx10 * v
    nxy1 = nx01 * (1 - v) + nx11 * v
    return nxy0 * (1 - w) + nxy1 * w


@dataclasses.dataclass(frozen=True)
class NoiseMaskConfig:
    """Operating point of the reference renderer (ad_render.py:201-209)."""

    cube_size: float = 2.0
    resolution: int = 100
    noise_threshold: float = 0.8
    noise_seed: int = 99
    noise_scale: float = 0.2
    noise_unit_size: float = 0.015  # sphere radius (ad_render.py:208)
    frag_depth_threshold: float = 0.016  # depth visibility window (:209)


def noise_points(cfg: NoiseMaskConfig = NoiseMaskConfig()) -> np.ndarray:
    """Perlin-thresholded point cloud in the centered cube
    (``generate_uniform_points_in_cube`` + threshold, ad_render.py:227-231)."""
    r = cfg.resolution
    axis = np.linspace(-cfg.cube_size / 2, cfg.cube_size / 2, r)
    xx, yy, zz = np.meshgrid(axis, axis, axis)
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)
    field = perlin_noise_3d((r, r, r), scale=cfg.noise_scale, seed=cfg.noise_seed)
    return pts[field.ravel() > cfg.noise_threshold].astype(np.float32)


def render_noise_mask(
    points: np.ndarray,
    scene_depth: jnp.ndarray,  # (H, W) or (H, W, 1) view-space depth from the 3DGS render
    camera: Camera,
    cfg: NoiseMaskConfig = NoiseMaskConfig(),
    render_cfg: RenderConfig | None = None,
) -> jnp.ndarray:
    """(H, W) float mask in [0, 1]: noise spheres visible at the scene surface.

    Visibility = |point view-depth − scene depth at its pixel| < window
    (the GLSL fragment test, ad_render.py:443-470), applied per point before
    splatting isotropic Gaussians through the framework rasterizer.
    """
    H, W = camera.height, camera.width
    depth2d = jnp.asarray(scene_depth).reshape(H, W)
    n = points.shape[0]
    means = jnp.asarray(points, jnp.float32)
    scales = jnp.full((n, 3), cfg.noise_unit_size, jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (n, 1))
    opacs = jnp.ones((n,), jnp.float32)

    # depth test at projected centers: one cheap projection pass for centers
    vm, _, fm = camera_matrices(camera)
    proj = project_gaussians(
        means, scales, 1.0, quats, vm, fm, camera.fx, camera.fy,
        camera.cx, camera.cy, H, W,
    )
    px = jnp.clip(jnp.round(proj.xys[:, 0]).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.round(proj.xys[:, 1]).astype(jnp.int32), 0, H - 1)
    d_scene = depth2d[py, px]
    visible = proj.mask & (jnp.abs(proj.depths - d_scene) < cfg.frag_depth_threshold)

    out = render(
        means, scales, quats,
        jnp.ones((n, 3), jnp.float32),  # white spheres
        opacs, camera,
        background=jnp.zeros(3, jnp.float32),
        cfg=render_cfg or RenderConfig(impl="auto", isect_capacity=1 << 16, render_depth=False),
        extra_mask=visible,
    )
    return out.alpha[..., 0]
