"""Slope-timed ablation of the blend backward: Pallas kernel vs reduction.

Calls blend_pallas internals directly with fixed cotangents; cumulative rows.
Usage: python scripts/bench_bwd_micro.py [N] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops import binning as B
from gaussctrl_exp_tpu.ops import blend_pallas as bp
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.projection import project_gaussians

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 18
TX = TY = (S + 15) // 16
K_LO, K_HI = 5, 50

rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.8)
scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.5 - 4.2))
quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
colors = jnp.asarray(rng.uniform(0, 1, (N, 4)).astype(np.float32))
opacs = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)), S * 1.05, S * 1.05, S / 2, S / 2, S, S
)
vm, pm, fm = camera_matrices(cam)
g_img_c = jnp.asarray(rng.normal(size=(S, S, 4)).astype(np.float32))
g_T_c = jnp.asarray(rng.normal(size=(S, S)).astype(np.float32))


def slope_time(stage_fn):
    walls = {}
    for K in (K_LO, K_HI):

        @jax.jit
        def run(m0):
            def body(i, acc):
                out = stage_fn(m0 + acc[:1, :1] * 1e-30)
                return acc + out.reshape(-1)[:4].reshape(2, 2).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(means))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


def _setup(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
    bins = bin_gaussians(p, TX, TY, CAP)
    ba = bp._bins_tuple(bins)
    out, res = bp._blend_core_fwd(
        p.xys, p.conics, colors, opacs, ba, S, S, CAP, bins.aligned_capacity, False
    )
    return out, res, ba, bins


def fwd_only(m):
    out, res, ba, bins = _setup(m)
    return out[0][:2, :2, 0] + out[1][:2, :2]


def _bwd_pieces(m, upto):
    out, res, ba, bins = _setup(m)
    vals, out_tiles, bins_arrays, Nn = res
    gid_end, nt_orig, tile_cnt, chunk_tile, chunk_base, chunk_cnt, aligned_gid = ba
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chan = 4
    ns = bins.aligned_capacity // (bp.SUPER * bp.CHUNK)
    gout = bp._image_to_tiles(g_img_c, g_T_c, TY, TX, n_chan)
    # mirror of _blend_core_bwd's superstep grid spec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((bp.NFIELD, bp.SUPER * bp.CHUNK), lambda s, ct, cb, cc_: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp.GP, 16), lambda s, ct, cb, cc_: (ct[s * bp.SUPER] // bp.GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp.GP, 8), lambda s, ct, cb, cc_: (ct[s * bp.SUPER] // bp.GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bp.NFIELD, bp.SUPER * bp.CHUNK), lambda s, ct, cb, cc_: (0, s),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bp.GP, 8), jnp.float32), pltpu.SMEM((bp.GROUP,), jnp.int32)],
    )
    slot_grads = pl.pallas_call(
        functools.partial(bp._bwd_kernel, tiles_x=TX, n_chan=n_chan),
        out_shape=jax.ShapeDtypeStruct((bp.NFIELD, bins.aligned_capacity), jnp.float32),
        grid_spec=grid_spec,
    )(chunk_tile, chunk_base, chunk_cnt, vals, out_tiles, gout)
    if upto == 1:
        return slot_grads[:2, :2]

    nrow = 6 + n_chan
    from gaussctrl_exp_tpu.ops.scan2d import cumsum_rows

    reordered = jax.lax.sort(
        (aligned_gid,) + tuple(slot_grads[r] for r in range(nrow)),
        num_keys=1, is_stable=True,
    )
    sg_slot = jnp.stack(reordered[1:], axis=0)[:, :CAP]
    prefix = cumsum_rows(sg_slot)
    if upto == 2:
        return prefix[:2, -2:]

    hi_vals = prefix[:, gid_end]
    lo_vals = jnp.concatenate([jnp.zeros((nrow, 1), hi_vals.dtype), hi_vals[:, :-1]], axis=1)
    g_orig = jnp.where((nt_orig > 0)[None, :], hi_vals - lo_vals, 0.0)
    return g_orig[:2, :2]


if __name__ == "__main__":
    print(f"N={N} S={S} CAP={CAP} — cumulative slope-timed ms")
    print(f"fwd (core, incl binning):      {slope_time(fwd_only):8.2f}")
    print(f"+ bwd pallas kernel:           {slope_time(lambda m: _bwd_pieces(m, 1)):8.2f}")
    print(f"+ sort+cumsum reduction:       {slope_time(lambda m: _bwd_pieces(m, 2)):8.2f}")
    print(f"+ gathers+unsort (full bwd):   {slope_time(lambda m: _bwd_pieces(m, 3)):8.2f}")
