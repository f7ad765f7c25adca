"""Multi-device / multi-host scaling benchmark (BASELINE config 5 harness).

Measures the sharded train step (parallel/sharded.py) at mesh sizes 1, 2, 4, 8
and reports per-step time + scaling efficiency vs the 1-device run. On a real
pod slice run it as-is (devices = TPU chips over ICI); on a dev box it runs on
the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8),
which validates the collective program but NOT interconnect bandwidth.

Usage:
  python scripts/bench_scaling.py [n_gaussians] [image_size]

Multi-host (run the SAME command on every host of the slice — a pod owner
needs to change nothing else; on TPU pods jax.distributed auto-detects, or
set GCTPU_COORDINATOR/GCTPU_NUM_PROCESSES/GCTPU_PROCESS_ID explicitly):
  python scripts/bench_scaling.py --multihost [n_gaussians] [image_size]
This benches the global (data=hosts, model=local-devices) mesh: the per-step
payload all-gather/reduce-scatter stays on ICI within each host, only the
scalar loss pmean crosses DCN (parallel/distributed.py).
"""

import os
import sys
import time

MULTIHOST = "--multihost" in sys.argv
if MULTIHOST:
    sys.argv.remove("--multihost")

if not MULTIHOST and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# On a real pod slice set SCALING_BACKEND=native to use the TPU mesh; the
# default is the virtual CPU mesh (this dev environment has one tunneled chip,
# and querying jax.devices() would commit the backend before we could switch).
if not MULTIHOST and os.environ.get("SCALING_BACKEND") != "native":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.models.gaussians import init_random
from gaussctrl_exp_tpu.parallel.sharded import (
    ShardedRenderConfig,
    make_mesh,
    make_sharded_train_step,
    shard_params,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ITERS = 10


def bench_mesh(n_model: int, gs, cams, gt):
    mesh = make_mesh(data=1, model=n_model)
    cfg = ShardedRenderConfig(
        height=S, width=S, isect_capacity_per_device=1 << 16, sh_degree=1
    )
    opt = optax.adam(1e-3)
    params, alive = shard_params(gs.params, gs.alive, mesh)
    opt_state = opt.init(params)
    step_fn = make_sharded_train_step(mesh, cfg, opt)
    p, o = params, opt_state
    p, o, loss = step_fn(p, alive, o, cams, gt, jnp.int32(0))  # compile
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(ITERS):
        p, o, loss = step_fn(p, alive, o, cams, gt, jnp.int32(i + 1))
    jax.block_until_ready(loss)
    return (time.time() - t0) / ITERS * 1e3


def bench_global_mesh(mesh, gs, cams, gt, impl="jnp"):
    cfg = ShardedRenderConfig(
        height=S, width=S, isect_capacity_per_device=1 << 16, sh_degree=1, impl=impl
    )
    opt = optax.adam(1e-3)
    params, alive = shard_params(gs.params, gs.alive, mesh)
    opt_state = opt.init(params)
    step_fn = make_sharded_train_step(mesh, cfg, opt)
    p, o = params, opt_state
    p, o, loss = step_fn(p, alive, o, cams, gt, jnp.int32(0))  # compile
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(ITERS):
        p, o, loss = step_fn(p, alive, o, cams, gt, jnp.int32(i + 1))
    jax.block_until_ready(loss)
    return (time.time() - t0) / ITERS * 1e3, float(loss)


def _scene():
    gs = init_random(N, capacity=1 << (N - 1).bit_length(), sh_degree=1, seed=0)
    cam = make_camera(
        look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)), S * 1.05, S * 1.05, S / 2, S / 2, S, S
    )
    return gs, cam


def main():
    n_dev = len(jax.devices())
    print(f"backend={jax.default_backend()} devices={n_dev}  N={N} size={S}")
    gs, cam = _scene()
    cams = tuple(jnp.asarray(a)[None] for a in (cam.c2w, cam.fx, cam.fy, cam.cx, cam.cy))
    gt = jnp.zeros((1, S, S, 3))

    results = {}
    sizes = [m for m in (1, 2, 4, 8) if m <= n_dev and (S // m) % 16 == 0]
    for m in sizes:
        ms = bench_mesh(m, gs, cams, gt)
        results[m] = ms
        eff = results[1] / (ms * m) if 1 in results else float("nan")
        print(f"model={m}: {ms:8.2f} ms/step   efficiency vs 1-dev: {eff:.2f}")

    if 2 in results:
        print(
            f"\n2-device scaling efficiency: {results[1] / (results[2] * 2):.2f} "
            f"(target >= 0.8 on real ICI; CPU-mesh numbers are correctness-only)"
        )


def main_multihost():
    from gaussctrl_exp_tpu.parallel.distributed import (
        initialize_distributed,
        is_main_process,
        make_global_mesh,
    )

    initialize_distributed()
    n_proc = jax.process_count()
    mesh = make_global_mesh()  # (data=hosts, model=local devices)
    if is_main_process():
        print(
            f"backend={jax.default_backend()} processes={n_proc} "
            f"global_devices={len(jax.devices())} mesh={dict(mesh.shape)}  N={N} size={S}"
        )

    gs, cam = _scene()
    B = mesh.shape["data"]
    cams = tuple(
        jnp.stack([jnp.asarray(a)] * B) for a in (cam.c2w, cam.fx, cam.fy, cam.cx, cam.cy)
    )
    gt = jnp.zeros((B, S, S, 3))
    impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    ms, loss = bench_global_mesh(mesh, gs, cams, gt, impl=impl)
    if is_main_process():
        per_host = ms
        print(f"multihost step ({impl} blend): {per_host:8.2f} ms/step  loss={loss:.5f}")
        print(
            "compare against a 1-host run of the same command to get the "
            ">=0.8-at-2-hosts efficiency figure (BASELINE scaling row)"
        )


if __name__ == "__main__":
    main_multihost() if MULTIHOST else main()
