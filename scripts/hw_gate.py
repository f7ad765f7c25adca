"""Hardware gate: MUST pass on the real chip before any snapshot/commit that
touches kernel or sharding code. Interpret-mode green is NOT sufficient —
Mosaic lowering has constraints (128-lane store alignment, scoped-VMEM stack
limits) that the CPU interpreter never exercises (round-2 postmortem:
VERDICT.md "What's weak" #1-3).

Checks (~2-3 min total, compiles dominate):
  1. BENCH_FAST bench: full fwd+bwd train step through the Pallas kernels
     at the headline bear config — the exact thing the driver runs.
  2. Sharded train step on a 1x1 mesh with the Pallas band blend — exercises
     the shard_map + custom-VJP + Mosaic lowering combination on hardware.

Usage: python scripts/hw_gate.py   (exit 0 = green)
"""

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

ROOT = Path(__file__).parent.parent


def check_bench() -> None:
    import os

    out = subprocess.run(
        [sys.executable, "-u", str(ROOT / "bench.py")],
        env={**os.environ, "BENCH_FAST": "1"},
        capture_output=True, text=True, timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    assert out.returncode == 0 and line.startswith("{"), (
        f"bench.py failed rc={out.returncode}\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )
    print(f"[hw_gate] bench OK: {line}")


def check_sharded_pallas() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gaussctrl_exp_tpu.cameras import look_at, make_camera
    from gaussctrl_exp_tpu.models.gaussians import init_random
    from gaussctrl_exp_tpu.parallel.sharded import (
        ShardedRenderConfig, make_mesh, make_sharded_train_step, shard_params,
    )

    assert jax.default_backend() != "cpu", "hw_gate must run on the TPU"
    mesh = make_mesh(data=1, model=1)
    H = W = 512
    gs = init_random(8192, capacity=8192, sh_degree=1, seed=0)
    cam = make_camera(look_at(np.array([0.0, -4.0, 1.0]), np.zeros(3)),
                      W * 1.1, W * 1.1, W / 2, H / 2, W, H)
    camera_arrays = tuple(
        jnp.stack([v]) for v in (cam.c2w, cam.fx, cam.fy, cam.cx, cam.cy)
    )
    gt = jnp.zeros((1, H, W, 3), jnp.float32)
    cfg = ShardedRenderConfig(height=H, width=W, isect_capacity_per_device=1 << 15,
                              sh_degree=1, impl="pallas")
    opt = optax.adam(1e-3)
    params, alive = shard_params(gs.params, gs.alive, mesh)
    step_fn = make_sharded_train_step(mesh, cfg, opt)
    params, _, loss = step_fn(params, alive, opt.init(params), camera_arrays, gt, jnp.int32(0))
    loss = float(jax.device_get(loss))
    assert np.isfinite(loss), f"sharded pallas step loss={loss}"
    print(f"[hw_gate] sharded 1x1-mesh pallas step OK: loss={loss:.4f}")


if __name__ == "__main__":
    check_bench()
    check_sharded_pallas()
    print("[hw_gate] GREEN")
