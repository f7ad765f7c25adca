"""Worker process for the 2-process CPU multi-host test (test_multihost.py).

Usage: python tests/_multihost_worker.py <process_id> <port>
Prints one line: MH_LOSS <loss>   (after one sharded train step on the
global (data=2 hosts, model=2 local devices) mesh).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["GCTPU_COORDINATOR"] = f"localhost:{port}"
    os.environ["GCTPU_NUM_PROCESSES"] = "2"
    os.environ["GCTPU_PROCESS_ID"] = str(pid)

    from gaussctrl_exp_tpu.parallel.distributed import (
        initialize_distributed,
        make_global_mesh,
    )

    assert initialize_distributed()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 hosts x 2 local

    import jax.numpy as jnp
    import numpy as np
    import optax

    from gaussctrl_exp_tpu.cameras import look_at, make_camera
    from gaussctrl_exp_tpu.models.gaussians import init_random
    from gaussctrl_exp_tpu.parallel.sharded import (
        ShardedRenderConfig,
        make_sharded_train_step,
        shard_params,
    )

    mesh = make_global_mesh()  # (data=2 hosts, model=2 local)
    assert dict(mesh.shape) == {"data": 2, "model": 2}

    H = W = 64
    B = 2
    gs = init_random(256, capacity=512, sh_degree=1, seed=0)
    cams = []
    for i in range(B):
        ang = 0.5 * i
        eye = np.array([4.0 * np.sin(ang), -4.0 * np.cos(ang), 1.0])
        cams.append(make_camera(look_at(eye, np.zeros(3)), W * 1.1, W * 1.1, W / 2, H / 2, W, H))
    camera_arrays = (
        jnp.stack([c.c2w for c in cams]),
        jnp.stack([c.fx for c in cams]),
        jnp.stack([c.fy for c in cams]),
        jnp.stack([c.cx for c in cams]),
        jnp.stack([c.cy for c in cams]),
    )
    rng = np.random.default_rng(7)
    gt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))

    cfg = ShardedRenderConfig(height=H, width=W, isect_capacity_per_device=1 << 12, sh_degree=1)
    opt = optax.adam(1e-3)
    params, alive = shard_params(gs.params, gs.alive, mesh)
    opt_state = opt.init(params)
    step_fn = make_sharded_train_step(mesh, cfg, opt)
    params, opt_state, loss = step_fn(params, alive, opt_state, camera_arrays, gt, jnp.int32(0))
    jax.block_until_ready(loss)
    print(f"MH_LOSS {float(loss):.8f}", flush=True)


if __name__ == "__main__":
    main()
