"""Multi-host bootstrap + global mesh construction.

The reference has only dead torch-DDP plumbing (world_size/local_rank threaded
through /root/reference/gaussctrl/gc_trainer.py:52, ad_pipeline.py:290-291 —
never exercised). This module provides the real thing for TPU pods:
``jax.distributed.initialize`` driven by environment variables (or TPU
auto-detection), and a global 2-axis ``(data, model)`` mesh laid out so the
``model`` axis — which carries the per-step payload all-gather and gradient
reduce-scatter of parallel/sharded.py — stays WITHIN a host (ICI), while the
``data`` axis (one camera per group; only a scalar loss pmean crosses it)
spans hosts (DCN). That matches the bandwidth hierarchy: heavy collectives on
ICI, scalar traffic on DCN.

Environment (all optional — on a real TPU pod slice, calling
``initialize_distributed()`` with none of them set lets JAX auto-detect):

  GCTPU_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
  GCTPU_NUM_PROCESSES total process count
  GCTPU_PROCESS_ID    this process's rank

CPU multi-process testing (tests/test_multihost.py) sets the same variables
plus JAX_CPU_COLLECTIVES_IMPLEMENTATION=gloo and a forced host device count.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Env-driven ``jax.distributed.initialize``. Returns True if a multi-
    process runtime was started (or already is), False for single-process.

    Idempotent: safe to call when already initialized."""
    import jax

    coordinator = coordinator or os.environ.get("GCTPU_COORDINATOR")
    num_str = os.environ.get("GCTPU_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None
    )
    pid_str = os.environ.get("GCTPU_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None
    )

    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return jax.process_count() > 1

    if coordinator is None and num_processes is None:
        # On TPU pod slices jax.distributed.initialize() auto-detects from the
        # TPU metadata; on anything else there is nothing to do.
        if jax.default_backend() == "tpu" and int(os.environ.get("TPU_NUM_PROCESSES", "1")) > 1:
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_global_mesh(data: int | None = None, model: int | None = None):
    """Global ``(data, model)`` mesh over all processes' devices.

    Default shape: ``data`` = number of processes (hosts), ``model`` = local
    devices per host — so the model axis's all-gather/reduce-scatter ride ICI
    and only the data-axis scalar pmean crosses DCN. Pass explicit sizes to
    override (their product must equal the device count used).

    Device order: rows of the mesh are processes (JAX global device order
    groups by process id), so reshape(data, model) puts each host's devices
    in one model group when data == process_count.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_proc = jax.process_count()
    local = len(devices) // n_proc
    if data is None and model is None:
        data, model = n_proc, local
    elif data is None:
        data = len(devices) // model
    elif model is None:
        model = len(devices) // data
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}"
    )
    if data * model == len(devices) and data % n_proc == 0:
        # host-major layout: (hosts, local) → (data, model) with each host's
        # devices contiguous along 'model'
        devs = np.asarray(devices).reshape(data, model)
    else:
        devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, axis_names=("data", "model"))


def process_index() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return process_index() == 0
