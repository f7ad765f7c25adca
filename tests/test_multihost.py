"""Multi-host (2-process) distributed path: jax.distributed bootstrap + the
sharded train step over a mesh that SPANS PROCESSES (data axis = hosts,
model axis = local devices), on CPU with gloo collectives.

The reference never exercised its DDP plumbing (gc_trainer.py:52); this is
the real multi-host path of SURVEY §5.8 / BASELINE's scaling row, validated
without a pod: two OS processes, 2 virtual CPU devices each, cross-process
collectives through the distributed runtime.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_train_step():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MH_LOSS")]
        assert lines, f"no MH_LOSS line in:\n{out[-2000:]}"
        losses.append(float(lines[0].split()[1]))

    # the loss is fully replicated: both processes must agree, be finite,
    # and be a plausible image loss (not zero, not huge)
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) < 1e-7, losses
    assert 1e-4 < losses[0] < 10.0, losses


def test_initialize_noop_single_process():
    """Without env/coordinator, initialize_distributed is a clean no-op."""
    from gaussctrl_exp_tpu.parallel.distributed import initialize_distributed

    assert initialize_distributed() is False


def test_make_global_mesh_single_process():
    from gaussctrl_exp_tpu.parallel.distributed import make_global_mesh

    mesh = make_global_mesh()  # 1 process x 8 virtual devices
    assert dict(mesh.shape) == {"data": 1, "model": 8}
    mesh = make_global_mesh(data=2, model=4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
