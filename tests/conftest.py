"""Test harness: force a virtual 8-device CPU mesh so sharding tests run anywhere.

Must set XLA flags before jax initializes (hence module import side effects).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel) which
# would make every test compile remotely; tests must be hermetic + fast. The
# axon sitecustomize locks the platform via jax.config, so env vars alone are
# not enough — we must override jax.config after import (below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

# Persistent compilation cache: the suite is compile-dominated (tiny shapes,
# many jits); caching XLA:CPU executables across runs cuts repeat wall-clock
# sharply. Keyed by HLO hash — safe across code changes.
jax.config.update("jax_compilation_cache_dir", "/tmp/gctpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_test_scene(rng, n=64, spread=1.0, seed_colors=True):
    """A small random cloud of gaussians in front of the default camera."""
    means = rng.normal(size=(n, 3)).astype(np.float32) * spread
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 2.5)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opacs = rng.uniform(0.2, 0.95, size=n).astype(np.float32)
    return means, scales, quats, colors, opacs


@pytest.fixture
def small_scene(rng):
    return make_test_scene(rng)


@pytest.fixture
def default_camera():
    from gaussctrl_exp_tpu.cameras import look_at, make_camera

    c2w = look_at(np.array([0.0, -4.0, 0.0]), np.array([0.0, 0.0, 0.0]))
    H = W = 64
    f = 80.0
    return make_camera(c2w, fx=f, fy=f, cx=W / 2, cy=H / 2, width=W, height=H)
