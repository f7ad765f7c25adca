# Developer workflow targets. `make hooks` once per clone enables the
# hardware-gate pre-commit mechanism (VERDICT r3 item 7).
.PHONY: test test-all gate bench hooks

test:  ## fast CPU test suite (slow tests deselected)
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -m pytest tests/ -x -q -m "not slow"

test-all:  ## full CPU test suite
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -m pytest tests/ -x -q

gate:  ## on-chip hardware gate (bench + sharded pallas + PSNR overfit)
	python scripts/hw_gate.py

bench:  ## headline driver bench (fast config)
	BENCH_FAST=1 python bench.py

hooks:  ## enable the committed git hooks (hw-gate pre-commit)
	git config core.hooksPath .githooks
