# Convenience targets for image_captioning_ml_project_tpu.

.PHONY: smoke test bench multichip

# ~3-4 min CPU slice of every user surface: modern train/eval/demo CLI,
# serve HTTP round-trip, legacy train/validate/demo (scripts/smoke.py).
smoke:
	python scripts/smoke.py

# Full suite (~15-20 min, 8-device virtual CPU mesh via tests/conftest.py).
test:
	python -m pytest tests/ -x -q

# Driver benchmark (one JSON line; runs on the TPU when one is attached).
bench:
	python bench.py

# Multi-chip dry run on an 8-device virtual CPU mesh.
multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python __graft_entry__.py 8
