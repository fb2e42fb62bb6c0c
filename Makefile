# Developer entry points (see README for the full CLI contract).

.PHONY: test test-fast bench profile dryrun lint

test:            ## full suite on a virtual 8-device CPU mesh
	python -m pytest tests/ -q

test-fast:       ## <3 min: skip the slow (e2e / reference-parity) suites
	python -m pytest tests/ -q -m "not slow"

bench:           ## one-line JSON benchmark on the attached accelerator
	python bench.py

profile:         ## wall-vs-device breakdown of the flagship training step
	python scripts/profile_train.py --tiny

dryrun:          ## multi-chip sharding dry-run on a virtual 8-device CPU mesh
	XLA_FLAGS=--xla_force_host_platform_device_count=8 NSVB_PLATFORM=cpu \
	  JAX_PLATFORMS=cpu python -c "import sys; sys.path.insert(0, '.'); \
	  from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
