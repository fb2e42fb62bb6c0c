# Developer entry points (see README for the full CLI contract).

.PHONY: test test-fast bench profile dryrun lint parity-offline warm

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

# environment-blocked parity gates (Praat f0 delta 0.97/10 Hz, MCD vs the
# released ckpts 0.1 dB) — run where parselmouth / the released checkpoints
# exist; env vars: NSVB_WAV_DIR, NSVB_REF_CKPT, NSVB_BIN_DIR (see
# scripts/parity_offline.py)
parity-offline:  ## offline parity gates (needs parselmouth / released ckpts)
	python scripts/parity_offline.py

# On a remote-relay TPU (cold Mosaic/XLA compiles cost minutes each), run
# this once after any code change so subsequent bench/CI runs hit the
# persistent compilation cache (~/.cache/nsvb_xla_cache) instead of paying
# the cold-compile bill inside a deadline-bounded run.
warm:            ## pre-compile the benched programs into the XLA cache
	NSVB_CACHE_MIN_COMPILE_SECS=0 python -c "import jax, numpy as np; \
	  import sys; sys.path.insert(0, '.'); \
	  from __graft_entry__ import entry; fn, a = entry(); \
	  out = jax.jit(fn)(*a); float(np.asarray(out[0]).sum()); \
	  print('entry() warm')"
	NSVB_BENCH_DEADLINE_S=5400 python bench.py >/dev/null && echo "bench warm"
