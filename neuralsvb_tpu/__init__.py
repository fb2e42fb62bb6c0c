"""NeuralSVB-TPU: a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-beautification framework.

A ground-up rebuild of the capabilities of MoonInTheRiver/NeuralSVB ("Learning the
Beauty in Songs", ACL 2022) designed for TPU hardware:

- compute path: JAX + Flax modules compiled by XLA, hot DSP ops as fused
  JAX/Pallas kernels (STFT+mel, SSIM, DTW wavefront)
- parallelism: SPMD data parallelism over a ``jax.sharding.Mesh`` (pjit),
  replacing the reference's NCCL DDP (reference: utils/trainer.py:462-466)
- runtime: host-side trainer with per-optimizer jitted train steps, orbax
  checkpoints, TensorBoard logging
- native path: C++ DTW dynamic-programming kernel (ctypes) replacing the
  reference's numba JIT (reference: modules/voice_conversion/dtw/align.py:8-37)

Layer map mirrors SURVEY.md section 1: hparams (L0), ops/utils (L1), models
(L2-L3), DTW (L4), data (L5), vocoders (L6), training+tasks (L7), CLI (L8).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("NSVB_COMPILATION_CACHE", "1") != "0":
    # Persistent XLA compilation cache: repeated CLI invocations (train,
    # resume, infer) reuse compiled programs instead of paying 1-3 min
    # per step shape on the TPU tunnel. Disable with NSVB_COMPILATION_CACHE=0.
    import jax as _jax_cc

    _cache_dir = _os.environ.get("NSVB_CACHE_DIR",
                                 _os.path.expanduser("~/.cache/nsvb_xla_cache"))
    try:
        _jax_cc.config.update("jax_compilation_cache_dir", _cache_dir)
        # Threshold 0 caches even tiny op-by-op (eager) compiles — the test
        # suite sets it to 0 so repeat runs skip XLA:CPU compilation almost
        # entirely; CLI runs keep the 1s default (only jitted steps matter).
        _jax_cc.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(_os.environ.get("NSVB_CACHE_MIN_COMPILE_SECS", "1.0")))
    except Exception:
        pass

if _os.environ.get("NSVB_PLATFORM"):
    # Force a JAX platform (e.g. NSVB_PLATFORM=cpu for host-only smoke runs)
    # before any backend is initialized. Overrides ambient plugin registration.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["NSVB_PLATFORM"])
