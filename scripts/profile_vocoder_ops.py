"""Per-op device-time breakdown of the flagship HiFiGAN-NSF vocoder
(xplane top-k). Attributes the 36.8 ms/call to resblocks vs upsample
ConvTransposes vs the NSF source vs everything else.

Usage: python scripts/profile_vocoder_ops.py [n_frames] [fuse:on|off]
"""

import json
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402
from neuralsvb_tpu.utils.profiling import (profiler_trace,  # noqa: E402
                                           top_ops_from_xplane)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    fuse = sys.argv[2] if len(sys.argv) > 2 else "off"
    model, params, _ = bench._vocoder_model_and_params()
    model = model.clone(fuse_resblocks=fuse)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, n_frames, 80).astype(np.float32) - 2.0)
    f0 = jnp.full((1, n_frames), 220.0, jnp.float32)
    key = jax.random.PRNGKey(2)

    @jax.jit
    def run(params, mel, f0, key):
        return jnp.sum(model.apply({"params": params}, mel, f0,
                                   rngs={"noise": key}))

    for _ in range(2):
        out = run(params, mel, f0, key)
    float(jax.device_get(out))

    trace_dir = tempfile.mkdtemp(prefix="nsvb_vocops_")
    with profiler_trace(trace_dir):
        o = None
        for i in range(2):
            o = run(params, mel + (0.0 if o is None else o * 0), f0,
                    jax.random.fold_in(key, i))
        float(jax.device_get(o))
    tops = top_ops_from_xplane(trace_dir, k=25)
    print(json.dumps({"fuse": fuse, "n_frames": n_frames}))
    for name, sec in tops:
        print(f"{sec * 1e3 / 2:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
