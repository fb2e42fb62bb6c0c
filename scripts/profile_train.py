"""Wall-vs-device breakdown of the flagship training steps.

Runs the fused generator(+disc) / discriminator / latent-map steps a few
times under a jax.profiler trace and prints, per step kind, the wall time and
the device busy time parsed from the xplane capture — separating XLA compute
from host dispatch/tunnel overhead (see README 'Benchmarks').

Usage: python scripts/profile_train.py [--tiny] [--steps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--top-ops", type=int, default=0, metavar="K",
                    help="also print the K most expensive device ops per step")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--frames", type=int, default=1536)
    ap.add_argument("--batch", type=int, default=12)
    args = ap.parse_args()

    from __graft_entry__ import _batch, _flagship_hparams
    from neuralsvb_tpu.hparams import hparams
    from neuralsvb_tpu.utils.profiling import (device_busy_from_xplane,
                                               profiler_trace,
                                               top_ops_from_xplane)

    hp = _flagship_hparams(tiny=args.tiny)
    hp.update(mesh_shape="data:1", phase_2_steps=10 ** 6)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    B = args.batch if not args.tiny else 2
    T = args.frames if not args.tiny else 64
    batch = _batch(B, T, T)
    batch["nsamples"] = B

    import jax

    def cycle(step):
        # one full training iteration: fused gen+disc dispatch, disc update,
        # and (phase 3) the latent-map step
        for opt in range(task.num_optimizers):
            task.training_step(batch, step, opt)

    def measure(run_once, iters_per_call, n_calls):
        """Wall from an UNPROFILED steady-state loop (profiler start/stop
        costs seconds through the tunnel and must not pollute the number);
        device busy from a separate short profiled run."""
        run_once()  # warm: compile + first un-overlapped transfer
        jax.block_until_ready(task.state)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            run_once()
        jax.block_until_ready(task.state)
        wall = (time.perf_counter() - t0) / (n_calls * iters_per_call)
        trace_dir = tempfile.mkdtemp(prefix="nsvb_prof_")
        with profiler_trace(trace_dir):
            run_once()
            jax.block_until_ready(task.state)
        busy = device_busy_from_xplane(trace_dir)
        dev = max((v for k, v in busy.items() if "host" not in k.lower()),
                  default=max(busy.values(), default=0.0)) / iters_per_call
        if args.top_ops:
            for name, sec in top_ops_from_xplane(trace_dir, args.top_ops):
                print(f"    {sec / iters_per_call * 1e3:8.2f} ms/iter  {name[:90]}")
        return wall, dev

    for name, step in [("gen+disc (phase 2)", 5), ("full+map (phase 3)", 10 ** 6 + 5)]:
        wall, dev = measure(lambda: cycle(step), 1, args.steps)
        print(f"| {name}: wall {wall * 1e3:.1f} ms/iter, "
              f"device busy {dev * 1e3:.1f} ms/iter "
              f"(wall/device {wall / max(dev, 1e-9):.2f}x; gap is host "
              f"dispatch / transfer / tunnel)")

    # fused K-step cycle: one lax.scan dispatch per K iterations; transfers
    # of window N+1 overlap device compute of window N
    K = args.steps
    for name, step in [("gen+disc cycle (phase 2)", 5),
                       ("map cycle (phase 3)", 10 ** 6 + 5)]:
        batches = [batch] * K
        wall, dev = measure(lambda: task.training_cycle(batches, step), K, 3)
        print(f"| {name} K={K}: wall {wall * 1e3:.1f} ms/iter, "
              f"device busy {dev * 1e3:.1f} ms/iter "
              f"(wall/device {wall / max(dev, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
