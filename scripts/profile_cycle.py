#!/usr/bin/env python
"""Break down where the fused K-step cycle's wall time goes on the real
chip: host pack (wire_pack + np.stack), device transfer (device_put of the
stacked [K, B, nbytes] buffer), and dispatch+compute (the lax.scan call,
completion-forced). Drives the VERDICT r2 #3 optimization loop.

Usage: python scripts/profile_cycle.py [--frames 1536] [--batch 12] [--k 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1536)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--windows", type=int, default=6,
                    help="steady-state windows for the serial-vs-pipelined "
                         "throughput comparison (0 to skip)")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _batch, _flagship_hparams
    from neuralsvb_tpu.hparams import hparams

    hp = _flagship_hparams()
    hp.update(mesh_shape="data:1", phase_2_steps=10 ** 6)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.parallel.mesh import stacked_batch_sharding
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask, wire_pack
    task = SVBVAEMleTask()
    task.build_model()
    b = _batch(args.batch, args.frames, args.frames)
    b["nsamples"] = args.batch
    K = args.k
    batches = [b] * K

    # compile + first transfer
    logs = task.training_cycle(batches, 5)
    float(jax.device_get(next(iter(logs.values()))[-1]))

    sb = stacked_batch_sharding(task.mesh)
    for c in range(args.calls):
        t0 = time.perf_counter()
        hosts = [task._prep_batch_host(x) for x in batches]
        packed = [wire_pack(h) for h in hosts]
        stacked = np.stack([buf for buf, _ in packed])
        t_pack = time.perf_counter() - t0

        t1 = time.perf_counter()
        dev = jax.device_put(stacked, sb)
        t_put_async = time.perf_counter() - t1
        jax.block_until_ready(dev)  # may lie through the relay; shown anyway
        t_put_sync = time.perf_counter() - t1

        t2 = time.perf_counter()
        logs = task.training_cycle(batches, 5 + (c + 1) * K)
        t_dispatch = time.perf_counter() - t2
        float(jax.device_get(next(iter(logs.values()))[-1]))
        t_total = time.perf_counter() - t0
        print(f"call {c}: pack {t_pack * 1e3:7.1f} ms | put(async) "
              f"{t_put_async * 1e3:7.1f} ms | put(sync'd) "
              f"{t_put_sync * 1e3:7.1f} ms | cycle-call {t_dispatch * 1e3:7.1f} ms "
              f"| total-forced {t_total * 1e3:7.1f} ms "
              f"({t_total / K * 1e3:6.1f} ms/step) "
              f"[{stacked.nbytes / 1e6:.1f} MB stacked]")
        # NOTE: the timed device_put above transfers a SECOND copy of the
        # window (training_cycle does its own put) — the printed total is
        # therefore an overestimate; the pack/put columns are the point.

    if not args.windows:
        return
    # Steady-state throughput: serial (pack+transfer inline, as a
    # non-pipelined trainer would) vs pipelined (Trainer's one-slot
    # prefetch thread: window N+1's prepare_cycle overlaps window N's
    # dispatch). Completion is forced once at the end — device execution
    # is in-order, so the final scalar cannot arrive before every window
    # has run; this measures windows/sec, not per-dispatch latency.
    from concurrent.futures import ThreadPoolExecutor
    W = args.windows
    for mode in ("serial", "pipelined"):
        step = 5 + (args.calls + 1) * K
        logs = task.training_cycle(batches, step)  # re-warm
        float(jax.device_get(next(iter(logs.values()))[-1]))
        step += K
        t0 = time.perf_counter()
        if mode == "serial":
            for _ in range(W):
                logs = task.training_cycle(batches, step)
                step += K
        else:
            with ThreadPoolExecutor(1) as pool:
                fut = pool.submit(task.prepare_cycle, batches)
                for _ in range(W):
                    prepared, fut = fut.result(), pool.submit(
                        task.prepare_cycle, batches)
                    logs = task.training_cycle(batches, step,
                                               prepared=prepared)
                    step += K
                fut.result()
        float(jax.device_get(next(iter(logs.values()))[-1]))
        dt = time.perf_counter() - t0
        print(f"{mode:>9}: {W} windows x K={K} in {dt:6.2f} s -> "
              f"{dt / (W * K) * 1e3:6.1f} ms/step "
              f"({W * K * args.batch * args.frames * 128 / 22050 / dt:8.1f} "
              f"audio-sec/sec)")


if __name__ == "__main__":
    main()
