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


if __name__ == "__main__":
    main()
