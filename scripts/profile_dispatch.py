#!/usr/bin/env python
"""Isolate the per-dispatch host/relay cost of a jitted call as a function
of (a) the number of donated state leaves and (b) the transferred batch
bytes — the two candidate explanations for the train-step wall/device gap
(VERDICT r3 next #1). Runs on the real chip.

Usage: python scripts/profile_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, force, iters=10):
    fn()  # warm/compile
    force()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    force()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}")

    # (a) leaf-count sweep: donated dict of N small leaves, trivial update
    for n_leaves in (1, 8, 64, 256, 512, 1024):
        state = {f"p{i}": jnp.zeros((64,), jnp.float32) for i in range(n_leaves)}
        state = jax.device_put(state)

        @jax.jit
        def step(state):
            return {k: v + 1.0 for k, v in state.items()}

        # re-donate each call like the train loop does
        holder = [state]

        def call():
            holder[0] = step(holder[0])

        def force():
            float(jax.device_get(holder[0]["p0"][0]))

        dt = timeit(call, force)
        print(f"leaves={n_leaves:5d}: {dt * 1e3:7.2f} ms/dispatch")

    # (a2) same total bytes, one fused leaf
    big = jax.device_put(jnp.zeros((1024 * 64,), jnp.float32))

    @jax.jit
    def step1(x):
        return x + 1.0

    h = [big]
    dt = timeit(lambda: h.__setitem__(0, step1(h[0])),
                lambda: float(jax.device_get(h[0][0])))
    print(f"fused 1 leaf (same bytes as 1024x64): {dt * 1e3:7.2f} ms/dispatch")

    # (b) transfer sweep: device_put of fresh host buffers, completion-forced
    @jax.jit
    def consume(x, c):
        return x.reshape(-1)[0].astype(jnp.float32) + c

    for mb in (1, 4, 8, 16, 32):
        buf = np.zeros((mb * 1024 * 1024,), np.uint8)
        c = jnp.float32(0.0)
        # warm
        c = consume(jax.device_put(buf), c)
        float(jax.device_get(c))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            c = consume(jax.device_put(buf), c)
        float(jax.device_get(c))
        dt = (time.perf_counter() - t0) / iters
        print(f"transfer {mb:3d} MB: {dt * 1e3:8.1f} ms -> "
              f"{mb / dt:7.1f} MB/s")

    # (c) realistic train-state leaf count
    from __graft_entry__ import _flagship_hparams
    from neuralsvb_tpu.hparams import hparams
    hp = _flagship_hparams()
    hp.update(mesh_shape="data:1", phase_2_steps=10 ** 6)
    hparams.clear()
    hparams.update(hp)
    from neuralsvb_tpu.tasks.svb_vae_task import SVBVAEMleTask
    task = SVBVAEMleTask()
    task.build_model()
    leaves = jax.tree_util.tree_leaves(task.state)
    nbytes = sum(l.nbytes for l in leaves)
    print(f"train state: {len(leaves)} leaves, {nbytes / 1e6:.1f} MB")

    # trivial donated pass over the REAL state tree: pure marshaling cost
    @jax.jit
    def touch(state):
        return jax.tree_util.tree_map(lambda x: x, state)

    h = [task.state]
    dt = timeit(lambda: h.__setitem__(0, touch(h[0])),
                lambda: float(jax.device_get(
                    jax.tree_util.tree_leaves(h[0])[0].reshape(-1)[0])))
    print(f"identity pass over real state: {dt * 1e3:7.2f} ms/dispatch")


if __name__ == "__main__":
    main()
