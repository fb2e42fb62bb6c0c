"""Ordered chunked multiprocess map (reference: utils/multiprocess_utils.py:23-111).

Fans work out to N worker processes, yielding results in submission order;
worker exceptions yield None for that item (skipped upstream, matching the
reference's crash-tolerant binarize loop, base_binarizer.py:144-145)."""

from __future__ import annotations

import multiprocessing as mp
import traceback


def _hparams_initializer(hp: dict):
    """Re-seed the global hparams in spawned children and keep their JAX on
    CPU (the parent owns the TPU; workers only run host DSP)."""
    from ..hparams import hparams
    hparams.clear()
    hparams.update(hp)
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _worker(fn, in_q, out_q, initializer=None, init_arg=None):
    if initializer is not None:
        initializer(init_arg)
    while True:
        job = in_q.get()
        if job is None:
            break
        idx, args = job
        try:
            res = fn(*args)
        except KeyboardInterrupt:
            break
        except Exception:
            traceback.print_exc()
            res = None
        out_q.put((idx, res))


def chunked_multiprocess_run(fn, args_list, num_workers=None, ordered=True,
                             ctx_name="spawn"):
    """Yield fn(*args) for each args in args_list, in order. Children are
    spawned (not forked — the parent may hold a live TPU client) and re-seeded
    with the parent's hparams."""
    n = len(args_list)
    if num_workers is None:
        num_workers = max(1, mp.cpu_count() - 2)
    if num_workers <= 1 or n <= 1:
        for args in args_list:
            try:
                yield fn(*args)
            except Exception:
                traceback.print_exc()
                yield None
        return
    from ..hparams import hparams
    ctx = mp.get_context(ctx_name)
    in_q = ctx.Queue()
    out_q = ctx.Queue()
    procs = [ctx.Process(target=_worker,
                         args=(fn, in_q, out_q, _hparams_initializer, dict(hparams)),
                         daemon=True)
             for _ in range(min(num_workers, n))]
    for p in procs:
        p.start()
    for i, args in enumerate(args_list):
        in_q.put((i, args))
    for _ in procs:
        in_q.put(None)
    results = {}
    next_idx = 0
    received = 0
    try:
        while received < n:
            idx, res = out_q.get()
            received += 1
            results[idx] = res
            while next_idx in results:
                yield results.pop(next_idx)
                next_idx += 1
    finally:
        for p in procs:
            p.join(timeout=1)
            if p.is_alive():
                p.terminate()
