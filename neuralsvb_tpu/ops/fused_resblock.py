"""Fused HiFiGAN ResBlock cluster as a Pallas TPU kernel.

The vocoder's hot loop (reference: modules/hifigan/hifigan.py:144-169) runs,
per upsample stage, three parallel ResBlock1 towers (kernel sizes 3/7/11,
dilations (1,3,5) each => 18 dilated convs + residual adds) and averages
them. Lowered conv-by-conv through XLA this is bandwidth/launch bound: every
conv re-reads and re-writes the full [T, C] activation from HBM (~23 GB per
2048-frame call at f32, BENCH_r03), and the C=64..256 channel counts
under-fill the 128x128 MXU.

This kernel computes the WHOLE cluster from a single HBM read of x:

- layout [C, T] (channels on sublanes, time on lanes) so no channel padding
  is wasted and time shifts are cheap lane rolls;
- each conv is ONE matmul: the k taps are stacked along the contraction dim
  (im2col over taps), so K = k*C_in (up to 11*256) keeps the MXU full even
  at C=64;
- all intermediates live in VMEM; only the averaged cluster output returns
  to HBM. Residual chains stay f32; matmul operands are cast to `mm_dtype`
  (bf16 on TPU == XLA's own default f32 conv precision, so this is not a
  quality regression vs the unfused path);
- sequence-edge semantics are exact: the unfused path zero-pads EVERY conv
  input at the sequence boundary, so the kernel masks each conv input to the
  valid [0, T) range (halo tiles see zeros exactly where nn.Conv would).

Tiling: grid (B, T/Tt) — batch is a leading grid axis (see "Batch handling"
below). Each tile manually DMAs x[b, C, i*Tt : i*Tt + Tt + 2H] from HBM (pre-padded
by H on both sides, so offsets are always in range). H bounds the
receptive-field creep of one tower: for k=11, d=(1,3,5):
sum((k-1)/2*d + (k-1)/2) = 60 <= H=64. Lane rolls wrap, but the wrap garbage
also creeps <= 60 lanes inward from the window edge, so the central Tt lanes
written back are exact.

Compile-variant discipline (VERDICT r4 #2): a Mosaic kernel compile through
this environment's remote relay costs minutes, so the kernel module must not
vary with anything that changes per call site:
- the true length T enters as a runtime SMEM scalar (masking reads it), so
  the module depends only on the PADDED tile count, not on T itself;
- the wrapper casts x to f32 before the kernel boundary, so a bf16 vocoder
  run embeds the same module as the f32 run (weights are packed in mm_dtype
  either way).

Batch handling (``batch_mode``): "grid" (default) folds B into the Pallas
grid as a leading axis — ONE pallas_call, grid (B, T/Tt), no scan in the
surrounding XLA program. "map" folds B out via lax.map (a length-B scan of
a grid-(T/Tt,) pallas_call), which keeps B out of the Mosaic module key so
every batch size shares one compile — but a length-8 scan-of-pallas inside
the full e2e serving program crashes this environment's remote compile
helper (HTTP 500, 3/3 in round 5), so "map" is now the env-selectable
fallback (NSVB_FUSED_BATCH=map) rather than the default. With "grid" the
variant key is (C, spec, Tt, n_tiles, B); serving batch sizes are bucketed
(1/8) so this costs one extra module set for batched serving.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

# (kernel_size, dilations) per tower — static spec, mirrors ResBlock1.
ClusterSpec = Tuple[Tuple[int, Tuple[int, ...]], ...]


def _creep(spec: ClusterSpec) -> int:
    """Max one-sided receptive-field reach of any tower in the cluster."""
    return max(sum((k - 1) // 2 * d + (k - 1) // 2 for d in dils)
               for k, dils in spec)


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _cluster_kernel(t_ref, x_hbm, *refs, spec: ClusterSpec, Tt: int, H: int,
                    mm_dtype, batched: bool):
    """refs = [wa_0, ba_0, wb_0, bb_0, wa_1, ..., out_ref, x_vmem, sem].

    t_ref: SMEM (1,) int32 — the true (unpadded) sequence length. A runtime
           operand, NOT a closure constant: baking T into the module would
           re-lower a Mosaic kernel per input length (see module docstring).
    wa_r: [n_dil, C, k*C]  conv1 (dilated) weights, already transposed so
          row c_out contracts over (tap-major, c_in-minor) stacking.
    ba_r: [n_dil, C] bias. wb_r/bb_r: same for conv2 (dilation 1).
    batched: grid is (B, n_tiles) and x_hbm is [B, C, Tp+2H]; otherwise grid
             is (n_tiles,) and x_hbm is [C, Tp+2H] (see module docstring).
    """
    n_rb = len(spec)
    w_refs, out_ref, x_vmem, sem = refs[:4 * n_rb], refs[-3], refs[-2], refs[-1]
    W = Tt + 2 * H
    if batched:
        i = pl.program_id(1)
        src = x_hbm.at[pl.program_id(0), :, pl.ds(i * Tt, W)]
    else:
        i = pl.program_id(0)
        src = x_hbm.at[:, pl.ds(i * Tt, W)]

    dma = pltpu.make_async_copy(src, x_vmem, sem)
    dma.start()
    dma.wait()
    x = x_vmem[:]  # [C, W] f32

    # Global time index of every lane in this window (data starts at pad H,
    # so window lane 0 is global position i*Tt - H).
    pos = i * Tt - H + jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    valid = jnp.logical_and(pos >= 0, pos < t_ref[0])

    def conv_in(h):
        """Mask to the valid range (exact nn.Conv zero-pad semantics)."""
        return jnp.where(valid, _leaky(h), 0.0)

    def tap_stack(t, k, d):
        """[C, W] f32 -> [k*C, W] mm_dtype: row-block j holds t shifted so
        lane i carries t[i + (j - (k-1)/2) * d]. Wrap garbage lands within
        the halo. Rolls run at 32-bit (Mosaic's rotate has no bf16 path);
        the cast to the matmul dtype happens after stacking."""
        c = (k - 1) // 2 * d
        w = t.shape[1]
        # pltpu.roll requires a non-negative shift; rolling by (s mod W) is
        # identical on a circular buffer.
        return jnp.concatenate(
            [pltpu.roll(t, shift=(c - j * d) % w, axis=1) for j in range(k)],
            axis=0).astype(mm_dtype)

    acc = None
    for r, (k, dils) in enumerate(spec):
        wa, ba, wb, bb = w_refs[4 * r: 4 * r + 4]
        cur = x
        for di, d in enumerate(dils):
            t = tap_stack(conv_in(cur), k, d)
            y = jax.lax.dot_general(
                wa[di], t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + ba[di][:, None]
            t2 = tap_stack(conv_in(y), k, 1)
            z = jax.lax.dot_general(
                wb[di], t2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bb[di][:, None]
            cur = cur + z
        acc = cur if acc is None else acc + cur
    out_ref[:] = (acc * (1.0 / n_rb))[:, H:H + Tt]


def _pack_tower(p: dict, k: int, dils: Sequence[int], conv1: str, conv2: str,
                mm_dtype) -> list:
    """Flax ResBlock1 params {conv1_j, conv2_j: {kernel [k,Cin,Cout], bias}}
    -> [wa [n_dil, Cout, k*Cin], ba, wb, bb] matching the kernel's stacking
    order (tap-major, c_in-minor)."""
    was, bas, wbs, bbs = [], [], [], []
    for j in range(len(dils)):
        for conv, ws, bs in ((conv1, was, bas), (conv2, wbs, bbs)):
            kern = p[f"{conv}_{j}"]["kernel"]   # [k, Cin, Cout]
            kk, cin, cout = kern.shape
            assert kk == k, (kk, k)
            ws.append(jnp.transpose(kern, (2, 0, 1)).reshape(cout, kk * cin))
            bs.append(p[f"{conv}_{j}"]["bias"])
    return [jnp.stack(was).astype(mm_dtype), jnp.stack(bas).astype(jnp.float32),
            jnp.stack(wbs).astype(mm_dtype), jnp.stack(bbs).astype(jnp.float32)]


@functools.partial(
    jax.jit,
    static_argnames=("spec", "Tt", "H", "mm_dtype", "interpret", "batch_mode"))
def fused_resblock_cluster_nct(x, weights, *, spec: ClusterSpec,
                               Tt: int = 2048, H: int = 64,
                               mm_dtype=jnp.bfloat16, interpret: bool = False,
                               batch_mode: str = "grid"):
    """x: [B, C, T] f32 -> mean of ResBlock1 towers, [B, C, T] f32.

    `weights`: flat list of [wa, ba, wb, bb] per tower (see _pack_tower).
    T is padded up to a multiple of Tt internally; H must be >= the cluster's
    receptive-field creep (asserted). ``batch_mode`` picks how the batch dim
    maps onto the kernel (module docstring): "grid" (leading grid axis) or
    "map" (lax.map scan, batch-size-independent Mosaic module).
    """
    assert H >= _creep(spec), (H, _creep(spec))
    B, C, T = x.shape
    nt = -(-T // Tt)
    Tp = nt * Tt
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (H, Tp - T + H)))
    W = Tt + 2 * H
    # Runtime operand: keeps T out of the Mosaic module (same module serves
    # every T with the same padded tile count).
    t_true = jnp.full((1,), T, jnp.int32)

    n_rb = len(spec)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    for _ in range(n_rb):
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    # Scoped-VMEM budget: the default 16 MB limit rejects the C=256 stage
    # (resident cluster weights alone are ~16.5 MB bf16). v5e/v4 have 128 MB
    # of physical VMEM; budget the measured footprint with headroom: weights
    # + ~8 tile-sized live buffers (x, cur, acc, y/z, tap stacks x2 in
    # mm_dtype) + the out block, then pad 2x for Mosaic's own temporaries.
    w_bytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in weights)
    kmax = max(k for k, _ in spec)
    tile_bytes = C * W * 4
    stack_bytes = kmax * C * W * jnp.dtype(mm_dtype).itemsize
    budget = 2 * (w_bytes + 6 * tile_bytes + 2 * stack_bytes) + 2 ** 20
    vmem_limit = int(min(max(budget, 32 * 2 ** 20), 120 * 2 ** 20))
    kern = functools.partial(_cluster_kernel, spec=spec, Tt=Tt, H=H,
                             mm_dtype=mm_dtype,
                             batched=(batch_mode == "grid"))
    common = dict(
        in_specs=in_specs,
        scratch_shapes=[pltpu.VMEM((C, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )
    if batch_mode == "grid":
        # Batch as a leading grid axis: ONE pallas_call, no scan in the XLA
        # program (a length-B scan-of-pallas crashes the remote compile
        # helper here — module docstring). The grid is sequential on a
        # single-core chip either way, so per-item cost is identical to map.
        call = pl.pallas_call(
            kern,
            grid=(B, nt),
            out_specs=pl.BlockSpec((None, C, Tt), lambda b, i: (b, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C, Tp), jnp.float32),
            **common,
        )
        out = call(t_true, xp, *weights)
    else:
        call = pl.pallas_call(
            kern,
            grid=(nt,),
            out_specs=pl.BlockSpec((C, Tt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, Tp), jnp.float32),
            **common,
        )
        # lax.map (not a batch grid dim, not vmap): the kernel module stays
        # batch-shape-independent, so B=1 and B=8 callers share one compile.
        out = jax.lax.map(lambda xi: call(t_true, xi, *weights), xp)
    return out[:, :, :T]


@functools.lru_cache(maxsize=None)
def _make_fused(spec: ClusterSpec, Tt: int, H: int, mm_name: str,
                interpret: bool, batch_mode: str = "grid"):
    """custom_vjp wrapper: Pallas forward, reference-implementation backward
    (Pallas kernels are not differentiable; the oracle's XLA-conv VJP is
    exact ResBlock1 math, so vocoder TRAINING also gets the fused forward)."""
    mm_dtype = jnp.dtype(mm_name)
    ks = tuple(k for k, _ in spec)
    dils = tuple(d for _, d in spec)

    def forward(x_nwc, towers):
        weights = []
        for p, (k, dl) in zip(towers, spec):
            weights += _pack_tower(p, k, dl, "conv1", "conv2", mm_dtype)
        T = x_nwc.shape[1]
        # Small inputs (validation snippets): one tile, lane-aligned.
        Tt_eff = min(Tt, max(128, -(-T // 128) * 128))
        # f32 at the kernel boundary: a bf16 caller then embeds the exact
        # same Mosaic module (and hits the same eager-jit entry) as f32.
        x = jnp.transpose(x_nwc, (0, 2, 1)).astype(jnp.float32)
        y = fused_resblock_cluster_nct(x, weights, spec=spec, Tt=Tt_eff, H=H,
                                       mm_dtype=mm_dtype, interpret=interpret,
                                       batch_mode=batch_mode)
        return jnp.transpose(y, (0, 2, 1)).astype(x_nwc.dtype)

    @jax.custom_vjp
    def f(x_nwc, towers):
        return forward(x_nwc, towers)

    def fwd(x_nwc, towers):
        return forward(x_nwc, towers), (x_nwc, towers)

    def bwd(res, g):
        x_nwc, towers = res
        _, vjp = jax.vjp(
            lambda x_, tw: resblock_cluster_reference(x_, tw, ks, dils),
            x_nwc, towers)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_resblock_cluster(x_nwc, tower_params: Sequence[dict],
                           kernel_sizes: Sequence[int],
                           dilation_sizes: Sequence[Sequence[int]],
                           *, Tt: int = 2048, H: int = 64,
                           mm_dtype=jnp.bfloat16,
                           interpret: bool | None = None,
                           batch_mode: str | None = None):
    """NWC convenience wrapper used by HifiGanGenerator.

    x_nwc: [B, T, C]. tower_params[r] is the flax param dict of the r-th
    ResBlock1 module at this stage. Returns mean(tower_r(x)) in NWC.
    Differentiable (see _make_fused). ``batch_mode`` defaults to the
    NSVB_FUSED_BATCH env var ("grid" unless set to "map").
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if batch_mode is None:
        import os
        batch_mode = os.environ.get("NSVB_FUSED_BATCH", "grid")
    spec = tuple((int(k), tuple(int(d) for d in dils))
                 for k, dils in zip(kernel_sizes, dilation_sizes))
    f = _make_fused(spec, Tt, H, jnp.dtype(mm_dtype).name, interpret,
                    batch_mode)
    return f(x_nwc, tuple(tower_params))


def resblock_cluster_reference(x_nwc, tower_params, kernel_sizes,
                               dilation_sizes):
    """Pure-jnp oracle for tests: exactly the unfused ResBlock1 math."""
    outs = []
    for p, k, dils in zip(tower_params, kernel_sizes, dilation_sizes):
        cur = x_nwc
        for j, d in enumerate(dils):
            t = _leaky(cur)
            pd = (k * d - d) // 2
            y = jax.lax.conv_general_dilated(
                t, p[f"conv1_{j}"]["kernel"], (1,), [(pd, pd)],
                rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"))
            y = y + p[f"conv1_{j}"]["bias"]
            t2 = _leaky(y)
            pd = (k - 1) // 2
            z = jax.lax.conv_general_dilated(
                t2, p[f"conv2_{j}"]["kernel"], (1,), [(pd, pd)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            cur = cur + z + p[f"conv2_{j}"]["bias"]
        outs.append(cur)
    return sum(outs) / len(outs)
