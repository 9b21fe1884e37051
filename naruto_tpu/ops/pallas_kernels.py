"""Pallas TPU kernels for the hot loop.

outer_cumsum: the post-sort stage of the cell-layout hash-grid backward
(ops/segment.dense_segment_sum_outer). The XLA formulation materializes the
[M, A*B] outer-product expansion (a multi-ms reshape at M~500k) and then
runs a log-pass cumsum over it; this kernel streams the sorted bf16
factors, expands the outer product in VMEM, and emits the inclusive f32
prefix sum in one pass (tri-matmul sub-block cumsum + running carry).

Equivalent of the tcnn CUDA backward's accumulation stage
(/root/reference/src/slam/coslam/model/decoder.py:11 uses tinycudann's
HashGrid whose backward is an atomic-add kernel; TPU has no atomics, so
sort + prefix-sum is the native formulation — SURVEY.md §2.8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 512          # tri-matmul cumsum chunk
BK = 4096         # rows per grid step (8192 exceeded the 16 MB scoped
                  # VMEM limit by 272 KB at the 64-col output width)


def _expand_outer(sa, sb, ra_ref, rb_ref, interpret: bool):
    """[SUB, ka] x [SUB, kb] bf16 -> [SUB, ka*kb] bf16 outer-product rows.

    a-major layout: position c*kb + f holds a_c * b_f. The column
    expansion runs as two one-hot MXU matmuls (a broadcast+concat
    formulation relayouts 8-lane minors on the VPU, ~25 us/chunk);
    Mosaic requires f32 matmul accumulators, and the one-hot operands
    make the f32->bf16 cast exact (each output is one bf16 input). The
    product itself gets one bf16 rounding (~0.4% on values that are
    bf16-rounded anyway; gradient-noise dominated) — in interpret mode
    XLA's excess-precision pass would ELIDE the f32->bf16 casts (leaving
    unrounded f32 products that diverge from both the TPU kernel and the
    XLA fallback branch), so the rounding is forced with reduce_precision
    there; a bf16 multiply rounds the exact f32 product identically."""
    sa_rep = jax.lax.dot_general(
        sa, ra_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [SUB, ka*kb]
    sb_tile = jax.lax.dot_general(
        sb, rb_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [SUB, ka*kb]
    if interpret:
        return jax.lax.reduce_precision(
            sa_rep * sb_tile, exponent_bits=8,
            mantissa_bits=7).astype(jnp.bfloat16)
    return sa_rep.astype(jnp.bfloat16) * sb_tile.astype(jnp.bfloat16)


def _outer_cumsum_kernel(ka: int, kb: int, block: int, interpret: bool,
                         sa_ref, sb_ref, offs_ref, ra_ref, rb_ref, out_ref):
    # build the mask in f32 then cast: tril's i1 compare can't relayout
    # straight to bf16 tiling (Mosaic "invalid relayout" on v5e)
    tri = jnp.tril(jnp.ones((SUB, SUB), jnp.float32)).astype(jnp.bfloat16)

    def chunk(i, _):
        sa = sa_ref[pl.ds(i * SUB, SUB), :]                  # [SUB, ka] bf16
        sb = sb_ref[pl.ds(i * SUB, SUB), :]                  # [SUB, kb] bf16
        # the cumsum matmul runs at the MXU bf16 rate, f32 accumulation
        outer = _expand_outer(sa, sb, ra_ref, rb_ref, interpret)
        cs = jax.lax.dot_general(
            tri, outer, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + offs_ref[pl.ds(i, 1), :]
        out_ref[pl.ds(i * SUB, SUB), :] = cs
        return 0

    jax.lax.fori_loop(0, block // SUB, chunk, 0, unroll=False)


def _chunk_totals_kernel(ka: int, kb: int, block: int, interpret: bool,
                         sa_ref, sb_ref, ra_ref, rb_ref, tot_ref):
    def chunk(i, _):
        sa = sa_ref[pl.ds(i * SUB, SUB), :]
        sb = sb_ref[pl.ds(i * SUB, SUB), :]
        outer = _expand_outer(sa, sb, ra_ref, rb_ref, interpret)
        # reduce in explicit f32 (a bf16 ones-dot accumulates in bf16 on
        # the interpret path — carry error vs the main kernel's
        # f32-accumulating tri matmul)
        tot_ref[pl.ds(i, 1), :] = jnp.sum(
            outer.astype(jnp.float32), axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, block // SUB, chunk, 0, unroll=False)


@functools.lru_cache(maxsize=8)
def _expand_mats(ka: int, kb: int):
    """One-hot expansion operands (numpy — cached jnp would leak tracers):
    Ra[c, c*kb+f] = 1 repeats each a column kb times; Rb[f, c*kb+f] = 1
    tiles the b block ka times."""
    ra = np.zeros((ka, ka * kb), np.float32)
    rb = np.zeros((kb, ka * kb), np.float32)
    for c in range(ka):
        for f in range(kb):
            ra[c, c * kb + f] = 1.0
            rb[f, c * kb + f] = 1.0
    return ra, rb


@functools.partial(jax.jit, static_argnames=("interpret",))
def outer_cumsum(sa: jnp.ndarray, sb: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum of outer(sa[i], sb[i]) flattened rows.

    sa: [M, ka] bf16 (sorted payload factors), sb: [M, kb] bf16.
    Returns [M, ka*kb] float32 inclusive cumulative sums. M must be a
    multiple of 512.

    Hierarchical scan: a first small Pallas pass computes per-SUB-chunk
    grand totals (same bf16 outer rounding as the main pass — carry-exact);
    XLA takes the tiny [nch, A*B] exclusive cumsum; the main pass adds the
    precomputed chunk offsets, so it has no cross-chunk carry at all:
    every grid step is independent and Mosaic pipelines the DMA/compute
    chain (the previous carried-scratch formulation serialized ~1000 small
    tri-matmuls end to end and measured no faster than plain XLA cumsum).
    """
    m, ka = sa.shape
    kb = sb.shape[1]
    assert m % SUB == 0, f"M={m} must be a multiple of {SUB}"
    nch = m // SUB

    block = min(BK, m)
    grid = -(-m // block)

    ra, rb = _expand_mats(ka, kb)
    ra16 = jnp.asarray(ra, jnp.bfloat16)
    rb16 = jnp.asarray(rb, jnp.bfloat16)
    fixed = lambda b: (0, 0)                                 # noqa: E731

    # chunk totals of the bf16-rounded products, computed by a first small
    # Pallas pass with the IDENTICAL expansion/rounding as the main kernel
    # (carry-exact). The earlier XLA formulation materialized the [M, A*B]
    # f32 product (~126 MB at M=493k) just to reduce it, plus a
    # reduce_precision dance to reproduce the kernel's bf16 rounding.
    tot_kernel = functools.partial(_chunk_totals_kernel, ka, kb, block,
                                   interpret)
    totals = pl.pallas_call(
        tot_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, ka), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, kb), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ka, ka * kb), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, ka * kb), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block // SUB, ka * kb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, ka * kb), jnp.float32),
        interpret=interpret,
    )(sa, sb, ra16, rb16)
    offs = jnp.cumsum(totals, axis=0) - totals               # exclusive

    kernel = functools.partial(_outer_cumsum_kernel, ka, kb, block,
                               interpret)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, ka), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, kb), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block // SUB, ka * kb), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ka, ka * kb), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, ka * kb), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, ka * kb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ka * kb), jnp.float32),
        interpret=interpret,
    )(sa, sb, offs, ra16, rb16)


def _pallas_enabled(kernel_env: str) -> bool:
    """Pallas paths compile only on real TPU backends (tests and the CPU
    mesh use the XLA formulations). NARUTO_NO_PALLAS disables all kernels;
    the per-kernel env (e.g. NARUTO_NO_PALLAS_CUMSUM) disables one — used
    for isolated kernel-on/off benches (PERFORMANCE.md discipline: never
    bench two graph changes together)."""
    import os

    if os.environ.get("NARUTO_NO_PALLAS") or os.environ.get(kernel_env):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def outer_cumsum_supported() -> bool:
    return _pallas_enabled("NARUTO_NO_PALLAS_CUMSUM")


