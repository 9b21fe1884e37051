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
BK = 4096         # rows per grid step


def _outer_cumsum_kernel(ka: int, kb: int, block: int,
                         sa_ref, sb_ref, out_ref, carry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    tri = jnp.tril(jnp.ones((SUB, SUB), jnp.float32))

    def chunk(i, _):
        sa = sa_ref[pl.ds(i * SUB, SUB), :].astype(jnp.float32)  # [SUB, ka]
        sb = sb_ref[pl.ds(i * SUB, SUB), :].astype(jnp.float32)  # [SUB, kb]
        # a-major layout: position c*kb + f holds a_c * b_f
        sa_rep = jnp.concatenate(
            [jnp.broadcast_to(sa[:, c:c + 1], (SUB, kb))
             for c in range(ka)], axis=1)                    # [SUB, ka*kb]
        sb_tile = jnp.concatenate([sb] * ka, axis=1)         # [SUB, ka*kb]
        outer = sa_rep * sb_tile
        cs = jax.lax.dot_general(
            tri, outer, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + carry_ref[:]
        out_ref[pl.ds(i * SUB, SUB), :] = cs
        carry_ref[:] = cs[SUB - 1:SUB, :]
        return 0

    jax.lax.fori_loop(0, block // SUB, chunk, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def outer_cumsum(sa: jnp.ndarray, sb: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum of outer(sa[i], sb[i]) flattened rows.

    sa: [M, ka] bf16 (sorted payload factors), sb: [M, kb] bf16.
    Returns [M, ka*kb] float32 inclusive cumulative sums. M must be a
    multiple of 512; rows are processed in 16k blocks with a carried
    running total, so the result equals jnp.cumsum of the expanded
    products in f32.
    """
    m, ka = sa.shape
    kb = sb.shape[1]
    assert m % SUB == 0, f"M={m} must be a multiple of {SUB}"
    block = min(BK, m)
    grid = -(-m // block)

    kernel = functools.partial(_outer_cumsum_kernel, ka, kb, block)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, ka), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, kb), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, ka * kb), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, ka * kb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, ka * kb), jnp.float32)],
        interpret=interpret,
    )(sa, sb)


def outer_cumsum_supported() -> bool:
    """Pallas path is compiled only on real TPU backends (tests and the
    CPU mesh use the XLA formulation)."""
    import os

    if os.environ.get("NARUTO_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ===================================================================== field
# Fused field evaluation: corner blend + one-blob + SDF & color MLPs in one
# VMEM-resident pass (forward), and the full chain rule back to the hash
# embedding + MLP weight gradients (backward). Replaces ~10 XLA fusions and
# their HBM-materialized intermediates per iteration; the hash-table gather
# itself stays in XLA (wide-row take), and d_table runs through the sorted
# segment sum as before. Pallas counterpart of tcnn's FullyFusedMLP+encoding
# composition (/root/reference/src/slam/coslam/model/decoder.py:48-59).

FBK = 1024     # points per grid step (2048 OOMs the 16MB scoped VMEM in bwd)


def _field_fwd_kernel(n_bins, rows_ref, w_rep_ref, p_ref, uncert_ref,
                      w1x_ref, w1p_ref, w2_ref, wc1_ref, wc2_ref, raw_ref):
    # p_ref: one-blob encoding [B, 3*n_bins] bf16, computed in XLA (erf has
    # no Mosaic lowering)
    weighted = rows_ref[:] * w_rep_ref[:]                  # [B, RF] bf16
    p16 = p_ref[:]
    p = p16.astype(jnp.float32)
    a1 = (jax.lax.dot_general(weighted, w1x_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(p16, w1p_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
    h1 = jnp.maximum(a1, 0.0).astype(jnp.bfloat16)         # [B, H1]
    out2 = jax.lax.dot_general(h1, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    sdf = out2[:, 0:1]
    geo = out2[:, 1:16]                                    # [B, 15]
    cin = jnp.concatenate(
        [p, geo, jnp.zeros((p.shape[0], 1), jnp.float32)],
        axis=1).astype(jnp.bfloat16)                       # [B, 64]
    ac = jax.lax.dot_general(cin, wc1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hc = jnp.maximum(ac, 0.0).astype(jnp.bfloat16)
    rgb = jax.lax.dot_general(hc, wc2_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [B, 8]
    raw_ref[:] = jnp.concatenate(
        [rgb[:, :3], sdf, uncert_ref[:],
         jnp.zeros((sdf.shape[0], 3), jnp.float32)], axis=1)


def _field_bwd_kernel(n_bins, rows_ref, w_rep_ref, p_ref, g_ref,
                      w1x_ref, w1p_ref, w2_ref, wc1_ref, wc2_ref, ws_ref,
                      dembed_ref, dw1h_ref, dw1p_ref, dw2_ref, dwc1_ref,
                      dwc2_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    # ---- recompute forward (w1p_ref is STACKED: [POS pos rows; LF hash
    # rows] — slice the positional part for the a1 recompute; p_ref is the
    # XLA-computed one-blob encoding, bf16)
    POS = 3 * n_bins
    weighted = rows_ref[:] * w_rep_ref[:]
    p16 = p_ref[:]
    p = p16.astype(jnp.float32)
    embed = jax.lax.dot_general(weighted, ws_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    a1 = (jax.lax.dot_general(weighted, w1x_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(p16, w1p_ref[0:POS, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))

    relu1 = (a1 > 0.0)
    h1 = jnp.maximum(a1, 0.0).astype(jnp.bfloat16)
    out2 = jax.lax.dot_general(h1, w2_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    geo = out2[:, 1:16]
    cin = jnp.concatenate(
        [p, geo, jnp.zeros((p.shape[0], 1), jnp.float32)],
        axis=1).astype(jnp.bfloat16)
    ac = jax.lax.dot_general(cin, wc1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    reluc = (ac > 0.0)
    hc = jnp.maximum(ac, 0.0).astype(jnp.bfloat16)

    # ---- backward chain
    g = g_ref[:]                                           # [B, 8] f32
    g_rgb = jnp.concatenate(
        [g[:, :3], jnp.zeros((g.shape[0], 5), jnp.float32)], axis=1)
    g_rgb16 = g_rgb.astype(jnp.bfloat16)
    # d hc = g_rgb @ wc2^T
    d_hc = jax.lax.dot_general(g_rgb16, wc2_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_ac = jnp.where(reluc, d_hc, 0.0)
    d_ac16 = d_ac.astype(jnp.bfloat16)
    d_cin = jax.lax.dot_general(d_ac16, wc1_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d_geo = d_cin[:, 3 * n_bins:3 * n_bins + 15]
    d_out2 = jnp.concatenate(
        [g[:, 3:4], d_geo], axis=1)                        # [B, 16]
    d_out216 = d_out2.astype(jnp.bfloat16)
    d_h1 = jax.lax.dot_general(d_out216, w2_ref[:],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d_a1 = jnp.where(relu1, d_h1, 0.0)
    d_a116 = d_a1.astype(jnp.bfloat16)
    # d_embed via the hash half of W1 (rows of W1x are the expanded copies;
    # use the compact hash weight passed as the FIRST 32 rows of w1p? no —
    # d_embed[l*F+f] = sum_j d_a1[:, j] * W1h[l*F+f, j]; W1h = S^T W1x is
    # just the unexpanded hash weight — recover via ws^T @ w1x once outside;
    # here we receive it as the first LF rows of w1p? Instead: the caller
    # passes w1p = [POS+LF, H1] with the hash weight stacked after the
    # positional rows; see field_fused_bwd.
    LF = ws_ref.shape[1]
    w1h = w1p_ref[POS:POS + LF, :]                         # [LF, H1] bf16
    dembed_ref[:] = jax.lax.dot_general(
        d_a116, w1h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- weight grad accumulation (f32 outputs, accumulated across grid)
    @pl.when(b == 0)
    def _():
        dw1h_ref[:] = jnp.zeros_like(dw1h_ref)
        dw1p_ref[:] = jnp.zeros_like(dw1p_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dwc1_ref[:] = jnp.zeros_like(dwc1_ref)
        dwc2_ref[:] = jnp.zeros_like(dwc2_ref)

    embed16 = embed.astype(jnp.bfloat16)
    dw1h_ref[:] += jax.lax.dot_general(
        embed16, d_a116, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw1p_ref[:] += jax.lax.dot_general(
        p16, d_a116, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_ref[:] += jax.lax.dot_general(
        h1, d_out216, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwc1_ref[:] += jax.lax.dot_general(
        cin, d_ac16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwc2_ref[:] += jax.lax.dot_general(
        hc, g_rgb16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_rows(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def field_fused_fwd(rows, w_rep, p, uncert, w1x, w1p, w2, wc1, wc2,
                    n_bins: int = 16, interpret: bool = False):
    """Fused forward: raw [N, 5] = [rgb(3), sdf, uncert] (pre-sigmoid rgb).

    rows/w_rep: [N, RF] bf16 gathered corner features and repeated weights;
    p [N, 3*n_bins] bf16 one-blob encoding (erf runs in XLA — no Mosaic
    lowering); uncert [N, 1] f32 (pre-computed grid sample);
    w1x [RF, H1] blend-folded hash weight, w1p [POS, H1], w2 [H1, 16],
    wc1 [64, H1] (row 63 zero), wc2 [H1, 8] (cols 3..7 zero), all bf16.
    """
    n = p.shape[0]
    rows = _pad_rows(rows, FBK)
    w_rep = _pad_rows(w_rep, FBK)
    x01p = _pad_rows(p, FBK)
    uncertp = _pad_rows(uncert, FBK)
    npad = x01p.shape[0]
    grid = npad // FBK
    const = lambda b: (0, 0)                       # noqa: E731

    raw = pl.pallas_call(
        functools.partial(_field_fwd_kernel, n_bins),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((FBK, rows.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, w_rep.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, 3 * n_bins), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1x.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc2.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FBK, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 8), jnp.float32),
        interpret=interpret,
    )(rows, w_rep, x01p, uncertp, w1x, w1p, w2, wc1, wc2)
    return raw[:n, :5]


@functools.partial(jax.jit, static_argnames=("n_bins", "interpret"))
def field_fused_bwd(rows, w_rep, p, g_raw, w1x, w1p_stacked, w2, wc1,
                    wc2, ws, n_bins: int = 16, interpret: bool = False):
    """Fused backward: recomputes the forward and returns
    (d_embed [N, LF] f32, dw1h [LF, H1], dw1p [POS, H1], dw2, dwc1, dwc2).

    p: [N, 3*n_bins] bf16 one-blob encoding (from XLA);
    w1p_stacked: [POS + LF, H1] — positional weight rows followed by the
    COMPACT hash weight rows (used for d_embed); ws: [RF, LF] bf16 blend
    selection matrix (recomputes the embedding for dW1h)."""
    n = p.shape[0]
    lf = ws.shape[1]
    pos = 3 * n_bins
    rows = _pad_rows(rows, FBK)
    w_rep = _pad_rows(w_rep, FBK)
    x01p = _pad_rows(p, FBK)
    g8 = jnp.concatenate(
        [g_raw, jnp.zeros((n, 3), jnp.float32)], axis=1)
    g8 = _pad_rows(g8, FBK)
    npad = x01p.shape[0]
    grid = npad // FBK
    const = lambda b: (0, 0)                       # noqa: E731

    outs = pl.pallas_call(
        functools.partial(_field_bwd_kernel, n_bins),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((FBK, rows.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, w_rep.shape[1]), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, 3 * n_bins), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FBK, 8), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1x.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p_stacked.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(ws.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((FBK, lf), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lf, w2.shape[0]), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((pos, w2.shape[0]), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wc2.shape, const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, lf), jnp.float32),
            jax.ShapeDtypeStruct((lf, w2.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct((pos, w2.shape[0]), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct(wc1.shape, jnp.float32),
            jax.ShapeDtypeStruct(wc2.shape, jnp.float32),
        ),
        interpret=interpret,
    )(rows, w_rep, x01p, g8, w1x, w1p_stacked, w2, wc1, wc2, ws)
    d_embed = outs[0][:n]
    return (d_embed,) + tuple(outs[1:])
