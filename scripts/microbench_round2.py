"""Round-2 micro-benchmarks: in-kernel gather variants, pair-row gathers,
fixed-precision windowed accumulate at several block sizes.

Run:  PYTHONPATH=.:$PYTHONPATH python scripts/microbench_round2.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from naruto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

M = 3_000_000
T = 201_000
F = 8
PRIME = 2654435761


def bench(name, step_fn, state, reps=10):
    try:
        step = jax.jit(step_fn)
        state = step(state)
        state = step(state)
        jax.block_until_ready(state)
    except Exception as e:  # noqa
        print(f"{name:58s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:58s} {dt:9.2f} ms")
    return dt


def remix(ix, mod):
    return ((ix * np.uint32(PRIME)).astype(jnp.uint32)
            % np.uint32(mod)).astype(jnp.int32)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx0 = jax.random.randint(k1, (M,), 0, T, dtype=jnp.int32)
    upd0 = jax.random.normal(k2, (M, F), dtype=jnp.float32)
    table_f32 = jax.random.normal(k2, (T, F), dtype=jnp.float32)
    print(f"device={jax.devices()[0]}")

    # ---- pair-row gathers: 1.5M rows x 16 elems (the paired-x layout)
    MP = M // 2
    pair_f32 = jnp.concatenate(
        [table_f32, jnp.roll(table_f32, -1, axis=0)], axis=1)  # [T, 16]
    pair_bf16 = pair_f32.astype(jnp.bfloat16)
    idxp0 = idx0[:MP]

    def mk(tbl, mod):
        def step(st):
            ix, acc = st
            out = jnp.take(tbl, ix, axis=0)
            return remix(ix, mod), acc + jnp.sum(
                out[:, :1].astype(jnp.float32))
        return step

    bench("take pair [T,16] f32 x 1.5M", mk(pair_f32, T),
          (idxp0, jnp.zeros(())))
    bench("take pair [T,16] bf16 x 1.5M", mk(pair_bf16, T),
          (idxp0, jnp.zeros(())))
    # cell-dup layout simulation: 375k rows x 64 elems
    cell64_bf16 = jnp.tile(pair_bf16, (1, 4))[: T // 1]
    bench("take cell [T,64] bf16 x 375k", mk(cell64_bf16, T),
          (idx0[: M // 8], jnp.zeros(())))
    cell64_f32 = jnp.tile(pair_f32, (1, 4))
    bench("take cell [T,64] f32 x 375k", mk(cell64_f32, T),
          (idx0[: M // 8], jnp.zeros(())))
    # int32-packed bf16 pairs: [T, 8] int32 rows == 16 bf16
    pair_i32 = pair_bf16.reshape(T, 8, 2).view(jnp.int32)[..., 0]
    def step_i32(st):
        ix, acc = st
        out = jnp.take(pair_i32, ix, axis=0)
        return remix(ix, T), acc + jnp.sum(out[:, :1])
    bench("take pair-as-int32 [T,8]i32 x 1.5M", step_i32,
          (idxp0, jnp.zeros((), jnp.int32)))

    # ---- in-kernel VMEM gather variants
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TS = 65536
    BK = 2048
    table_lvl = jnp.tile(table_f32.astype(jnp.bfloat16)[: TS // 4], (4, 1))

    def run_take_kernel(kernel, tbl, ix, out_dtype, out_w=F):
        return pl.pallas_call(
            kernel,
            grid=(M // BK,),
            in_specs=[
                pl.BlockSpec((TS, tbl.shape[1]), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK,), lambda b: (b,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BK, out_w), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, out_w), out_dtype),
        )(tbl, ix)

    def k_taa_bcast(tbl_ref, idx_ref, out_ref):
        ix = idx_ref[:].astype(jnp.int32)
        ixb = jnp.broadcast_to(ix[:, None], (BK, F))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], ixb, axis=0)

    def step_taa(st):
        ix, acc = st
        out = run_take_kernel(k_taa_bcast, table_lvl, ix, jnp.bfloat16)
        return remix(ix, TS), acc + jnp.sum(out[:1].astype(jnp.float32))
    r = bench("pallas take_along_axis bcast idx (VMEM) 3M", step_taa,
              (idx0 % TS, jnp.zeros(())))
    if r is not None:
        ref = jnp.take(table_lvl, idx0 % TS, axis=0)
        got = run_take_kernel(k_taa_bcast, table_lvl, idx0 % TS, jnp.bfloat16)
        print("    match:", bool(jnp.all(ref == got)))

    # 1-D per-column take inside kernel
    tcol = table_lvl[:, 0]

    def k_take_1d(tbl_ref, idx_ref, out_ref):
        col = tbl_ref[:]
        ix = idx_ref[:].astype(jnp.int32)
        out_ref[:] = jnp.take(col, ix, axis=0)[:, None]

    def run_1d(tbl, ix):
        return pl.pallas_call(
            k_take_1d,
            grid=(M // BK,),
            in_specs=[
                pl.BlockSpec((TS,), lambda b: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK,), lambda b: (b,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BK, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 1), tbl.dtype),
        )(tbl, ix)

    def step_1d(st):
        ix, acc = st
        out = run_1d(tcol, ix)
        return remix(ix, TS), acc + jnp.sum(out[:1].astype(jnp.float32))
    r = bench("pallas 1-D jnp.take (VMEM col) 3M", step_1d,
              (idx0 % TS, jnp.zeros(())))
    if r is not None:
        ref = jnp.take(tcol, idx0 % TS, axis=0)
        got = run_1d(tcol, idx0 % TS)[:, 0]
        print("    match:", bool(jnp.all(ref == got)))

    # ---- windowed accumulate, f32 HIGHEST precision, block-size sweep
    TPAD = ((T + 127) // 128) * 128
    sidx0 = jnp.sort(idx0)

    def make_seg(BKs, WIN):
        def seg_kernel(si_ref, sv_ref, out_ref):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            ix = si_ref[:]
            vals = sv_ref[:]
            lo = pl.multiple_of((ix[0] // 8) * 8, 8)
            # spill loop: windows of WIN rows until block range covered
            def win_body(w, _):
                base = lo + w * (WIN - 8)  # overlap 8 rows for alignment
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (BKs, WIN), 1) + base
                oh = jnp.where(
                    (ix[:, None] == col)
                    & (ix[:, None] >= base)
                    & ((w == 0) | (ix[:, None] >= lo + (WIN - 8) * w + 8 - 8)),
                    1.0, 0.0).astype(jnp.float32)
                contrib = jax.lax.dot_general(
                    oh, vals, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                cur = out_ref[pl.ds(base, WIN), :]
                out_ref[pl.ds(base, WIN), :] = cur + contrib
                return 0
            # number of windows needed for this block (usually 1)
            span = ix[BKs - 1] - lo
            nwin = jnp.minimum(span // (WIN - 8) + 1, 64)
            jax.lax.fori_loop(0, nwin, win_body, 0)

        def pallas_seg(si, sv):
            return pl.pallas_call(
                seg_kernel,
                grid=(M // BKs,),
                in_specs=[
                    pl.BlockSpec((BKs,), lambda b: (b,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BKs, F), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TPAD, F), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((TPAD, F), jnp.float32),
            )(si, sv)
        return pallas_seg

    for BKs, WIN in ((4096, 1024), (8192, 1024), (8192, 2048), (16384, 2048)):
        seg = make_seg(BKs, WIN)

        def step_seg(st, seg=seg):
            si, sv = st
            out = seg(si, sv)
            return jnp.sort(remix(si, T)), sv + out[:1] * 1e-9
        r = bench(f"pallas windowed-accum f32 BK={BKs} WIN={WIN}",
                  step_seg, (sidx0, upd0))
        if r is not None:
            ref = jax.ops.segment_sum(upd0, sidx0, num_segments=TPAD)
            got = seg(sidx0, upd0)
            err = float(jnp.max(jnp.abs(ref - got)))
            print(f"    max abs err: {err:.2e}")

    # ---- one-hot matmul scatter small-T with HIGHEST precision
    T0 = 4913

    def step_oh(st):
        ix, v = st
        oh = jax.nn.one_hot(ix, 5120, dtype=jnp.float32)
        out = jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return remix(ix, T0), v + out[:1] * 1e-9
    r = bench("xla one-hot f32-HIGHEST scatter 750k->4913", step_oh,
              (idx0[:750_000] % T0, upd0[:750_000]))
    if r is not None:
        ix = idx0[:750_000] % T0
        ref = jax.ops.segment_sum(upd0[:750_000], ix, num_segments=5120)
        oh = jax.nn.one_hot(ix, 5120, dtype=jnp.float32)
        got = jax.lax.dot_general(oh, upd0[:750_000], (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        print(f"    max abs err: {float(jnp.max(jnp.abs(ref-got))):.2e}")

    # ---- variadic sorts at pair scale
    packedp = upd0[:MP].astype(jnp.bfloat16).reshape(MP, 4, 2).view(jnp.int32)[..., 0]

    def step_vsortp(st):
        ix, p = st
        ops = (ix,) + tuple(p[:, j] for j in range(4))
        s = jax.lax.sort(ops, num_keys=1)
        return remix(s[0], T), jnp.stack(s[1:], axis=-1)
    bench("lax.sort 1.5M (key + 4 int32 payload)", step_vsortp,
          (idxp0, packedp))

    def step_vsortp8(st):
        ix, p = st
        ops = (ix,) + tuple(p[:, j] for j in range(4)) + tuple(
            p[:, j] for j in range(4))
        s = jax.lax.sort(ops, num_keys=1)
        return remix(s[0], T), jnp.stack(s[1:5], axis=-1)
    bench("lax.sort 1.5M (key + 8 int32 payload)", step_vsortp8,
          (idxp0, packedp))


if __name__ == "__main__":
    main()
