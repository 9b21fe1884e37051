"""Micro-benchmarks for the hash-grid hot-loop primitives on real TPU.

Run:  PYTHONPATH=. python scripts/microbench_primitives.py [--quick]

Harness: each benchmark is ONE jitted step(state) -> state whose outputs
feed the next call's inputs (fresh values defeat the backend's
(executable, input) cache); two warmup calls compile + settle, then reps
are timed with a single block at the end.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from naruto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

M = 3_000_000        # updates per BA iter (93.6k pts x 4 levels x 8 corners)
T = 201_000          # hash table rows
F = 8                # features per row
PRIME = 2654435761


def bench(name, step_fn, state, reps=10):
    try:
        step = jax.jit(step_fn)
        state = step(state)
        state = step(state)
        jax.block_until_ready(state)
    except Exception as e:  # noqa
        print(f"{name:55s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:55s} {dt:9.2f} ms")
    return dt


def remix(ix, mod):
    """cheap index remix to keep inputs fresh (uniform-ish)."""
    return ((ix * np.uint32(PRIME)).astype(jnp.uint32)
            % np.uint32(mod)).astype(jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 5 if args.quick else 10

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx0 = jax.random.randint(k1, (M,), 0, T, dtype=jnp.int32)
    upd0 = jax.random.normal(k2, (M, F), dtype=jnp.float32)
    table_f32 = jax.random.normal(k2, (T, F), dtype=jnp.float32)
    jax.block_until_ready((idx0, upd0, table_f32))
    print(f"device={jax.devices()[0]}  M={M}  T={T}  F={F}")

    # ---------------- 1. XLA take
    def mk_take(tbl):
        def step(st):
            ix, acc = st
            out = jnp.take(tbl, ix, axis=0)
            return remix(ix, T), acc + jnp.sum(out[:, :1].astype(jnp.float32))
        return step

    bench("xla take [T,8] f32 x 3M", mk_take(table_f32),
          (idx0, jnp.zeros(()),), reps)
    bench("xla take [T,8] bf16 x 3M", mk_take(table_f32.astype(jnp.bfloat16)),
          (idx0, jnp.zeros(()),), reps)

    tw = jnp.tile(table_f32.astype(jnp.bfloat16), (1, 8))[: T // 8]
    def step_wide(st):
        ix, acc = st
        out = jnp.take(tw, ix, axis=0)
        return remix(ix, T // 8), acc + jnp.sum(out[:, :1].astype(jnp.float32))
    bench("xla take [25k,64] bf16 x 375k", step_wide,
          (idx0[: M // 8] % (T // 8), jnp.zeros(())), reps)

    # ---------------- 2. sorts
    packed0 = upd0.astype(jnp.bfloat16).reshape(M, F // 2, 2).view(jnp.int32)[..., 0]

    def step_vsort(st):
        ix, p = st
        ops = (ix,) + tuple(p[:, j] for j in range(F // 2))
        s = jax.lax.sort(ops, num_keys=1)
        return remix(s[0], T), jnp.stack(s[1:], axis=-1)
    bench("lax.sort 3M (key + 4 int32 payload)", step_vsort,
          (idx0, packed0), reps)

    def step_ksort(st):
        ix, = st
        s, pos = jax.lax.sort((ix, jax.lax.iota(jnp.int32, M)), num_keys=1)
        return (remix(s ^ pos, T),)
    bench("lax.sort 3M (key + iota)", step_ksort, (idx0,), reps)

    def step_psort(st):
        ix, = st
        s, pos = jax.lax.sort((ix, jax.lax.iota(jnp.int32, 96_000)),
                              num_keys=1)
        return (remix(s ^ pos, T),)
    bench("lax.sort 96k (key + iota)", step_psort, (idx0[:96_000],), reps)

    # ---------------- 3. merge-rank boundaries (current impl)
    def step_mr(st):
        si, = st
        merged = jnp.concatenate(
            [si * 2, jnp.arange(T, dtype=jnp.int32) * 2 + 1])
        rank = jnp.argsort(jnp.argsort(merged))
        ub = rank[M:] - jnp.arange(T, dtype=jnp.int32)
        return (jnp.sort(remix(si ^ ub[:1], T)),)
    bench("merge-rank (2 argsorts of 3.2M)", step_mr,
          (jnp.sort(idx0),), reps)

    # ---------------- 4. cumsum
    def step_cs(st):
        v, = st
        c = jnp.cumsum(v, axis=0)
        return (v + c[-1:] * 1e-9,)
    bench("xla cumsum [3M,8] f32", step_cs, (upd0,), reps)

    # ---------------- current full dense_segment_sum for reference
    from naruto_tpu.ops.segment import dense_segment_sum

    def step_dss(st):
        ix, v = st
        out = dense_segment_sum(ix, v, T)
        return remix(ix, T), v + out[:1] * 1e-9
    bench("dense_segment_sum (current XLA path)", step_dss,
          (idx0, upd0), reps)

    # ---------------- pallas kernels
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TPAD = ((T + 127) // 128) * 128

    # 5. post-sort windowed one-hot accumulate (VMEM output, accumulated)
    BK = 2048
    WIN = 2048

    def seg_kernel(si_ref, sv_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ix = si_ref[:]                               # [BK] int32 sorted
        vals = sv_ref[:]                             # [BK, F]
        lo = pl.multiple_of((ix[0] // 8) * 8, 8)
        col = jax.lax.broadcasted_iota(jnp.int32, (BK, WIN), 1) + lo
        oh = (ix[:, None] == col).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            oh, vals.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [WIN, F]
        cur = out_ref[pl.ds(lo, WIN), :]
        out_ref[pl.ds(lo, WIN), :] = cur + contrib

    def pallas_seg(si, sv):
        return pl.pallas_call(
            seg_kernel,
            grid=(M // BK,),
            in_specs=[
                pl.BlockSpec((BK,), lambda b: (b,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, F), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TPAD, F), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TPAD, F), jnp.float32),
        )(si, sv)

    si0 = jnp.sort(idx0)
    sv0 = upd0

    def step_pseg(st):
        si, sv = st
        out = pallas_seg(si, sv)
        return jnp.sort(remix(si, T)), sv + out[:1] * 1e-9
    r = bench("pallas post-sort windowed accumulate", step_pseg,
              (si0, sv0), reps)
    if r is not None:
        ref = jax.ops.segment_sum(sv0, si0, num_segments=TPAD)
        got = pallas_seg(si0, sv0)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"    max abs err vs segment_sum: {err:.2e} "
              f"(bf16 one-hot path)")

    # 6. in-kernel gather from VMEM-resident table: take_along_axis variant
    TS = 65536
    table_lvl = jnp.tile(table_f32.astype(jnp.bfloat16)[: TS // 4], (4, 1))

    def take_kernel(tbl_ref, idx_ref, out_ref):
        ix = idx_ref[:]                              # [BK]
        tbl = tbl_ref[:]                             # [TS, F]
        out_ref[:] = jnp.take_along_axis(
            tbl, ix[:, None].astype(jnp.int32), axis=0)

    def pallas_take(tbl, ix):
        return pl.pallas_call(
            take_kernel,
            grid=(M // BK,),
            in_specs=[
                pl.BlockSpec((TS, F), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK,), lambda b: (b,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BK, F), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), tbl.dtype),
        )(tbl, ix)

    def step_ptake(st):
        ix, acc = st
        out = pallas_take(table_lvl, ix)
        return remix(ix, TS), acc + jnp.sum(out[:1].astype(jnp.float32))
    r = bench("pallas take_along_axis (VMEM tbl) 3M", step_ptake,
              (idx0 % TS, jnp.zeros(())), reps)
    if r is not None:
        ref = jnp.take(table_lvl, idx0 % TS, axis=0)
        got = pallas_take(table_lvl, idx0 % TS)
        print("    match:", bool(jnp.all(ref == got)))

    # 6b. same but jnp.take inside kernel
    def take_kernel2(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    def pallas_take2(tbl, ix):
        return pl.pallas_call(
            take_kernel2,
            grid=(M // BK,),
            in_specs=[
                pl.BlockSpec((TS, F), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BK,), lambda b: (b,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BK, F), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), tbl.dtype),
        )(tbl, ix)

    def step_ptake2(st):
        ix, acc = st
        out = pallas_take2(table_lvl, ix)
        return remix(ix, TS), acc + jnp.sum(out[:1].astype(jnp.float32))
    bench("pallas jnp.take (VMEM tbl) 3M", step_ptake2,
          (idx0 % TS, jnp.zeros(())), reps)

    # 7. pallas blocked cumsum via lower-triangular matmul + carry
    CB = 1024
    tri = jnp.tril(jnp.ones((CB, CB), jnp.float32))

    def cs_kernel(v_ref, tri_ref, out_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        v = v_ref[:]
        c = jax.lax.dot_general(
            tri_ref[:], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + carry_ref[:]
        out_ref[:] = c
        carry_ref[:] = c[CB - 1:CB, :]

    def pallas_cumsum(v):
        return pl.pallas_call(
            cs_kernel,
            grid=(M // CB,),
            in_specs=[
                pl.BlockSpec((CB, F), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CB, CB), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CB, F), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, F), jnp.float32)],
        )(v, tri)

    def step_pcs(st):
        v, = st
        c = pallas_cumsum(v)
        return (v + c[-1:] * 1e-9,)
    r = bench("pallas tri-matmul cumsum [3M,8]", step_pcs, (upd0,), reps)
    if r is not None:
        ref = jnp.cumsum(upd0, axis=0)
        got = pallas_cumsum(upd0)
        rel = float(jnp.max(jnp.abs(ref - got) / (jnp.abs(ref) + 1e-3)))
        print(f"    max rel err: {rel:.2e}")

    # 8. one-hot matmul scatter for small dense level (XLA)
    T0 = 4913
    def step_oh(st):
        ix, v = st
        oh = jax.nn.one_hot(ix, 5120, dtype=jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, v.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return remix(ix, T0), v + out[:1] * 1e-9
    bench("xla one-hot matmul scatter 750k->4913", step_oh,
          (idx0[:750_000] % T0, upd0[:750_000]), reps)


if __name__ == "__main__":
    main()
