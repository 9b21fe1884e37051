"""Throughput ceiling analysis for the BA mapping iteration on TPU v5e.

Measures, at the EXACT default-bench shapes, the irreducible cost of each
stage class the iteration cannot avoid under reference semantics
(dense-Adam hash-grid training with a sort-based scatter-free backward),
plus hardware speed-of-light references (HBM stream, per-row gather rate,
MXU matmul). The sum of the floors is the ceiling for THIS algorithm
class; PERFORMANCE.md's ceiling section interprets the output.

Honest-timing discipline: the backend is async and caches (executable,
input) pairs, so every step threads fresh data (output feeds next input)
and we report per-rep wall time over many reps.

Run on TPU: python scripts/ceiling_analysis.py  (repo root self-inserted)
"""
from __future__ import annotations

import os as _os
import sys as _sys
import time

# make `python scripts/ceiling_analysis.py` work from anywhere without
# touching PYTHONPATH (which must keep the interpreter's site dir)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import jax

if __import__("os").environ.get("NARUTO_CEILING_SMOKE"):
    # CPU logic check: the config update must precede any computation
    # (jax is pre-imported with the TPU backend at interpreter startup;
    # env vars are too late — CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from naruto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# default-bench shapes (hybrid layout, office0 settings).
# NARUTO_CEILING_SMOKE=1 shrinks everything 16x for a CPU logic check.
import os

_DIV = 16 if os.environ.get("NARUTO_CEILING_SMOKE") else 1
N_RAYS = 2176
S = 43
N_RENDER = N_RAYS * S // _DIV    # 93,568 render points
N_SMOOTH = 31 ** 3 // _DIV       # 29,791 smoothness lattice points
N_PTS = N_RENDER + N_SMOOTH      # 123,359 encode points / iter
L = 4                            # levels
M = 374272 // _DIV               # sorted segment keys / iter (render path)
TABLE_ROWS = 210073 // _DIV      # derived gather-table rows (hybrid)
SLOTS = 204089 // _DIV           # segment-sum slot count
ROW_W = 64                       # 8 corners x 8 features
HASH_ROWS = 131072 // _DIV       # trained hashed cell rows (levels 2-3)


def bench(name, step, state, reps=20):
    step = jax.jit(step)
    state = step(state)
    state = step(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:58s} {ms:8.3f} ms")
    return ms


def remix(x, salt=1):
    """Cheap value churn so every rep sees fresh inputs."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return (x + salt) % jnp.maximum(jnp.max(x), 1)
    return x * (1.0 + 1e-6 * salt)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device={dev.device_kind}  shapes: N_pts={N_PTS} M={M} "
          f"table_rows={TABLE_ROWS} slots={SLOTS} row_w={ROW_W}")
    out = {}

    # ---- 0. dispatch/chain floor ------------------------------------
    x = jnp.zeros((128,), jnp.float32)
    out["dispatch floor (chained scalar add)"] = bench(
        "0. dispatch floor (chained tiny op)", lambda s: s + 1.0, x)

    # ---- 1. HBM stream speed-of-light -------------------------------
    nb = max(64 // _DIV, 2)
    big = jnp.asarray(rng.normal(size=(nb, 1024, 1024)).astype(np.float32))
    ms = bench(f"1. HBM stream: copy {nb * 4} MB (read+write {nb * 8} MB)",
               lambda s: s * 1.000001, big)
    gbps = 2 * big.size * 4 / (ms / 1000) / 1e9
    print(f"   -> effective HBM bandwidth {gbps:,.0f} GB/s")
    out["hbm_gbps"] = gbps

    # ---- 2. forward gather at BA shapes -----------------------------
    table16 = jnp.asarray(
        rng.normal(size=(TABLE_ROWS, ROW_W)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, TABLE_ROWS, N_PTS * L)
                      .astype(np.int32))

    def step_gather(s):
        # fold the gather result into the threaded indices so the gather
        # cannot be dead-code-eliminated from the jitted step
        r = jnp.take(table16, s, axis=0)
        salt = (r[0, 0].astype(jnp.float32) > 1e9).astype(jnp.int32)
        return (s + 1 + salt) % TABLE_ROWS

    out["fwd gather"] = bench(
        f"2. fwd gather: {N_PTS * L:,} x {ROW_W} bf16 rows",
        step_gather, idx)

    # ---- 3. the variadic segment sort -------------------------------
    key = jnp.asarray(np.sort(rng.integers(0, SLOTS, M)).astype(np.int32))
    pay = tuple(jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
                for _ in range(8))

    def step_sort(st):
        k, ps = st
        ops = jax.lax.sort((k,) + ps, num_keys=1)
        return remix(ops[0]), ops[1:]

    out["variadic sort"] = bench(
        f"3. variadic sort: {M:,} keys + 8 int32 payload cols",
        step_sort, (key, pay))
    out["keys-only sort"] = bench(
        f"3b. keys-only sort: {M:,} int32",
        lambda s: remix(jnp.sort(s)), key)

    # batched per-level variant (the default since r3: 4 independent
    # sorts of M/4 — level ranges are disjoint so flat order == concat)
    L_SORT = 4
    mb = M - (M % L_SORT)

    def step_sort_batched(st):
        k, ps = st
        ops = jax.lax.sort(
            tuple(o[:mb].reshape(L_SORT, mb // L_SORT) for o in (k,) + ps),
            dimension=1, num_keys=1)
        return remix(ops[0].reshape(mb)), tuple(
            o.reshape(mb) for o in ops[1:])

    out["batched sort"] = bench(
        f"3c. batched per-level sort: {L_SORT} x {mb // L_SORT:,} keys"
        f" + 8 payload cols",
        step_sort_batched, (key, pay))

    # slim frac-carry payload (sort_carry="frac": 1 packed-frac col + 4
    # grad cols instead of 4 weight + 4 grad)
    def step_sort_slim(st):
        k, ps = st
        ops = jax.lax.sort(
            tuple(o[:mb].reshape(L_SORT, mb // L_SORT)
                  for o in (k,) + ps[:5]),
            dimension=1, num_keys=1)
        return remix(ops[0].reshape(mb)), tuple(
            o.reshape(mb) for o in ops[1:]) + ps[5:]

    out["slim batched sort"] = bench(
        f"3d. batched sort, frac-carry payload: {L_SORT} x"
        f" {mb // L_SORT:,} keys + 5 payload cols",
        step_sort_slim, (key, pay))

    # ---- 4. expand + cumsum (segment-sum core) ----------------------
    a16 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def step_cumsum(st):
        a, b = st
        u = (a[:, :, None] * b[:, None, :]).reshape(M, ROW_W)
        cs = jnp.cumsum(u.astype(jnp.float32), axis=0)
        return remix(a), (cs[-1, :8] * 1e-9).astype(jnp.bfloat16) + b

    out["expand+cumsum"] = bench(
        f"4. outer expand + f32 cumsum: [{M:,}, {ROW_W}]",
        step_cumsum, (a16, b16))

    # ---- 5. boundary gather (dense grad read-out) -------------------
    cs = jnp.asarray(rng.normal(size=(M, ROW_W)).astype(np.float32))
    ub = jnp.asarray(np.sort(rng.integers(0, M, SLOTS)).astype(np.int32))

    def step_bgather(s):
        r = jnp.take(cs, s, axis=0)
        salt = (r[0, 0] > 1e9).astype(jnp.int32)
        return jnp.minimum(s + salt + (s[0] % 2), M - 1)   # stays sorted

    out["boundary gather"] = bench(
        f"5. boundary gather: {SLOTS:,} x {ROW_W} f32 rows",
        step_bgather, ub)

    # ---- 6. dense Adam sweep over the table group -------------------
    p = jnp.asarray(rng.normal(size=(HASH_ROWS, ROW_W)).astype(np.float32))
    m_ = jnp.zeros_like(p)
    v_ = jnp.zeros_like(p)
    g = jnp.asarray(rng.normal(size=(HASH_ROWS, ROW_W)).astype(np.float32))

    def step_adam(st):
        p, m, v, g = st
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        p = p - 0.01 * m / (jnp.sqrt(v) + 1e-8)
        return p, m, v, g * 1.000001

    out["adam sweep"] = bench(
        f"6. Adam sweep: 4x [{HASH_ROWS:,}, {ROW_W}] f32 in, 3 out",
        step_adam, (p, m_, v_, g))

    # ---- 7. MXU: blend + MLP matmul flops ---------------------------
    emb = jnp.asarray(rng.normal(size=(N_PTS, 512)).astype(np.float32)) \
        .astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32)) \
        .astype(jnp.bfloat16)

    def step_mm(st):
        e, w = st
        return (e @ w).astype(jnp.bfloat16), w

    ms = bench(f"7. MXU ref: [{N_PTS:,}, 512] @ [512, 512] bf16",
               step_mm, (emb, w1))
    tflops = 2 * N_PTS * 512 * 512 / (ms / 1000) / 1e12
    print(f"   -> {tflops:,.0f} TFLOP/s bf16")
    out["mxu_tflops"] = tflops

    # ---- 8. chunk_ranks at BA shapes --------------------------------
    from naruto_tpu.ops.segment import _chunk_ranks, _merge_ranks

    def rank_step(fn):
        # input stays a SORTED [M] key array every rep: fold a data-
        # dependent 0/1 salt in (adding a constant preserves sortedness,
        # clamped to the slot range) — no shape drift, no extra sort
        def step(s):
            ub = fn(s, SLOTS)
            salt = (ub[-1] % 2).astype(jnp.int32)
            return jnp.minimum(s + salt, SLOTS - 1)
        return step

    out["chunk_ranks"] = bench(
        f"8. chunk_ranks boundary search: {M:,} keys -> {SLOTS:,} slots",
        rank_step(_chunk_ranks), key)
    out["merge_ranks"] = bench(
        "8b. merge-rank double-argsort (replaced)",
        rank_step(_merge_ranks), key)

    # ---- summary ----------------------------------------------------
    render_only = {
        "fwd gather": out["fwd gather"],
        "variadic sort": out["variadic sort"],
        "expand+cumsum": out["expand+cumsum"],
        "boundary gather": out["boundary gather"],
        "adam sweep": out["adam sweep"],
        "chunk_ranks": out["chunk_ranks"],
    }
    floor = sum(render_only.values())
    print("\n--- ceiling: sum of measured stage floors "
          "(excl. dispatch, excl. render/z/losses/MLPs) ---")
    for k, v in render_only.items():
        print(f"   {k:24s} {v:7.3f} ms")
    print(f"   sum = {floor:.3f} ms -> {1000 / floor:,.0f} it/s ceiling for "
          f"the sort-based dense-Adam algorithm class at these shapes")


if __name__ == "__main__":
    main()
