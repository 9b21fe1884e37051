"""Decompose one BA iteration into parts and time each honestly on TPU.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/microbench_ba_parts.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from naruto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update
from naruto_tpu.mapping.field import (FieldSpec, field_query,
                                      init_field_params)
from naruto_tpu.mapping.losses import LossWeights, total_loss
from naruto_tpu.mapping.render import RenderConfig, render_rays

N_RAYS = 2176
S = 43
N_PTS = N_RAYS * S


def bench(name, step, state, reps=10):
    try:
        step = jax.jit(step)
        state = step(state)
        state = step(state)
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    except Exception as e:  # noqa
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1000:8.2f} ms")


def main():
    cfg = make_config("Replica", "office0")
    import os as _os
    lay = _os.environ.get("NARUTO_MB_LAYOUT")
    if lay:
        cfg = deep_update(cfg, {"grid": {"layout": lay}})
    m = cfg.mapper
    spec = FieldSpec(
        bound=tuple(tuple(b) for b in m.bound),
        n_levels=cfg.grid.n_levels, n_features=cfg.grid.n_features_per_level,
        log2_hashmap_size=cfg.grid.hash_size,
        base_resolution=cfg.grid.base_resolution,
        table_dtype=cfg.grid.table_dtype, table_layout=cfg.grid.layout,
        voxel_sdf=cfg.grid.voxel_sdf)
    rc = RenderConfig()
    lw = LossWeights()
    params = init_field_params(jax.random.PRNGKey(0), spec)
    tshapes = [np.shape(x) for x in
               jax.tree_util.tree_leaves(params['table'])]
    print(f"device={jax.devices()[0]} layout={spec.table_layout} "
          f"table={tshapes} pts={N_PTS}")

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x01 = jax.random.uniform(k1, (N_PTS, 3))
    rays_o = jax.random.uniform(k1, (N_RAYS, 3)) * 2 - 1
    rays_d = jax.random.normal(k2, (N_RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t_rgb = jax.random.uniform(k2, (N_RAYS, 3))
    t_d = jax.random.uniform(k1, (N_RAYS, 1)) * 2 + 0.5
    mask = jnp.ones((N_RAYS,))

    # A. full loss fwd+bwd (one BA-iteration gradient, incl. smoothness)
    def loss_fn(p, key):
        from naruto_tpu.mapping.losses import smoothness_points
        k_render, k_smooth = jax.random.split(key)
        extra, _ = smoothness_points(spec, k_smooth, lw)
        rend = render_rays(p, spec, rc, k_render, rays_o, rays_d, t_d,
                           extra_pts01=extra)
        loss, _ = total_loss(p, spec, rend, t_rgb, t_d, mask, k_smooth, lw)
        return loss

    def step_full(st):
        p, key = st
        key, k = jax.random.split(key)
        g = jax.grad(loss_fn)(p, k)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return p, key
    bench("A full loss fwd+bwd (1 iter)", step_full, (params, key))

    # A2. without smoothness
    def loss_ns(p, key):
        rend = render_rays(p, spec, rc, key, rays_o, rays_d, t_d)
        loss, _ = total_loss(p, spec, rend, t_rgb, t_d, mask, key, lw,
                             with_smooth=False)
        return loss

    def step_ns(st):
        p, key = st
        key, k = jax.random.split(key)
        g = jax.grad(loss_ns)(p, k)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return p, key
    bench("A2 loss fwd+bwd, no smoothness", step_ns, (params, key))

    # B. field_query fwd+bwd only (93.6k pts)
    def step_field(st):
        p, x = st
        def f(p):
            raw = field_query(p, x, spec)
            return jnp.sum(raw * raw)
        g = jax.grad(f)(p)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return p, (x + 1e-6) % 1.0
    bench("B field_query fwd+bwd (93.6k pts)", step_field, (params, x01))

    # B2. forward only
    def step_fwd(st):
        p, x, acc = st
        raw = field_query(p, x, spec)
        return p, (x + 1e-6) % 1.0, acc + jnp.sum(raw[:1])
    bench("B2 field_query fwd only", step_fwd, (params, x01, jnp.zeros(())))

    # C. renderer+losses with a stub field (isolates non-field graph)
    def stub_query(p, x01_, spec_):
        w = p["stub"]
        return jnp.tanh(x01_ @ w)                    # [N, 5]

    import naruto_tpu.mapping.render as render_mod
    orig_fq = render_mod.field_query
    render_mod.field_query = stub_query
    stub_params = {"stub": jax.random.normal(k1, (3, 5)) * 0.1}

    def loss_stub(p, key):
        rend = render_rays(p, spec, rc, key, rays_o, rays_d, t_d)
        loss, _ = total_loss(p, spec, rend, t_rgb, t_d, mask, key, lw,
                             with_smooth=False)
        return loss

    def step_stub(st):
        p, key = st
        key, k = jax.random.split(key)
        g = jax.grad(loss_stub)(p, k)
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, p, g)
        return p, key
    # total_loss uses rend["uncert_map"] only if present; stub has no
    # uncert grid -> spec.has_uncert still True, render uses raw[...,4]
    bench("C renderer+losses, stub field", step_stub, (stub_params, key))
    render_mod.field_query = orig_fq

    # D. optimizer update alone (embed fused-adam + decoder optax)
    from naruto_tpu.mapping.mapper import (DECODER_KEYS, _embed_adam_update,
                                           _init_embed_state,
                                           _make_decoder_optimizer)
    dec_tx = _make_decoder_optimizer(cfg)
    opt0 = {"embed": _init_embed_state(params["table"]),
            "decoder": dec_tx.init({k: params[k] for k in DECODER_KEYS})}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def step_opt(st):
        import optax
        p, opt = st
        p = dict(p)
        opt = dict(opt)
        dec_p = {k: p[k] for k in DECODER_KEYS}
        upd, opt["decoder"] = dec_tx.update(
            {k: grads[k] for k in DECODER_KEYS}, opt["decoder"], dec_p)
        p.update(optax.apply_updates(dec_p, upd))
        p["table"], opt["embed"] = _embed_adam_update(
            p["table"], grads["table"], opt["embed"], 0.01)
        return p, opt
    bench("D optimizer update (map groups)", step_opt, (params, opt0))

    # E. z sampling + sort alone
    def step_z(st):
        key, acc = st
        key, k = jax.random.split(key)
        from naruto_tpu.mapping.render import sample_z_vals
        z = sample_z_vals(k, t_d, rc)
        return key, acc + jnp.sum(z[:1])
    bench("E z sampling (incl. 43-wide sort)", step_z, (key, jnp.zeros(())))

    # F. field-backward sub-stages (cell/hybrid layouts), chained fresh
    # inputs — the per-primitive floor table for the ceiling analysis
    gspec = spec.hash_spec
    if gspec.cell_rows:
        L = gspec.n_levels
        M = N_PTS * L
        Mp = -(-M // 512) * 512
        size = gspec.total_entries
        total_rows = sum(np.prod(s[:-1]) if len(s) > 1 else s[0]
                         for s in tshapes)
        print(f"   [F sizes: M={M} (pad {Mp}) slots={size} "
              f"table_rows={int(total_rows)}]")

        def mk(key, shape, dt=jnp.float32):
            return jax.random.uniform(key, shape, dtype=jnp.float32) \
                .astype(dt)

        idx0 = jax.random.randint(k1, (M,), 0, size, dtype=jnp.int32)
        wa0 = mk(k1, (M, 8), jnp.bfloat16)
        gb0 = mk(k2, (M, gspec.n_features), jnp.bfloat16)

        # F1 variadic sort (key + 8 packed payload columns, the real widths)
        a_pack = wa0.reshape(M, 4, 2).view(jnp.int32)[..., 0]
        b_pack = gb0.reshape(M, gspec.n_features // 2, 2) \
            .view(jnp.int32)[..., 0]

        def step_sort(st):
            idx, acc = st
            ops = (idx,) + tuple(a_pack[:, j] for j in range(4)) + tuple(
                b_pack[:, j] for j in range(b_pack.shape[1]))
            so = jax.lax.sort(ops, num_keys=1)
            return (so[0] + 1) % size, acc + so[1][0]
        bench("F1 variadic sort (key + 8 payload cols)", step_sort,
              (idx0, jnp.zeros((), jnp.int32)))

        # F2 merge-rank boundary positions
        from naruto_tpu.ops.segment import _merge_ranks
        sidx0 = jnp.sort(idx0)

        def step_rank(st):
            sidx, acc = st
            ub = _merge_ranks(sidx, size)
            return (sidx + 1) % size, acc + ub[0]
        bench("F2 merge-rank (double argsort)", step_rank,
              (sidx0, jnp.zeros((), jnp.int32)))

        # F3 outer_cumsum Pallas kernel alone
        from naruto_tpu.ops.pallas_kernels import (outer_cumsum,
                                                   outer_cumsum_supported)
        sa0 = mk(k1, (Mp, 8), jnp.bfloat16)
        sb0 = mk(k2, (Mp, gspec.n_features), jnp.bfloat16)
        if outer_cumsum_supported():
            def step_oc(st):
                sa, acc = st
                cs = outer_cumsum(sa, sb0)
                return sa + jnp.bfloat16(1e-3), acc + cs[-1, 0]
            bench("F3 outer_cumsum Pallas (expand+scan)", step_oc,
                  (sa0, jnp.zeros(())))

        # F3b XLA expand+cumsum for comparison
        def step_ocx(st):
            sa, acc = st
            sv = (sa[:, :, None] * sb0[:, None, :]).astype(jnp.float32) \
                .reshape(Mp, -1)
            cs = jnp.cumsum(sv, axis=0)
            return sa + jnp.bfloat16(1e-3), acc + cs[-1, 0]
        bench("F3b XLA expand+cumsum", step_ocx, (sa0, jnp.zeros(())))

        # F4 boundary gather + adjacent diff
        cs0 = mk(k1, (Mp, 8 * gspec.n_features))
        ub0 = jnp.sort(jax.random.randint(k2, (size,), 0, M,
                                          dtype=jnp.int32))

        def step_bnd(st):
            ub, acc = st
            hi = jnp.where((ub > 0)[:, None],
                           cs0[jnp.maximum(ub - 1, 0)], 0.0)
            out = hi - jnp.concatenate(
                [jnp.zeros((1, hi.shape[1])), hi[:-1]])
            return (ub + 1) % M, acc + out[0, 0]
        bench("F4 boundary gather + diff", step_bnd,
              (ub0, jnp.zeros(())))

        # F5 derived gather-table build (hybrid only)
        if gspec.layout == "hybrid":
            from naruto_tpu.ops.encoding import derived_gather_table

            def step_drv(st):
                p, acc = st
                gt = derived_gather_table(p, gspec, jnp.bfloat16)
                p = jax.tree_util.tree_map(lambda a: a * 0.9999, p)
                return p, acc + gt[0, 0].astype(jnp.float32)
            bench("F5 derived gather-table build", step_drv,
                  (params["table"], jnp.zeros(())))

        # F6 raw row gather at forward width
        flat0 = mk(k1, (size, 8 * gspec.n_features), jnp.bfloat16)
        gidx0 = jax.random.randint(k2, (N_PTS * L,), 0, size,
                                   dtype=jnp.int32)

        def step_gather(st):
            gi, acc = st
            rows = jnp.take(flat0, gi, axis=0)
            return (gi + 1) % size, acc + rows[0, 0].astype(jnp.float32)
        bench("F6 fwd row gather (M rows x 8F bf16)", step_gather,
              (gidx0, jnp.zeros(())))

        # F7 fused-adam table update alone
        from naruto_tpu.mapping.mapper import (_embed_adam_update,
                                               _init_embed_state)
        est0 = _init_embed_state(params["table"])
        g_tab = jax.tree_util.tree_map(jnp.ones_like, params["table"])

        def step_fadam(st):
            p, est = st
            p, est = _embed_adam_update(p, g_tab, est, 0.01)
            return p, est
        bench("F7 table Adam (fused pass)", step_fadam,
              (params["table"], est0))


if __name__ == "__main__":
    main()
