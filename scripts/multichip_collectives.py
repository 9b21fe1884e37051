"""Quantify the multi-chip story: count the collectives XLA inserts into
the sharded production BA step, size them at production shapes, and model
ICI time on v5e at 2/4/8 chips (VERDICT r3 weak#5 — the scale-out path
needs numbers, not just a passing dryrun).

Method:
  1. compile the PRODUCTION Mapper BA step (mapper._get_ba_jit) on an
     8-virtual-device CPU mesh and count collective ops in the optimized
     HLO (counts are shape-independent; the tiny config compiles in
     seconds);
  2. size the gradient all-reduce at PRODUCTION (Replica office0) shapes
     from the real param tree;
  3. apply the scaling-book ring model for v5e ICI to project it/s vs
     chips from the measured single-chip decomposition.

Run: python scripts/multichip_collectives.py [--n-devices 8]
"""
from __future__ import annotations

import argparse
import os as _os
import re
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

# v5e interconnect model (public "How to Scale Your Model" constants):
# 45 GB/s one-way per ICI link, 2D torus (2 links per mesh axis per
# direction). A bidirectional-ring all-reduce of B bytes over one mesh
# axis costs ~2*B*(n-1)/n at 2*45 GB/s effective axis bandwidth.
ICI_ONEWAY_BYTES_PER_S = 45e9
AXIS_BW = 2 * ICI_ONEWAY_BYTES_PER_S        # both ring directions

# Measured single-chip decomposition at the r4 default (57.4 it/s =
# 17.4 ms/iter; PERFORMANCE.md floor table): the table Adam (~1.0 ms)
# and dispatch/glue that does not shrink with rays (~1.3 ms) are
# per-chip fixed; the rest scales with rays/chip under DP.
SINGLE_CHIP_MS = 17.4
FIXED_MS = 2.3


COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\b")


def count_collectives(hlo_text: str) -> dict:
    """Count collective op APPLICATIONS in optimized HLO. The op name is
    matched only when not preceded by '%' (operand references like
    get-tuple-element(%all-reduce.25) don't count) and followed by '(';
    tuple-typed results like `= (f32[], f32[]) all-reduce(...)` are
    covered (a simple `= <type> <op>(` regex misses them — the r4 bug
    that reported 0 all-reduces). -done halves of async pairs are
    skipped so starts aren't double-counted."""
    counts: dict = {}
    pat = re.compile(r"(?<!%)\b(all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)(-start|-done)?\(")
    for m in pat.finditer(hlo_text):
        if m.group(2) == "-done":
            continue
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def compiled_ba_hlo(n_devices: int):
    import jax

    if getattr(jax.config, "jax_platforms", None) != "cpu":
        flags = _os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            _os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as ge
    from naruto_tpu.mapping.mapper import Mapper

    cfg = ge.tiny_mapper_config(n_devices)
    mapper = Mapper(cfg)
    assert mapper._ba_mesh is not None

    import numpy as np

    H, W = mapper.H, mapper.W
    frame_rays = mapper.frame_to_rays(
        np.full((H, W, 3), 0.5, np.float32),
        np.full((H, W), 1.2, np.float32))
    import jax.numpy as jnp

    from naruto_tpu.mapping.keyframes import add_keyframe
    key = jax.random.PRNGKey(0)
    for s in range(3):
        key, k = jax.random.split(key)
        mapper.state = mapper.state._replace(
            kf=add_keyframe(mapper.state.kf, frame_rays, s * 5, k))
    bucket = mapper._pick_bucket(int(mapper.state.kf.count))
    ba = mapper._get_ba_jit(bucket)
    lowered = ba.lower(mapper.state, frame_rays,
                       jnp.eye(4), 10, jax.random.PRNGKey(1))
    txt = lowered.compile().as_text()
    return txt, mapper, cfg


def production_grad_bytes() -> dict:
    """Bytes all-reduced per BA iteration at Replica office0 shapes =
    the full field-param tree (grads match param shapes/dtypes)."""
    import jax

    from naruto_tpu.config import make_config
    from naruto_tpu.mapping.mapper import Mapper

    cfg = make_config("Replica", "office0")
    cfg.parallel.shard_rays = False          # just need the param tree
    mapper = Mapper(cfg)
    sizes = {}
    for name, leaf_tree in mapper.state.params.items():
        b = sum(x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(leaf_tree))
        sizes[name] = b
    return sizes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-devices", type=int, default=8)
    args = ap.parse_args()

    txt, mapper, cfg = compiled_ba_hlo(args.n_devices)
    counts = count_collectives(txt)
    iters = cfg.mapper.iters
    print(f"collectives in the compiled sharded BA step "
          f"(mesh=({args.n_devices},), scan of {iters} iterations):")
    for k, v in sorted(counts.items()):
        print(f"  {k:20s} x{v}")
    total = sum(counts.values())
    print(f"  total HLO collective ops: {total} "
          f"(scan body executes per iteration)")

    sizes = production_grad_bytes()
    gb = sum(sizes.values())
    print("\nproduction gradient bytes per BA iteration "
          "(param tree = grad tree):")
    for k, v in sorted(sizes.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v / 1e6:8.2f} MB")
    print(f"  {'TOTAL':12s} {gb / 1e6:8.2f} MB")

    print("\nprojected DP scaling on v5e "
          f"(ring all-reduce model, axis bw {AXIS_BW / 1e9:.0f} GB/s; "
          f"single-chip {SINGLE_CHIP_MS} ms = {FIXED_MS} ms fixed + "
          f"{SINGLE_CHIP_MS - FIXED_MS} ms ray-proportional):")
    print(f"  {'chips':>5s} {'compute ms':>10s} {'ar ms':>6s} "
          f"{'iter ms':>8s} {'it/s':>7s} {'vs 1 chip':>9s}")
    base = None
    for n in (1, 2, 4, 8):
        ar_ms = (0.0 if n == 1
                 else 2 * gb * (n - 1) / n / AXIS_BW * 1e3)
        comp_ms = (SINGLE_CHIP_MS - FIXED_MS) / n + FIXED_MS
        # the all-reduce overlaps poorly with the serialized sort tail;
        # model it as additive (pessimistic)
        it_ms = comp_ms + ar_ms
        ips = 1e3 / it_ms
        base = base or ips
        print(f"  {n:5d} {comp_ms:10.2f} {ar_ms:6.2f} "
              f"{it_ms:8.2f} {ips:7.1f} {ips / base:8.2f}x")


if __name__ == "__main__":
    main()
