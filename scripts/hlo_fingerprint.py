"""Lower the bench BA graph (bucket 512) to StableHLO text and print a
hash + size, so two code revisions can be compared without a device.

Usage: python scripts/hlo_fingerprint.py <repo_root> <label>
"""
import hashlib
import os
import sys

if len(sys.argv) != 3:
    sys.exit("usage: hlo_fingerprint.py <repo_root> <label>")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, sys.argv[1])
from naruto_tpu.config import make_config
from naruto_tpu.mapping.mapper import Mapper
from naruto_tpu.mapping.keyframes import add_keyframe

cfg = make_config("Replica", "office0")
mapper = Mapper(cfg)
H, W = mapper.H, mapper.W
depth = np.full((H, W), 1.5, dtype=np.float32)
u = np.linspace(0, 1, W, dtype=np.float32)
color = np.stack([np.tile(u, (H, 1)),
                  np.full((H, W), 0.3, np.float32),
                  np.full((H, W), 0.6, np.float32)], axis=-1)
c2w = np.eye(4, dtype=np.float32)
frame_rays = mapper.frame_to_rays(color, depth)
key = jax.random.PRNGKey(0)
for s in range(22):
    key, k = jax.random.split(key)
    mapper.state = mapper.state._replace(
        kf=add_keyframe(mapper.state.kf, frame_rays,
                        s * cfg.mapper.keyframe_every, k))

bucket = mapper._pick_bucket(int(mapper.state.kf.count))
ba = mapper._get_ba_jit(bucket)
lowered = ba.lower(mapper.state, frame_rays, jnp.asarray(c2w), 110,
                   jax.random.PRNGKey(1))
txt = lowered.as_text()
print(sys.argv[2], "bucket", bucket, "len", len(txt),
      "sha", hashlib.sha256(txt.encode()).hexdigest()[:16])
label = os.path.basename(sys.argv[2])
with open(f"/tmp/hlo_{label}.txt", "w") as f:
    f.write(txt)
