"""CLI: export the pose trajectory from a checkpoint to .npy.

Parity with src/slam/export_pose.py:45-63 (dumps ckpt['pose'] to a stacked
[N, 4, 4] array).

    python -m naruto_tpu.export_pose --ckpt ckpt_final.pkl --out poses.npy
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=None,
                   help="only export the first N poses")
    args = p.parse_args(argv)

    with open(args.ckpt, "rb") as f:
        blob = pickle.load(f)
    poses = np.asarray(blob["poses"])
    if args.num:
        poses = poses[:args.num]
    np.save(args.out, poses)
    print(f"exported {len(poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
