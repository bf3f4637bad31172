"""Measure image-conditional input-pipeline throughput (round-4 VERDICT #7).

Builds realistic synthetic on-disk trees for the two image-conditional
datasets — Taskonomy (256x256 jpg + per-building h5 clouds, SURVEY hard-part
#7) and ShapeNet-vol (137x137 Choy renders + cameras.npz) — then measures
LOADER-ONLY batches/s at the production batch size against the device's
measured conditional train-step demand.

Host-side only (no TPU). Usage:
    python scripts/measure_cond_loader.py [--batch 48] [--steps 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_taskonomy_tree(root: str, n_buildings=4, items_per=96, n_points=2048,
                         im_size=256):
    import h5py
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "point_clouds"), exist_ok=True)
    names = [f"building{b}" for b in range(n_buildings)]
    for name in names:
        rgb_dir = os.path.join(root, "rgb", name)
        os.makedirs(rgb_dir, exist_ok=True)
        with h5py.File(os.path.join(root, "point_clouds", f"{name}.h5"), "w") as f:
            f["point"] = np.arange(items_per)
            f["view"] = np.zeros(items_per, np.int64)
            f["pc"] = rng.normal(size=(items_per, n_points, 3)).astype(np.float32)
            f["k"] = np.tile(np.eye(3, dtype=np.float32), (items_per, 1, 1))
        # one real jpg, hard-linked into every view slot: jpg DECODE cost is
        # what we're measuring and identical bytes decode at identical cost,
        # while writing 384 unique 256^2 jpgs would just slow tree setup
        first = os.path.join(rgb_dir, f"{name}_0_0.jpg")
        img = (rng.random((im_size, im_size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(first, quality=92)
        for i in range(1, items_per):
            os.link(first, os.path.join(rgb_dir, f"{name}_{i}_0.jpg"))
    with open(os.path.join(root, "taskonomy_split.csv"), "w") as f:
        f.write("name,train,val,test\n")
        for name in names:
            f.write(f"{name},1,0,0\n")


def build_shapenet_vol_tree(root: str, n_models=16, n_views=24, im_size=137):
    from PIL import Image

    rng = np.random.default_rng(1)
    synset = os.path.join(root, "02691156")
    ids = []
    for m in range(n_models):
        oid = f"model{m:03d}"
        ids.append(oid)
        mdir = os.path.join(synset, oid)
        img_dir = os.path.join(mdir, "img_choy2016")
        os.makedirs(img_dir, exist_ok=True)
        np.savez(
            os.path.join(mdir, "pointcloud.npz"),
            points=rng.normal(size=(30000, 3)).astype(np.float32),
            scale=np.float32(2.0),
            loc=np.zeros(3, np.float32),
        )
        cams = {}
        for i in range(n_views):
            cams[f"world_mat_{i}"] = np.concatenate(
                [np.eye(3), np.array([[0.0], [0.0], [4.0]])], axis=1
            ).astype(np.float32)
            cams[f"camera_mat_{i}"] = np.array(
                [[140.0, 0, 69.0], [0, 140.0, 69.0], [0, 0, 1.0]], np.float32
            )
        np.savez(os.path.join(img_dir, "cameras.npz"), **cams)
        first = os.path.join(img_dir, "000.jpg")
        img = (rng.random((im_size, im_size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(first, quality=92)
        for i in range(1, n_views):
            os.link(first, os.path.join(img_dir, f"{i:03d}.jpg"))
    with open(os.path.join(synset, "train.lst"), "w") as f:
        f.write("\n".join(ids))


def measure(loader, n_batches: int, warmup: int = 8) -> float:
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--num-workers", type=int, default=8)
    args = ap.parse_args()

    from gecco_tpu.data import dataloader
    from gecco_tpu.data.shapenet_vol import ShapeNetVol
    from gecco_tpu.data.taskonomy import Taskonomy

    results = {}
    with tempfile.TemporaryDirectory() as root:
        build_taskonomy_tree(root)
        ds = Taskonomy(root, split="train", n_points=2048)
        loader = dataloader(
            ds, batch_size=args.batch, num_steps=args.steps + 16,
            num_workers=args.num_workers,
        )
        results["taskonomy_256px_batches_per_s"] = measure(loader, args.steps)

    with tempfile.TemporaryDirectory() as root:
        build_shapenet_vol_tree(root)
        ds = ShapeNetVol(root, "train", posed=True, image_conditional=True,
                         n_points=2048)
        loader = dataloader(
            ds, batch_size=args.batch, num_steps=args.steps + 16,
            num_workers=args.num_workers,
        )
        results["shapenet_vol_batches_per_s"] = measure(loader, args.steps)

    # measured conditional train step (BASELINE.md round 3): the ConvNeXt
    # conditional trains at ~15 steps/s device rate at batch 48
    demand = 15.8
    for k, v in results.items():
        print(f"{k}: {v:.2f} (device demand ~{demand}/s, headroom {v / demand:.2f}x)")


if __name__ == "__main__":
    main()
