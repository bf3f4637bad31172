"""Taskonomy scene dataset: per-building h5 point clouds + rgb jpg frames.

On-disk layout (as consumed by gecco-jax/src/gecco_jax/data/taskonomy.py:
14-147): ``<root>/point_clouds/<building>.h5`` with datasets ``point``/
``view`` (frame ids), ``pc`` (clouds) and ``k`` (intrinsics);
``<root>/rgb/<building>/<building>_<point>_<view>.jpg`` renders; and a
``taskonomy_split.csv`` train/val/test table. Frames whose jpg is absent on
disk are skipped (the published dataset has holes), matching the reference's
behaviour.

Torch-free implementation with our own idioms: a precomputed frame index
table instead of per-access filename regex round-trips, per-thread cached h5
handles (the reference reopens the file for every item, taskonomy.py:76 — at
~400 GB streaming rates the open dominates), and csv parsing via the stdlib.
"""

from __future__ import annotations

import csv
import os
import threading

import numpy as np

from gecco_tpu.data.loader import ConcatDataset
from gecco_tpu.types import Context3d, Example

__all__ = ["Building", "Taskonomy", "parse_split_file"]


class Building:
    """All frames of one building whose rgb render exists on disk."""

    def __init__(self, name: str, h5_path: str, rgb_path: str, n_points: int = 2048):
        import h5py

        self.name = name
        self.h5_path = os.path.join(h5_path, f"{name}.h5")
        self.rgb_path = os.path.join(rgb_path, name)
        self.n_points = n_points
        self.return_image_path = False
        self._local = threading.local()  # per-thread h5 handle cache

        with h5py.File(self.h5_path, "r") as fh:
            frame_ids = np.stack([fh["point"][()], fh["view"][()]], axis=1)

        # keep only frames whose render is actually on disk
        on_disk = frozenset(os.listdir(self.rgb_path))
        self._frames = [
            (row, f"{name}_{pid}_{vid}.jpg")
            for row, (pid, vid) in enumerate(frame_ids.tolist())
        ]
        self._frames = [fr for fr in self._frames if fr[1] in on_disk]

    def return_image_path_(self, value: bool) -> None:
        self.return_image_path = value

    def _h5(self):
        import h5py

        handle = getattr(self._local, "h5", None)
        if handle is None:
            handle = h5py.File(self.h5_path, "r")
            self._local.h5 = handle
        return handle

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, index: int) -> Example:
        from gecco_tpu.data.image_io import load_rgb_uint8

        row, fname = self._frames[index]
        fh = self._h5()
        cloud = np.asarray(fh["pc"][row], np.float32)
        intrinsics = np.asarray(fh["k"][row], np.float32)

        image_path = os.path.join(self.rgb_path, fname)
        # uint8 end to end: normalized to [0, 1] on device (ConvNeXt)
        image = load_rgb_uint8(image_path)

        keep = np.random.permutation(cloud.shape[0])[: self.n_points]
        return Example(
            points=cloud[keep],
            ctx=Context3d(image=image, K=intrinsics),
            extras=(image_path,) if self.return_image_path else (),
        )


def parse_split_file(split_file) -> dict:
    """csv with columns (name, is_train, is_val, is_test) -> name -> split."""
    table = {}
    for row in list(csv.reader(split_file))[1:]:  # skip header
        if not row:
            continue
        name, *flags = row
        for flag, split in zip(flags, ("train", "val", "test")):
            if int(flag):
                table[name] = split
    return table


class Taskonomy(ConcatDataset):
    """Every building of one split concatenated (ref taskonomy.py:138-205)."""

    def __init__(self, path: str, split: str = "all", n_points: int = 2048):
        self.h5_path = os.path.join(path, "point_clouds")
        self.rgb_path = os.path.join(path, "rgb")
        self.split = split

        with open(os.path.join(path, "taskonomy_split.csv")) as fh:
            table = parse_split_file(fh)

        names = [
            f[: -len(".h5")]
            for f in sorted(os.listdir(self.h5_path))
            if f.endswith(".h5")
        ]
        if split != "all":
            names = [n for n in names if table.get(n) == split]
        super().__init__(
            [Building(n, self.h5_path, self.rgb_path, n_points=n_points) for n in names]
        )

    def __repr__(self):
        return (
            f"Taskonomy(split={self.split}, n_buildings={len(self.datasets)}, "
            f"len={len(self)})"
        )

    def return_image_path_(self, value: bool) -> None:
        for dataset in self.datasets:
            dataset.return_image_path_(value)
