"""Taskonomy scene dataset: per-building h5 point clouds + rgb jpgs.

Parity with gecco-jax/src/gecco_jax/data/taskonomy.py:14-147, torch-free
(h5py + PIL): missing-view reindexing, split csv parsing, per-item random
point subsampling.
"""

from __future__ import annotations

import os
import re
import threading
import numpy as np

from gecco_tpu.data.loader import ConcatDataset
from gecco_tpu.types import Context3d, Example

__all__ = ["Building", "Taskonomy", "parse_split_file"]

_FNAME_RE = re.compile(r"\w+_(\d+)_(\d+)\.jpg")


class Building:
    def __init__(self, name: str, h5_path: str, rgb_path: str, n_points: int = 2048):
        import h5py

        self.name = name
        self.h5_path = os.path.join(h5_path, f"{name}.h5")
        self.rgb_path = os.path.join(rgb_path, name)
        self.n_points = n_points
        self.return_image_path = False

        with h5py.File(self.h5_path, "r") as h5_file:
            points = h5_file["point"][()]
            views = h5_file["view"][()]

        self.points_and_views = list(zip(points.tolist(), views.tolist()))
        self._local = threading.local()  # per-thread h5 handle cache
        missing = self.missing_points_and_views()
        is_available = ~np.array(
            [(pv in missing) for pv in self.points_and_views], dtype=bool
        )
        self.reindex = np.arange(len(self.points_and_views))[is_available]

    def return_image_path_(self, value: bool) -> None:
        self.return_image_path = value

    def rgb_file_path(self, index: int, name_only: bool = False) -> str:
        point, view = self.points_and_views[index]
        fname = f"{self.name}_{point}_{view}.jpg"
        return fname if name_only else os.path.join(self.rgb_path, fname)

    def missing_points_and_views(self) -> set:
        existing = frozenset(os.listdir(self.rgb_path))
        requested = frozenset(
            self.rgb_file_path(i, name_only=True)
            for i in range(len(self.points_and_views))
        )
        missing = set()
        for fname in requested - existing:
            if (m := _FNAME_RE.match(fname)) is None:
                raise RuntimeError(f"{fname!r} doesn't match format.")
            missing.add((int(m.group(1)), int(m.group(2))))
        return missing

    def __len__(self):
        return len(self.reindex)

    def _h5(self):
        """Per-thread cached h5 handle (the reference reopens the file for
        every item, taskonomy.py:76; at ~400 GB streaming rates the open
        dominates)."""
        import h5py

        handle = getattr(self._local, "h5", None)
        if handle is None:
            handle = h5py.File(self.h5_path, "r")
            self._local.h5 = handle
        return handle

    def __getitem__(self, index: int) -> Example:
        from PIL import Image

        index = self.reindex[index]
        h5_file = self._h5()
        pc = h5_file["pc"][index]
        K = h5_file["k"][index]

        image_path = self.rgb_file_path(index)
        image = np.asarray(Image.open(image_path)).astype(np.float32) / 255.0

        perm = np.random.permutation(pc.shape[0])[: self.n_points]
        pc = pc[perm]

        extras = (image_path,) if self.return_image_path else ()
        return Example(
            points=pc.astype(np.float32),
            ctx=Context3d(image=image, K=np.asarray(K, np.float32)),
            extras=extras,
        )


def parse_split_file(split_file) -> dict:
    splits = {}
    for line in list(split_file)[1:]:  # skip header
        name, is_train, is_val, is_test = line.split(",")
        if int(is_train):
            splits[name] = "train"
        if int(is_val):
            splits[name] = "val"
        if int(is_test):
            splits[name] = "test"
    return splits


class Taskonomy(ConcatDataset):
    def __init__(self, path: str, split: str = "all", n_points: int = 2048):
        self.h5_path = os.path.join(path, "point_clouds")
        self.rgb_path = os.path.join(path, "rgb")
        self.split = split

        with open(os.path.join(path, "taskonomy_split.csv")) as split_file:
            splits = parse_split_file(split_file)

        belongs = (lambda _n: True) if split == "all" else (
            lambda name: splits.get(name) == split
        )

        buildings = []
        for file in sorted(os.listdir(self.h5_path)):
            name = file[: -len(".h5")]
            if belongs(name):
                buildings.append(
                    Building(name, self.h5_path, self.rgb_path, n_points=n_points)
                )
        super().__init__(buildings)

    def __repr__(self):
        return (
            f"Taskonomy(split={self.split}, n_buildings={len(self.datasets)}, "
            f"len={len(self)})"
        )

    def return_image_path_(self, value: bool) -> None:
        for dataset in self.datasets:
            dataset.return_image_path_(value)
