"""ShapeNet in the Occupancy-Networks layout (pointcloud.npz + cameras.npz +
rendered views), un/posed/image-conditional.

Parity with gecco-jax/src/gecco_jax/data/shapenet_vol.py:35-275, torch-free:
- ``ShapeNetVolModel``: one object; posed mode yields 24 camera views with
  world-transformed points; image_conditional adds the rendered view + K;
- per-view fix masks from ``per_view_point_masks.npz`` (:101-127);
- camera matrices normalised by IM_SIZE + 1 (:94);
- ``ShapeNetVolClass`` / ``ShapeNetVol`` concatenate via our own
  ConcatDataset (no torch).
"""

from __future__ import annotations

import os
import re
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Union

import numpy as np

from gecco_tpu.data.loader import ConcatDataset
from gecco_tpu.types import Context3d, Example

__all__ = ["ShapeNetVolModel", "ShapeNetVolClass", "ShapeNetVol", "IM_SIZE"]

IM_SIZE = 137  # 137 x 137 pixel renders
WORLD_MAT_RE = re.compile(r"world_mat_(\d+)")
CAMERA_MAT_RE = re.compile(r"camera_mat_(\d+)")
FIX_MASK_RE = re.compile(r"mask_(\d+)")


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    image = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    if image.ndim == 2:  # grayscale to rgb
        image = image[..., None].repeat(3, axis=2)
    return image[..., :3]


class TestData(NamedTuple):
    points_raw: np.ndarray
    scale: np.ndarray
    loc: np.ndarray
    wmat: np.ndarray
    category: str
    object_id: str


class ShapeNetVolModel:
    def __init__(
        self,
        root: str,
        posed: bool = False,
        image_conditional: bool = False,
        n_points: int = 2048,
        skip_fixed: bool = False,
        is_testing: bool = False,
        seed: int = 0,
    ):
        if image_conditional and not posed:
            raise AssertionError("image_conditional=True is valid only with posed=True")
        self.root = root
        self.posed = posed
        self.image_conditional = image_conditional
        self.n_points = n_points
        self.skip_fixed = skip_fixed
        self.is_testing = is_testing
        self.seed = seed

        self.wmats = None
        self.cmats = None
        self._fixed_view_ids = None
        self._is_fixed = None

    @property
    def fixed_path(self) -> str:
        return os.path.join(self.root, "per_view_point_masks.npz")

    @property
    def is_fixed(self) -> bool:
        if self._is_fixed is None:
            self._is_fixed = os.path.exists(self.fixed_path)
        return self._is_fixed

    def get_camera_params(self, index: int):
        if self.wmats is None:
            npz = np.load(os.path.join(self.root, "img_choy2016", "cameras.npz"))
            world_ids, camera_ids = set(), set()
            for key in npz.keys():
                if (m := WORLD_MAT_RE.match(key)) is not None:
                    world_ids.add(int(m.group(1)))
                elif (m := CAMERA_MAT_RE.match(key)) is not None:
                    camera_ids.add(int(m.group(1)))
            assert world_ids == camera_ids
            indices = np.array(sorted(world_ids))
            if (indices != np.arange(len(indices))).any():
                raise AssertionError("Bad shapenet model")

            world_mats = np.stack([npz[f"world_mat_{i}"] for i in indices])
            camera_mats = np.stack([npz[f"camera_mat_{i}"] for i in indices])
            # normalise pixel coords to [0, 1] (reference :94)
            camera_mats = camera_mats / np.array(
                [IM_SIZE + 1, IM_SIZE + 1, 1]
            ).reshape(3, 1)
            self.wmats = world_mats.astype(np.float32)
            self.cmats = camera_mats.astype(np.float32)
        return self.wmats[index], self.cmats[index]

    def get_fix_mask(self, view: int) -> Optional[np.ndarray]:
        if not self.is_fixed:
            return None
        if self._fixed_view_ids is not None and view not in self._fixed_view_ids:
            return None
        try:
            fix_file = np.load(self.fixed_path)
        except FileNotFoundError:
            return None
        if self._fixed_view_ids is None:
            self._fixed_view_ids = frozenset(
                int(m.group(1))
                for key in fix_file.keys()
                if (m := FIX_MASK_RE.match(key)) is not None
            )
            if view not in self._fixed_view_ids:
                return None
        return fix_file[f"mask_{view}"]

    def points_scale_loc(self):
        pc = np.load(os.path.join(self.root, "pointcloud.npz"))
        return (
            pc["points"].astype(np.float32),
            pc["scale"].astype(np.float32),
            pc["loc"].astype(np.float32),
        )

    def points_world(self, view: Optional[int] = None) -> np.ndarray:
        points, scale, loc = self.points_scale_loc()
        if view is not None:
            fix_mask = self.get_fix_mask(view)
            if fix_mask is not None:
                points = points[fix_mask]
        if self.n_points is not None:
            rng = np.random.default_rng(None if self.seed is None else (self.seed, view or 0))
            subset = rng.permutation(points.shape[0])[: self.n_points]
            points = points[subset]
        return points * scale + loc[None, :]

    def __len__(self):
        if self.skip_fixed and self.is_fixed:
            return 0
        if self.is_testing:
            return 1
        if self.posed:
            return 24
        return 1

    def __getitem__(self, index: int) -> Example:
        if not self.posed:
            return Example(points=self.points_world(view=None))

        wmat, cmat = self.get_camera_params(index)
        points = self.points_world(view=index)
        points_t = np.einsum("ab,nb->na", wmat[:, :3], points) + wmat[:, -1]

        if self.is_testing:
            *_prefix, category, object_id = self.root.rstrip("/").split("/")
            points_raw, scale, loc = self.points_scale_loc()
            extras = TestData(
                points_raw=points_raw,
                scale=scale,
                loc=loc,
                wmat=wmat,
                category=category,
                object_id=object_id,
            )
        else:
            extras = ()

        if not self.image_conditional:
            return Example(
                points=points_t,
                ctx=Context3d(image=(), K=cmat.copy()),
                extras=extras,
            )

        image = _load_image(
            os.path.join(self.root, "img_choy2016", f"{index:03d}.jpg")
        )
        return Example(
            points=points_t,
            ctx=Context3d(image=image, K=cmat.copy(), wmat=wmat.copy()),
            extras=extras,
        )


class ShapeNetVolClass(ConcatDataset):
    """All objects of one synset listed in ``<split>.lst`` (:219-241)."""

    def __init__(self, root: str, split: str, **kw):
        with open(os.path.join(root, f"{split}.lst")) as split_file:
            split_ids = [line.strip() for line in split_file if line.strip()]
        make_model = partial(ShapeNetVolModel, **kw)
        super().__init__([make_model(os.path.join(root, sid)) for sid in split_ids])
        self.root = root
        self.split = split


class ShapeNetVol(ConcatDataset):
    """All synsets under ``root`` for a named split, or an explicit list of
    model paths (:244-274)."""

    def __init__(
        self,
        root: str,
        split: Union[str, List[str]],
        transform: Callable[[Example], Example] = lambda e: e,
        **kw,
    ):
        if isinstance(split, str):
            subroots = sorted(
                os.path.join(root, d)
                for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))
            )
            super().__init__(
                [ShapeNetVolClass(subroot, split, **kw) for subroot in subroots]
            )
        else:
            assert all(isinstance(p, str) for p in split)
            super().__init__([ShapeNetVolModel(path, **kw) for path in split])
        self.transform = transform

    def __getitem__(self, index: int) -> Example:
        return self.transform(super().__getitem__(index))
