"""Dataset loaders over synthetic on-disk fixtures
(ref: gecco-jax/src/gecco_jax/data/{shapenet_vol,taskonomy,lion}.py)."""

import os

import numpy as np
import pytest

from gecco_tpu.data.lion import LIONDataWrapper, ShapeNet15kPointClouds
from gecco_tpu.data.shapenet_pointflow import ShapeNetPointFlow
from gecco_tpu.data.shapenet_vol import IM_SIZE, ShapeNetVol, ShapeNetVolModel
from gecco_tpu.data.taskonomy import Taskonomy
from gecco_tpu.types import Example


def _write_shapenet_vol_model(root, rng, n_views=24):
    os.makedirs(os.path.join(root, "img_choy2016"), exist_ok=True)
    points = rng.normal(size=(5000, 3)).astype(np.float32)
    np.savez(
        os.path.join(root, "pointcloud.npz"),
        points=points,
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
    np.savez(os.path.join(root, "img_choy2016", "cameras.npz"), **cams)
    from PIL import Image

    for i in range(n_views):
        img = (rng.random((IM_SIZE, IM_SIZE, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "img_choy2016", f"{i:03d}.jpg")
        )


def test_shapenet_vol_unposed(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path / "02691156" / "abc123")
    _write_shapenet_vol_model(root, rng)
    model = ShapeNetVolModel(root, n_points=128)
    assert len(model) == 1
    ex = model[0]
    assert ex.points.shape == (128, 3)
    # scale 2.0 applied
    assert abs(ex.points.std() / 2.0 - 1.0) < 0.2


def test_shapenet_vol_posed_conditional(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path / "02691156" / "abc123")
    _write_shapenet_vol_model(root, rng)
    model = ShapeNetVolModel(root, posed=True, image_conditional=True, n_points=64)
    assert len(model) == 24
    ex = model[3]
    assert ex.points.shape == (64, 3)
    assert ex.ctx.image.shape == (IM_SIZE, IM_SIZE, 3)
    assert ex.ctx.K.shape == (3, 3)
    # camera matrix normalised to [0, 1] pixel coords
    assert ex.ctx.K[0, 2] == pytest.approx(69.0 / (IM_SIZE + 1))
    # world transform applied: z shifted by 4
    assert ex.points[:, 2].mean() == pytest.approx(4.0, abs=1.0)


def test_shapenet_vol_split(tmp_path):
    rng = np.random.default_rng(2)
    synset = tmp_path / "02691156"
    for obj in ["aaa", "bbb"]:
        _write_shapenet_vol_model(str(synset / obj), rng, n_views=2)
    with open(synset / "train.lst", "w") as f:
        f.write("aaa\nbbb\n")
    ds = ShapeNetVol(str(tmp_path), "train", n_points=32)
    assert len(ds) == 2
    assert ds[1].points.shape == (32, 3)


def test_taskonomy(tmp_path):
    import h5py
    from PIL import Image

    rng = np.random.default_rng(3)
    h5_dir = tmp_path / "point_clouds"
    rgb_dir = tmp_path / "rgb" / "building1"
    os.makedirs(h5_dir)
    os.makedirs(rgb_dir)

    n_items = 4
    with h5py.File(h5_dir / "building1.h5", "w") as f:
        f["point"] = np.arange(n_items)
        f["view"] = np.zeros(n_items, np.int64)
        f["pc"] = rng.normal(size=(n_items, 1000, 3)).astype(np.float32)
        f["k"] = np.tile(np.eye(3, dtype=np.float32), (n_items, 1, 1))

    # write rgb files for all but item 2 (tests missing-view reindexing)
    for i in range(n_items):
        if i == 2:
            continue
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rgb_dir / f"building1_{i}_0.jpg")

    with open(tmp_path / "taskonomy_split.csv", "w") as f:
        f.write("name,train,val,test\nbuilding1,1,0,0\n")

    ds = Taskonomy(str(tmp_path), split="train", n_points=100)
    assert len(ds) == 3  # one view missing
    ex = ds[0]
    assert ex.points.shape == (100, 3)
    assert ex.ctx.image.shape == (32, 32, 3)
    # uint8 end to end: normalization to [0, 1] happens on device
    # (ConvNeXt.__call__); host-side float images cost 4x the collation
    # memcpy and relay transfer bytes
    assert ex.ctx.image.dtype == np.uint8


def _write_lion_tree(tmp_path, rng, n_models=4, synset="02691156"):
    for split in ("train", "val"):
        d = tmp_path / synset / split
        os.makedirs(d, exist_ok=True)
        for i in range(n_models):
            np.save(d / f"model{i}.npy", rng.normal(2.0, 3.0, size=(15000, 3)))


def test_lion_global_normalization(tmp_path):
    rng = np.random.default_rng(4)
    _write_lion_tree(tmp_path, rng)
    ds = ShapeNet15kPointClouds(
        str(tmp_path), categories=["airplane"], split="train", normalize_global=True,
        tr_sample_size=256, random_subsample=True,
    )
    assert len(ds) == 4
    item = ds[0]
    assert item["tr_points"].shape == (256, 3)
    # globally normalised: overall mean ~0, std ~1
    assert abs(ds.all_points.mean()) < 0.05
    assert abs(ds.all_points.std() - 1.0) < 0.05


def test_lion_shape_box_normalization(tmp_path):
    rng = np.random.default_rng(5)
    _write_lion_tree(tmp_path, rng)
    ds = ShapeNet15kPointClouds(
        str(tmp_path), categories=["airplane"], split="train",
        normalize_shape_box=True, tr_sample_size=128,
    )
    # each shape in [-1, 1] after box normalisation
    assert ds.all_points.max() <= 1.0 + 1e-5
    assert ds.all_points.min() >= -1.0 - 1e-5


def test_lion_wrapper_yields_examples(tmp_path):
    rng = np.random.default_rng(6)
    _write_lion_tree(tmp_path, rng)
    ds = LIONDataWrapper(str(tmp_path), "airplane", "train", n_points=64)
    ex = ds[0]
    assert isinstance(ex, Example)
    assert ex.points.shape == (64, 3)


def test_shapenet_pointflow(tmp_path):
    rng = np.random.default_rng(7)
    d = tmp_path / "02691156" / "train"
    os.makedirs(d)
    for i in range(3):
        np.save(d / f"cloud{i}.npy", rng.normal(size=(2048, 3)))
    ds = ShapeNetPointFlow(str(tmp_path), "airplane", "train", n_points=512)
    assert len(ds) == 3
    assert ds[0].points.shape == (512, 3)
    # deterministic per-item subsampling
    np.testing.assert_array_equal(ds[1].points, ds[1].points)


def test_lion_renormalize(tmp_path):
    """renormalize() swaps the normalization stats in place
    (reference lion.py:314-320)."""
    rng = np.random.default_rng(7)
    _write_lion_tree(tmp_path, rng)
    kw = dict(categories=["airplane"], split="train", normalize_global=True,
              tr_sample_size=64)
    ds = ShapeNet15kPointClouds(str(tmp_path), **kw)
    raw = ds.all_points * ds.all_points_std + ds.all_points_mean

    new_mean = np.full((1, 1, 3), 2.0, dtype=raw.dtype)
    new_std = np.full((1, 1, 1), 3.0, dtype=raw.dtype)
    ds.renormalize(new_mean, new_std)
    np.testing.assert_allclose(
        ds.all_points, (raw - new_mean) / new_std, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        ds.all_points * ds.all_points_std + ds.all_points_mean, raw,
        rtol=1e-5, atol=1e-6,
    )
    assert ds.train_points.shape[1] == min(10000, ds.all_points.shape[1])
