"""Dataset loader, synthetic generator, and sampler tests."""

import os

import numpy as np
import pytest

from nerf_tpu.data.blender import BlenderDataset, natural_sorted
from nerf_tpu.data.sampler import LocalShuffleSampler, epoch_image_order
from nerf_tpu.data.synthetic import make_synthetic_scene, write_blender_dataset


def test_natural_sorted():
    names = ["r_10.png", "r_2.png", "r_1.png"]
    assert natural_sorted(names) == ["r_1.png", "r_2.png", "r_10.png"]


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_scene(n_train=5, n_test=2, hw=(32, 32), seed=1,
                                n_samples=64)


def test_synthetic_scene_shapes(scene):
    train, test, (tr4, te4) = scene
    assert train.images.shape == (5, 32, 32, 3)
    assert test.images.shape == (2, 32, 32, 3)
    assert train.poses.shape == (5, 3, 4)
    assert train.images.min() >= 0.0 and train.images.max() <= 1.0
    # white background: corners should be near white
    assert train.images[:, 0, 0, :].mean() > 0.9
    # something visible in the middle of at least some views
    assert train.images[:, 12:20, 12:20, :].min() < 0.9


def test_blender_roundtrip(tmp_path, scene):
    train, _, (tr4, _) = scene
    root = str(tmp_path / "scene")
    write_blender_dataset(root, train, tr4, "train")
    loaded = BlenderDataset.load(root, "train")
    assert loaded.images.shape == train.images.shape
    np.testing.assert_allclose(loaded.images, train.images, atol=1 / 255.0 + 1e-3)
    np.testing.assert_allclose(loaded.poses, train.poses, atol=1e-6)
    np.testing.assert_allclose(loaded.focal(), train.focal(), rtol=1e-6)


def test_blender_img_scale_and_scene_scale(tmp_path, scene):
    train, _, (tr4, _) = scene
    root = str(tmp_path / "scene2")
    write_blender_dataset(root, train, tr4, "train")
    loaded = BlenderDataset.load(root, "train", img_scale=0.5, scene_scale=2.0)
    assert loaded.images.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(loaded.poses[:, :, 3], 2.0 * train.poses[:, :, 3],
                               rtol=1e-6)
    np.testing.assert_allclose(loaded.poses[:, :, :3], train.poses[:, :, :3],
                               rtol=1e-6)


def test_epoch_image_order_permutation():
    o1 = epoch_image_order(10, epoch=0)
    o2 = epoch_image_order(10, epoch=1)
    assert sorted(o1.tolist()) == list(range(10))
    assert o1.tolist() != o2.tolist()
    np.testing.assert_array_equal(o1, epoch_image_order(10, epoch=0))


def test_local_shuffle_sampler_int_division():
    s = LocalShuffleSampler(10, 4, rank=3)
    # equal split: ranks 0-2 get 2 images each, rank 3 gets the remaining 4,
    # truncated to min division size 2
    assert len(s) == 2
    idx = s.epoch_indices(0)
    assert set(idx.tolist()) <= {6, 7, 8, 9}


def test_local_shuffle_sampler_division_list():
    div = [0, 0, 1, 1, 1, 2, 2, 3, 3, 3]
    samplers = [LocalShuffleSampler(10, div, rank=r, seed=5) for r in range(4)]
    stacked = LocalShuffleSampler.stacked_epoch_indices(samplers, epoch=2)
    assert stacked.shape == (4, 2)  # min division size = 2
    own = {0: {0, 1}, 1: {2, 3, 4}, 2: {5, 6}, 3: {7, 8, 9}}
    for r in range(4):
        assert set(stacked[r].tolist()) <= own[r]
    # different epochs reshuffle deterministically
    s2 = LocalShuffleSampler.stacked_epoch_indices(samplers, epoch=2)
    np.testing.assert_array_equal(stacked, s2)


def test_local_shuffle_sampler_allow_imbalance():
    div = [0, 0, 0, 1]
    s = LocalShuffleSampler(4, div, rank=0, allow_imbalance=True)
    assert len(s) == 3


def test_local_shuffle_sampler_invalid_rank():
    with pytest.raises(ValueError):
        LocalShuffleSampler(4, 2, rank=5)


def test_real_schema_fixture_loads():
    """Checked-in miniature with the REAL nerf-synthetic JSON structure
    (reference dataset.py:74-96): per-frame `rotation` and `file_path`
    fields (read by neither loader), an odd image count, and stray
    normal/alpha PNGs that must be excluded from the listing."""
    import json

    root = os.path.join(os.path.dirname(__file__), "fixtures", "lego_mini")
    meta = json.load(open(os.path.join(root, "transforms_train.json")))
    assert "rotation" in meta["frames"][0]  # the schema field being probed

    ds = BlenderDataset.load(root, "train", white_bkg=True)
    assert len(ds) == 7  # odd count; normal/alpha files excluded
    assert ds.names == [f"r_{i}.png" for i in range(7)]
    assert ds.images.shape == (7, 16, 16, 3)
    # white-bkg composite: transparent corners become exactly white
    np.testing.assert_allclose(ds.images[:, 0, 0], 1.0)
    # poses: top 3x4 of the JSON 4x4, in frame order
    want = np.asarray(meta["frames"][3]["transform_matrix"], np.float32)[:3]
    np.testing.assert_allclose(ds.poses[3], want, atol=1e-6)

    # scaling an odd-sized real image works (16 -> 8) + scene scale
    ds2 = BlenderDataset.load(root, "train", img_scale=0.5, scene_scale=0.5,
                              white_bkg=True)
    assert ds2.images.shape == (7, 8, 8, 3)
    np.testing.assert_allclose(ds2.poses[3, :, 3], want[:, 3] * 0.5,
                               atol=1e-6)

    # native C++ loader agrees with the PIL oracle on the real schema
    pil = BlenderDataset.load(root, "train", white_bkg=True, use_native=False)
    np.testing.assert_allclose(ds.images, pil.images, atol=1.5e-3)

    test_ds = BlenderDataset.load(root, "test", white_bkg=False)
    assert len(test_ds) == 2
