"""Dataset loader, synthetic generator, and sampler tests."""

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
