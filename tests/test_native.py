"""Native C++ data loader vs the PIL oracle."""

import numpy as np
import pytest
from PIL import Image

from nerf_tpu import native


def _write_pngs(tmp_path, n=3, hw=(40, 32), alpha=True, seed=0):
    rng = np.random.default_rng(seed)
    paths, arrays = [], []
    for i in range(n):
        c = 4 if alpha else 3
        arr = rng.integers(0, 256, (*hw, c), dtype=np.uint8)
        p = str(tmp_path / f"r_{i}.png")
        Image.fromarray(arr, "RGBA" if alpha else "RGB").save(p)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
class TestNativeDecode:
    def test_rgb_exact(self, tmp_path):
        paths, arrays = _write_pngs(tmp_path, alpha=False)
        out = native.decode_images(paths)
        assert out.shape == (3, 40, 32, 3) and out.dtype == np.float32
        for i, arr in enumerate(arrays):
            np.testing.assert_allclose(out[i], arr / 255.0, atol=1e-6)

    def test_white_bkg_composite_matches_pil_path(self, tmp_path):
        paths, arrays = _write_pngs(tmp_path, alpha=True)
        out = native.decode_images(paths, white_bkg=True)
        for i, arr in enumerate(arrays):
            f = arr.astype(np.float32) / 255.0
            expected = f[..., :3] * f[..., 3:] + (1.0 - f[..., 3:])
            np.testing.assert_allclose(out[i], expected, atol=1e-6)

    def test_alpha_dropped_without_white_bkg(self, tmp_path):
        paths, arrays = _write_pngs(tmp_path, alpha=True)
        out = native.decode_images(paths, white_bkg=False)
        np.testing.assert_allclose(out[0], arrays[0][..., :3] / 255.0,
                                   atol=1e-6)

    def test_resize_close_to_pil(self, tmp_path):
        paths, arrays = _write_pngs(tmp_path, n=1, hw=(64, 48), alpha=False)
        out = native.decode_images(paths, ratio=0.5)
        assert out.shape == (1, 32, 24, 3)
        pil = np.asarray(
            Image.fromarray(arrays[0], "RGB").resize((24, 32), Image.BILINEAR),
            np.float32) / 255.0
        # PIL computes the same triangle filter in 8-bit fixed point; the
        # native path is float — agree to within quantization
        np.testing.assert_allclose(out[0], pil, atol=3 / 255.0)

    def test_missing_file_returns_none(self, tmp_path):
        paths, _ = _write_pngs(tmp_path, n=2)
        assert native.decode_images([paths[0], str(tmp_path / "nope.png")]) is None

    def test_loader_integration(self, tmp_path):
        """BlenderDataset.load: native and PIL paths agree end to end."""
        from nerf_tpu.data.blender import BlenderDataset
        from nerf_tpu.data.synthetic import make_synthetic_scene, write_blender_dataset

        train, _, (tr_p, _) = make_synthetic_scene(
            n_train=3, n_test=1, hw=(16, 16), seed=0, n_samples=16)
        write_blender_dataset(str(tmp_path / "lego"), train, tr_p, "train")
        nat = BlenderDataset.load(str(tmp_path / "lego"), "train",
                                  white_bkg=True, use_native=True)
        ref = BlenderDataset.load(str(tmp_path / "lego"), "train",
                                  white_bkg=True, use_native=False)
        np.testing.assert_allclose(nat.images, ref.images, atol=1e-6)
        np.testing.assert_allclose(nat.poses, ref.poses)


def test_native_corrupt_png_falls_back(tmp_path):
    """A corrupt PNG must make the native decoder return None (the loader
    then falls back to the PIL oracle) — exercising the libpng longjmp error
    path whose row buffers are allocated before setjmp (dataio.cpp)."""
    from nerf_tpu import native

    if not native.available():
        pytest.skip("native loader unavailable")
    from PIL import Image

    good = tmp_path / "good.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(good)
    corrupt = tmp_path / "corrupt.png"
    data = good.read_bytes()
    corrupt.write_bytes(data[: len(data) // 2])  # truncated mid-stream

    assert native.decode_images([str(good)]) is not None
    assert native.decode_images([str(good), str(corrupt)]) is None
    assert native.decode_images([str(corrupt)]) is None
    # not-a-png at all
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    assert native.decode_images([str(bad)]) is None

