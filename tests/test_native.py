"""Native dataloader: build, ordered delivery, decode correctness."""

import numpy as np
import pytest

from cubemapslam_tpu import native


def write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(f"P5 {img.shape[1]} {img.shape[0]} 255\n".encode())
        f.write(img.astype(np.uint8).tobytes())


def write_png(path, img):
    from PIL import Image
    Image.fromarray(img.astype(np.uint8)).save(path)


class TestNativeLoader:
    def test_builds(self):
        assert native._build() is not None, "native dataloader failed to build"

    def test_ordered_decode_matches(self, rng, tmp_path):
        paths = []
        imgs = []
        for i in range(12):
            img = rng.integers(0, 255, (48, 64)).astype(np.uint8)
            p = tmp_path / (f"f{i:03d}.pgm" if i % 2 else f"f{i:03d}.png")
            (write_pgm if i % 2 else write_png)(str(p), img)
            paths.append(str(p))
            imgs.append(img)
        loader = native.NativeImageLoader(paths, n_workers=3, queue_cap=4)
        got = list(loader)
        loader.close()
        assert [i for i, _ in got] == list(range(12))  # strict order
        for (i, arr), exp in zip(got, imgs):
            assert arr is not None
            np.testing.assert_allclose(arr, exp.astype(np.float32), atol=0.5)

    def test_decode_failure_reported(self, tmp_path):
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not an image")
        loader = native.NativeImageLoader([str(bad)], n_workers=1)
        idx, arr = next(loader)
        assert idx == 0 and arr is None
        loader.close()

    def test_rgb_png_luma(self, rng, tmp_path):
        from PIL import Image
        rgb = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
        p = tmp_path / "rgb.png"
        Image.fromarray(rgb).save(str(p))
        loader = native.NativeImageLoader([str(p)], n_workers=1)
        _, arr = next(loader)
        loader.close()
        exp = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
               + 0.114 * rgb[..., 2])
        np.testing.assert_allclose(arr, exp, atol=1.0)
