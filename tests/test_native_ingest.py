"""Native C++ ingest runtime tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest

from visual_odometry_ros_tpu.runtime import ingest

pytestmark = pytest.mark.skipif(not ingest.native_available(), reason="no native toolchain")


@pytest.fixture
def imgs(tmp_path, rng):
    from PIL import Image

    g = rng.integers(0, 255, (37, 53)).astype(np.uint8)
    Image.fromarray(g).save(tmp_path / "g.png")
    c = rng.integers(0, 255, (24, 31, 3)).astype(np.uint8)
    Image.fromarray(c).save(tmp_path / "c.png")
    with open(tmp_path / "p.pgm", "wb") as f:
        f.write(b"P5\n# comment\n53 37\n255\n")
        f.write(g.tobytes())
    return tmp_path, g, c


def test_decode_gray_png_exact(imgs):
    d, g, _ = imgs
    a = ingest.decode_image(str(d / "g.png"))
    np.testing.assert_allclose(a, g.astype(np.float32))


def test_decode_rgb_png_luma(imgs):
    d, _, c = imgs
    b = ingest.decode_image(str(d / "c.png"))
    luma = 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]
    assert b.shape == c.shape[:2]
    assert np.abs(b - luma).max() < 1.0


def test_decode_pgm_exact(imgs):
    d, g, _ = imgs
    a = ingest.decode_image(str(d / "p.pgm"))
    np.testing.assert_allclose(a, g.astype(np.float32))


def test_sequence_stereo_order(imgs):
    d, g, _ = imgs
    paths = [str(d / "g.png")] * 5
    seq = ingest.NativeSequence(paths, paths, queue_depth=2)
    indices = []
    for idx, l, r in seq:
        assert l.shape == (37, 53) and np.allclose(l, g) and np.allclose(r, g)
        indices.append(idx)
    seq.close()
    assert indices == list(range(5))


def test_decode_error(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"definitely not an image")
    with pytest.raises(ValueError):
        ingest.decode_image(str(bad))
