import numpy as np
import pytest

from fast_artistic_videos_tpu.core import io


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(size=(13, 17, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    io.write_flo(p, flow)
    out = io.read_flo(p)
    np.testing.assert_array_equal(out, flow)


def test_flo_layout_matches_reference_reader(tmp_path):
    """Byte layout: magic f32, W i32, H i32, then row-major interleaved (u,v)
    — flowFileLoader.lua:4-13 / consistencyChecker.cpp:16-36."""
    flow = np.zeros((2, 3, 2), np.float32)
    flow[0, 1] = (5.0, -7.0)  # u at (y=0, x=1)
    p = str(tmp_path / "b.flo")
    io.write_flo(p, flow)
    raw = np.fromfile(p, dtype="<f4")
    assert raw[0] == np.float32(202021.25)
    wi, hi = np.fromfile(p, dtype="<i4")[1:3]
    assert (wi, hi) == (3, 2)
    # data starts at float index 3; pixel (y=0,x=1) is pair index 1
    assert raw[3 + 2 * 1] == 5.0 and raw[3 + 2 * 1 + 1] == -7.0


def test_flo_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError):
        io.read_flo(str(p))


def test_pgm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(9, 11)).astype(np.uint8)
    p = str(tmp_path / "a.pgm")
    io.write_pgm(p, img)
    out = io.read_pnm(p)
    np.testing.assert_array_equal(out, img)


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    p = str(tmp_path / "a.ppm")
    io.write_ppm(p, img)
    out = io.read_pnm(p)
    np.testing.assert_array_equal(out, img)


def test_pnm_comment_and_ascii(tmp_path):
    p = tmp_path / "c.pgm"
    p.write_bytes(b"P2\n# a comment\n2 2\n255\n0 64\n128 255\n")
    out = io.read_pnm(str(p))
    np.testing.assert_array_equal(out, [[0, 64], [128, 255]])


def test_load_save_image_png(tmp_path, rng):
    img = rng.random((8, 6, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    io.save_image(p, img)
    out = io.load_image(p)
    assert out.shape == (8, 6, 3)
    assert np.abs(out - img).max() <= 1.0 / 255.0 + 1e-6
    assert io.image_size(p) == (8, 6)


def test_load_pgm_as_float(tmp_path):
    img = np.full((4, 4), 255, np.uint8)
    p = str(tmp_path / "y.pgm")
    io.write_pgm(p, img)
    out = io.load_image(p, num_channels=1)
    assert out.shape == (4, 4, 1)
    np.testing.assert_allclose(out, 1.0)
    assert io.image_size(p) == (4, 4)


def test_pnm_16bit(tmp_path):
    p = tmp_path / "d.pgm"
    payload = np.array([[0, 1000], [30000, 65535]], dtype=">u2")
    p.write_bytes(b"P5\n2 2\n65535\n" + payload.tobytes())
    out = io.read_pnm(str(p))
    np.testing.assert_array_equal(out, [[0, 1000], [30000, 65535]])
    f = io.load_image(str(p), num_channels=1)
    np.testing.assert_allclose(f[1, 1, 0], 1.0)
