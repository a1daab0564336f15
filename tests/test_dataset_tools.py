import os

import h5py
import numpy as np
import pytest

from fast_artistic_videos_tpu.core import io
from fast_artistic_videos_tpu.cli import (
    make_flow_list,
    make_image_dataset,
    make_occlusions,
    make_video_dataset,
)
from fast_artistic_videos_tpu.train import data as data_mod


@pytest.fixture
def scenes(tmp_path, rng):
    """Two scenes of frames; scene flow dirs with fwd/bwd .flo pairs."""
    for scene in ("sceneA", "sceneB"):
        d = tmp_path / scene
        (d / "flow").mkdir(parents=True)
        base = rng.random((24, 32, 3)).astype(np.float32)
        for i in range(1, 5):
            io.save_image(str(d / f"frame_{i:05d}.ppm"), np.roll(base, i * 2, 1))
        for i in (1, 2, 3):
            prefix = "s_" if i in (1, 3) else ""
            flow = np.zeros((24, 32, 2), np.float32)
            flow[..., 0] = 2.0
            io.write_flo(str(d / "flow" / f"{prefix}{i}_{i+1}.flo"), flow)
            io.write_flo(str(d / "flow" / f"{prefix}{i+1}_{i}.flo"), -flow)
    return tmp_path


def test_make_flow_list(scenes):
    out = str(scenes / "jobs.txt")
    rc = make_flow_list.main([str(scenes), out, "2", "2", "--frames_ready"])
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 4  # 2 scenes * 2 tuples
    assert all(" s_" in l for l in lines)


def test_make_occlusions_jax(scenes):
    rc = make_occlusions.main([str(scenes)])
    assert rc == 0
    for scene in ("sceneA", "sceneB"):
        for name in ("reliable_s_1_2.pgm", "reliable_s_2_1.pgm", "reliable_2_3.pgm"):
            path = str(scenes / scene / "flow" / name)
            assert os.path.exists(path), name
            img = io.read_pnm(path)
            assert img.shape == (24, 32)
    # consistent +/-2 flows: interior should be reliable
    m = io.read_pnm(str(scenes / "sceneA" / "flow" / "reliable_s_1_2.pgm"))
    assert m[5:-5, 5:-5].min() == 255


def test_make_video_dataset_roundtrip(scenes, tmp_path):
    make_occlusions.main([str(scenes)])
    out = str(tmp_path / "video.h5")
    rc = make_video_dataset.main([
        "--input_dir", str(scenes),
        "--output_file", out,
        "--height", "24", "--width", "32",
        "--sequence_length", "2",
        "--val_fraction", "0.5",
    ])
    assert rc == 0
    with h5py.File(out) as f:
        assert f["/train/frames1"].shape[1:] == (2, 3, 24, 32)
        assert f["/train/flow"].shape[1:] == (1, 2, 24, 32)
        assert f["/train/cert"].shape[1:] == (1, 24, 32)
    # loader consumes it
    src = data_mod.H5VideoSource(out, 1)
    imgs, flows, certs = src.get_batch("train", 1)
    assert imgs[0].shape == (1, 24, 32, 3)
    np.testing.assert_allclose(flows[0][0, 5, 5], [2.0, 0.0], atol=1e-5)


def test_make_image_dataset(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(5):
        io.save_image(str(d / f"img{i}.png"), rng.random((20, 20, 3)).astype(np.float32))
    out = str(tmp_path / "coco.h5")
    rc = make_image_dataset.main([
        "--input_dir", str(d), "--output_file", out,
        "--height", "16", "--width", "16", "--val_fraction", "0.25",
    ])
    assert rc == 0
    src = data_mod.H5ImageSource(out, 2)
    batch = src.next_images("train")
    assert batch.shape == (2, 16, 16, 3)
    assert 0.0 <= batch.min() and batch.max() <= 1.0
