"""Golden-parity harness against the reference's pretrained checkpoints.

The build target is <= 1e-2 mean-abs pixel deviation from the Torch
reference on its published models (BASELINE.md). The checkpoints are
download-only (models/download_models.sh) and this build environment has no
egress, so these tests self-skip unless the fixtures are provided:

  FAV_GOLDEN_DIR/
    <style>-video.t7 (and optionally <style>-image.t7)
    cases/<name>/input.png            content frame
    cases/<name>/expected.png         the reference's stylized output
    cases/<name>/style.txt            which style checkpoint to use
    cases/<name>/prev.png?            optional previous stylized frame
    cases/<name>/flow.flo, cert.pgm?  optional temporal inputs

Run: FAV_GOLDEN_DIR=/path pytest tests/test_golden.py
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.environ.get("FAV_GOLDEN_DIR", "")

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR or not os.path.isdir(GOLDEN_DIR),
    reason="FAV_GOLDEN_DIR with reference checkpoints/outputs not provided",
)


def _cases():
    base = os.path.join(GOLDEN_DIR, "cases")
    if not os.path.isdir(base):
        return []
    return sorted(os.listdir(base))


@pytest.mark.parametrize("case", _cases() or ["<none>"])
def test_golden_parity(case):
    if case == "<none>":
        pytest.skip("no cases/ directory in FAV_GOLDEN_DIR")
    from fast_artistic_videos_tpu.core import io
    from fast_artistic_videos_tpu.models import stylizer, t7
    from fast_artistic_videos_tpu.video.engine import EngineConfig, StylizerEngine

    d = os.path.join(GOLDEN_DIR, "cases", case)
    style = open(os.path.join(d, "style.txt")).read().strip()
    spec_v, params_v = t7.import_stylizer(
        t7.load_t7(os.path.join(GOLDEN_DIR, f"{style}-video.t7"))
    )
    img_path = os.path.join(GOLDEN_DIR, f"{style}-image.t7")
    apply_img = params_i = None
    if os.path.exists(img_path):
        spec_i, params_i = t7.import_stylizer(t7.load_t7(img_path))
        apply_img = lambda p, x: stylizer.apply(p, spec_i, x)  # noqa: E731
    engine = StylizerEngine(
        lambda p, x: stylizer.apply(p, spec_v, x),
        params_v,
        apply_img,
        params_i,
        stride_multiple=spec_v.total_stride,
        config=EngineConfig(exact_warp=True),
    )
    content = io.load_image(os.path.join(d, "input.png"))
    prev_path = os.path.join(d, "prev.png")
    if os.path.exists(prev_path):
        prev = io.load_image(prev_path)
        flow = io.read_flo(os.path.join(d, "flow.flo"))
        cert = io.load_image(os.path.join(d, "cert.pgm"), num_channels=1)[..., 0]
        out = np.asarray(engine.stylize_next(content, prev, flow, cert))
    else:
        out = np.asarray(engine.stylize_first(content))
    expected = io.load_image(os.path.join(d, "expected.png"))
    dev = np.abs(out - expected).mean()
    assert dev <= 1e-2, f"{case}: mean abs deviation {dev:.4f} > 1e-2"
