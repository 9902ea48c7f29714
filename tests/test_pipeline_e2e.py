"""End-to-end media pipeline: synthetic y4m clip + depth video -> SBS y4m."""

import numpy as np
import pytest

from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
from visiondepth3d_tpu.io.depth_io import Depth16Reader, Depth16Writer
from visiondepth3d_tpu.pipeline import RenderConfig, render_stereo_video
from visiondepth3d_tpu.stereo import StereoParams


def _write_clip(path, t=8, h=72, w=128, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    with Y4MWriter(path, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = ((xx * 2 + i * 8) % 256).astype(np.uint8)
            f[..., 1] = ((yy * 3) % 256).astype(np.uint8)
            f[..., 2] = 128
            # moving box (the "subject")
            x0 = 20 + 6 * i
            f[20:50, x0 : x0 + 30] = (230, 40, 40)
            wr.write(f)
            frames.append(f)
    return frames


def _write_depth(path, t=8, h=72, w=128):
    with Y4MWriter(path, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            d = (xx / w * 200 + 20).astype(np.uint8)
            x0 = 20 + 6 * i
            d[20:50, x0 : x0 + 30] = 60  # box nearer than background
            wr.write(np.repeat(d[..., None], 3, axis=-1))


def test_y4m_roundtrip(tmp_path):
    path = tmp_path / "clip.y4m"
    frames = _write_clip(path)
    with Y4MReader(path) as rd:
        assert rd.width == 128 and rd.height == 72
        assert abs(rd.fps - 24.0) < 1e-6
        got = list(rd)
    assert len(got) == len(frames)
    # YUV420 is lossy; luma should round-trip within a few counts
    for a, b in zip(got, frames):
        ga = a.astype(np.float32).mean(axis=-1)
        gb = b.astype(np.float32).mean(axis=-1)
        assert np.abs(ga - gb).mean() < 6.0


def test_depth16_roundtrip(tmp_path):
    path = tmp_path / "d.vd16"
    d = (np.random.default_rng(0).random((4, 32, 48)) * 65535).astype(np.uint16)
    with Depth16Writer(path, 48, 32, 24.0) as wr:
        for i in range(4):
            wr.write(d[i])
    rd = Depth16Reader(path)
    got = np.stack(list(rd))
    rd.close()
    np.testing.assert_array_equal(got, d)


@pytest.mark.parametrize("fmt,out_w_factor", [("Half-SBS", 1), ("Full-SBS", 2)])
def test_render_end_to_end(tmp_path, fmt, out_w_factor):
    clip = tmp_path / "clip.y4m"
    depth = tmp_path / "depth.y4m"
    out = tmp_path / "out.y4m"
    _write_clip(clip)
    _write_depth(depth)
    cfg = RenderConfig(
        output_format=fmt,
        output_height=72,
        preserve_original_aspect=True,
        chunk_size=4,
    )
    prog = render_stereo_video(clip, depth, out, StereoParams(), cfg)
    assert prog.frames_done == 8
    with Y4MReader(out) as rd:
        outs = list(rd)
        assert len(outs) == 8
        assert rd.height == 72
        assert rd.width == 128 * out_w_factor
    # stereo displacement: left and right halves must differ around the box
    full = outs[4].astype(np.float32)
    half = full.shape[1] // 2
    assert np.abs(full[:, :half] - full[:, half:]).mean() > 0.5


def test_render_anaglyph(tmp_path):
    clip = tmp_path / "clip.y4m"
    depth = tmp_path / "depth.y4m"
    out = tmp_path / "out_ana.y4m"
    _write_clip(clip, t=4)
    _write_depth(depth, t=4)
    cfg = RenderConfig(
        output_format="Red-Cyan Anaglyph",
        preserve_original_aspect=True,
        chunk_size=4,
    )
    prog = render_stereo_video(clip, depth, out, StereoParams(), cfg)
    assert prog.frames_done == 4
    with Y4MReader(out) as rd:
        assert rd.width == 128 and rd.height == 72
        assert len(list(rd)) == 4


def test_depth_video_pipeline_tiny(tmp_path):
    """2D video -> depth video with the tiny DA model (full depth route)."""
    from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random
    from visiondepth3d_tpu.pipeline import DepthConfig, render_depth_video_file

    clip = tmp_path / "clip.y4m"
    _write_clip(clip, t=5, h=72, w=128)
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=70), inference_size=70)
    cfg = DepthConfig(batch_size=2, bits=8)
    out = tmp_path / "depth_out.y4m"
    n = render_depth_video_file(clip, out, cfg, predictor=pred)
    assert n == 5
    with Y4MReader(out) as rd:
        frames = list(rd)
    assert len(frames) == 5 and frames[0].shape == (72, 128, 3)


def test_depth_video_pipeline_letterbox(tmp_path):
    from visiondepth3d_tpu.depth import DA_TINY, DepthPredictor, init_random
    from visiondepth3d_tpu.pipeline import DepthConfig, render_depth_video_file

    clip = tmp_path / "clip_lb.y4m"
    t, h, w, bar = 10, 96, 128, 16
    with Y4MWriter(clip, w, h, 24.0) as wr:
        rng2 = np.random.default_rng(3)
        for i in range(t):
            f = rng2.integers(60, 200, (h, w, 3)).astype(np.uint8)
            f[:bar] = 0
            f[-bar:] = 0
            wr.write(f)
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=70), inference_size=70)
    cfg = DepthConfig(batch_size=4, bits=16, track_letterbox=True)
    out = tmp_path / "depth_lb.vd16"
    n = render_depth_video_file(clip, out, cfg, predictor=pred)
    assert n == t
    # sidecar written with the detected crop
    import json
    sidecar = json.loads((tmp_path / "depth_lb.vd16.letterbox.json").read_text())
    assert sidecar["top"] > 0 and sidecar["bottom"] > 0
    from visiondepth3d_tpu.io.depth_io import Depth16Reader
    r = Depth16Reader(out)
    d0 = r.read()
    r.close()
    assert d0.shape == (h, w)  # bars reinserted to full height


def test_depth_video_pipeline_diffusion_routes(tmp_path):
    from visiondepth3d_tpu.pipeline import DepthConfig, render_depth_video_file

    clip = tmp_path / "clip_d.y4m"
    _write_clip(clip, t=6, h=48, w=64)
    for model in ("marigold", "depthcrafter"):
        cfg = DepthConfig(model=model, batch_size=2, bits=8, steps=1,
                          window_size=4, overlap=2, target_fps=100.0,
                          allow_random=True)
        out = tmp_path / f"depth_{model}.y4m"
        n = render_depth_video_file(clip, out, cfg)
        assert n == 6, model


def test_device_yuv_matches_host_convert(tmp_path):
    """The device-side rgb->yuv420 (ops.convert.rgb_u8_to_yuv420) must be
    bit-exact with the C++ writer's conversion: rendering with device_yuv
    on/off produces byte-identical y4m files."""
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        render_stereo_video,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    clip = tmp_path / "in.y4m"
    depth = tmp_path / "d.y4m"
    _write_clip(clip, t=5, h=48, w=64)
    _write_clip(depth, t=5, h=48, w=64)
    p = StereoParams(blur_ksize=3)
    outs = []
    for dev_yuv in (True, False):
        out = tmp_path / f"out_{dev_yuv}.y4m"
        cfg = RenderConfig(output_format="Half-SBS", output_height=48,
                           preserve_original_aspect=True, chunk_size=4,
                           device_yuv=dev_yuv)
        render_stereo_video(clip, depth, out, p, cfg)
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_frames_extract_assemble_roundtrip(tmp_path):
    """vd3d frames: video -> PNG folder -> video round-trip preserves
    pixels (merged_pipeline.py:109-173 extract + writer leg)."""
    import numpy as np

    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.pipeline.image_pipeline import (
        assemble_frames,
        extract_frames,
    )

    src = tmp_path / "in.y4m"
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
              for _ in range(4)]
    with Y4MWriter(src, 48, 32, 24.0) as wr:
        for f in frames:
            wr.write(f)
    with Y4MReader(src) as rd:
        decoded = list(rd)  # the y4m chroma subsample is the fidelity floor

    n = extract_frames(src, tmp_path / "fr", step=1)
    assert n == 4
    assert (tmp_path / "fr" / "frame_00003.png").exists()

    out = tmp_path / "out.y4m"
    n2 = assemble_frames(tmp_path / "fr", out, fps=24.0)
    assert n2 == 4
    with Y4MReader(out) as rd:
        back = list(rd)
    assert len(back) == 4
    for a, b in zip(decoded, back):
        # PNG is lossless; the only loss is the second 4:2:0 round-trip
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 3.0


def test_full_product_chain(tmp_path):
    """The reference's complete user journey as one chain: 2D clip ->
    depth estimate (vd3d depth) -> stereo render (vd3d render) -> frame
    interpolation (vd3d tools --rife). Catches interface drift between
    the pipelines that the per-stage tests can't."""
    import numpy as np

    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.cli.main import main

    src = tmp_path / "clip.y4m"
    h, w, t = 48, 64, 6
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = (xx * 3 + i * 5) % 256
            f[..., 1] = yy * 4 % 256
            f[..., 2] = 100
            wr.write(f)

    dep = tmp_path / "clip_depth.y4m"
    rc = main(["depth", "--input", str(src), "--output", str(dep),
               "--inference-size", "28", "--batch-size", "3",
               "--allow-random-weights"])
    assert rc == 0 and dep.exists()

    sbs = tmp_path / "clip_sbs.y4m"
    rc = main(["render", "--input", str(src), "--depth", str(dep),
               "--output", str(sbs), "--format", "Full-SBS",
               "--height", "48", "--preserve-aspect",
               "--chunk-size", "3"])
    assert rc == 0
    with Y4MReader(sbs) as rd:
        frames = list(rd)
    assert len(frames) == t and frames[0].shape == (h, 2 * w, 3)

    out = tmp_path / "clip_2x.y4m"
    rc = main(["tools", "--input", str(sbs), "--output", str(out),
               "--rife", "--multiplier", "2", "--chunk-size", "3",
               "--allow-random-weights"])
    assert rc == 0
    with Y4MReader(out) as rd:
        doubled = list(rd)
    # 2t-1: one in-between per consecutive pair, none after the last frame
    assert len(doubled) == 2 * t - 1 and abs(rd.fps - 48.0) < 1e-3


def test_fused_single_pass_render(tmp_path):
    """depth_path=None + predictor: the fused 2D->3D route renders in one
    device graph per chunk (make_chunk_fn predictor branch)."""
    import numpy as np

    from visiondepth3d_tpu.depth import DepthPredictor, init_random
    from visiondepth3d_tpu.depth.configs import DA_TINY
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        render_stereo_video,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    h, w, t = 48, 64, 6
    src = tmp_path / "one.y4m"
    with Y4MWriter(str(src), w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = (xx * 3 + i * 5) % 256
            f[..., 1] = yy * 4 % 256
            f[..., 2] = 120
            wr.write(f)
    pred = DepthPredictor(DA_TINY, init_random(DA_TINY, size=28),
                          inference_size=28)
    out = tmp_path / "one_3d.y4m"
    cfg = RenderConfig(output_format="Full-SBS",
                       preserve_original_aspect=True, chunk_size=4)
    prog = render_stereo_video(str(src), None, str(out), StereoParams(),
                               cfg, predictor=pred)
    assert prog.frames_done == t
    with Y4MReader(str(out)) as rd:
        frames = [f for f in rd]
        assert rd.width == 2 * w and rd.height == h
    assert len(frames) == t
    f = frames[3].astype(int)
    assert np.abs(f[:, :w] - f[:, w:]).mean() > 0.1  # real displacement

    import pytest

    with pytest.raises(ValueError):
        render_stereo_video(str(src), None, str(out))


def test_yuv_plane_reader_device_convert_bit_exact(tmp_path):
    """Y4MPlaneReader + device yuv420_to_rgb_u8 must reproduce the C++
    reader's RGB bytes exactly (same BT.601 integer math both sides)."""
    import numpy as np

    from visiondepth3d_tpu.io import Y4MWriter
    from visiondepth3d_tpu.io.y4m import Y4MPlaneReader, Y4MReader
    from visiondepth3d_tpu.ops.convert import yuv420_to_rgb_u8

    p = str(tmp_path / "c.y4m")
    rng = np.random.default_rng(0)
    with Y4MWriter(p, 64, 48, 24.0) as wr:
        for _ in range(3):
            wr.write(rng.integers(0, 256, (48, 64, 3), np.uint8))
    rgb_frames = []
    with Y4MReader(p) as rd:
        for f in rd:
            rgb_frames.append(f)
    with Y4MPlaneReader(p) as pr:
        assert pr.count() == 3
        for i in range(3):
            y, u, v = pr.read()
            got = np.asarray(yuv420_to_rgb_u8(y, u, v))
            assert np.array_equal(got, rgb_frames[i]), f"frame {i}"


def test_render_device_yuv_in_matches_host_decode(tmp_path):
    """device_yuv_in=True (raw planes to device) must produce the exact
    same render as the host-decode path."""
    import dataclasses

    import numpy as np

    from visiondepth3d_tpu.io import Y4MWriter
    from visiondepth3d_tpu.io.y4m import Y4MReader
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        render_stereo_video,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    h, w, t = 48, 64, 8
    clip = str(tmp_path / "clip.y4m")
    depth = str(tmp_path / "depth.y4m")
    rng = np.random.default_rng(1)
    with Y4MWriter(clip, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = (xx * 3 + i * 9) % 256
            f[..., 1] = (yy * 7) % 256
            wr.write(f)
    with Y4MWriter(depth, w, h, 24.0) as wr:
        for i in range(t):
            _, xx = np.mgrid[0:h, 0:w]
            d = (xx / w * 200 + 20).astype(np.uint8)
            wr.write(np.repeat(d[..., None], 3, -1))

    base = RenderConfig(output_format="Half-SBS", output_height=h,
                        preserve_original_aspect=True, chunk_size=4,
                        checkpoint_every_chunks=0, mesh="off")
    outs = {}
    for flag in (True, False):
        out = str(tmp_path / f"o{int(flag)}.y4m")
        cfg = dataclasses.replace(base, device_yuv_in=flag)
        render_stereo_video(clip, depth, out, StereoParams(blur_ksize=3),
                            cfg)
        with Y4MReader(out) as rd:
            outs[flag] = np.stack(list(rd))
    assert np.array_equal(outs[True], outs[False])


def test_native_y4m_clip_window(tmp_path):
    """Clip windows on plain .y4m need no ffmpeg: the C reader seeks by
    fixed-size record index (frames are counted, not timestamp-guessed)."""
    from visiondepth3d_tpu.io import Y4MWriter
    from visiondepth3d_tpu.io.video import open_video

    src = tmp_path / "in.y4m"
    t, h, w = 12, 24, 32
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            wr.write(np.full((h, w, 3), i * 10, np.uint8))

    rd = open_video(src, start_s=0.25, end_s=0.375)  # frames 6..8
    frames = []
    while True:
        f = rd.read()
        if f is None:
            break
        frames.append(int(f[0, 0, 0]))
    rd.close()
    # YUV420 round-trip costs ~1 u8 step; the ORDER/offset is the test
    assert len(frames) == 3
    assert all(abs(a - b) <= 2 for a, b in zip(frames, (60, 70, 80)))

    # start only: runs to EOF
    rd = open_video(src, start_s=10 / 24.0)
    n = 0
    while rd.read() is not None:
        n += 1
    rd.close()
    assert n == 2


def test_render_clip_window_native(tmp_path):
    """vd3d render --start/--end end-to-end without ffmpeg."""
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.pipeline.stereo_pipeline import (
        RenderConfig,
        render_stereo_video,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    t, h, w = 10, 48, 64
    src, dep = tmp_path / "c.y4m", tmp_path / "d.y4m"
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            wr.write(np.repeat(((xx + i) % 256).astype(np.uint8)[..., None],
                               3, -1))
    with Y4MWriter(dep, w, h, 24.0) as wr:
        for i in range(t):
            _, xx = np.mgrid[0:h, 0:w]
            wr.write(np.repeat((xx * 3 % 256).astype(np.uint8)[..., None],
                               3, -1))
    out = tmp_path / "o.y4m"
    cfg = RenderConfig(output_format="Half-SBS", output_height=h,
                       preserve_original_aspect=True, chunk_size=3,
                       checkpoint_every_chunks=0, mesh="off",
                       start_s=4 / 24.0, end_s=9 / 24.0)
    prog = render_stereo_video(src, dep, out, StereoParams(blur_ksize=3),
                               cfg)
    assert prog.frames_done == 5
    with Y4MReader(out) as rd:
        assert sum(1 for _ in rd) == 5
