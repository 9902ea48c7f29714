"""Batch queue + checkpoint/resume for chunked renders."""

import numpy as np

from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
from visiondepth3d_tpu.pipeline import RenderConfig, render_stereo_video
from visiondepth3d_tpu.pipeline.batch import BatchItem, pair_videos_with_depth, run_batch
from visiondepth3d_tpu.pipeline.resume import (
    checkpoint_path,
    load_checkpoint,
    save_checkpoint,
)
from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams


def _write_pair(d, name, t=8, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    clip, depth = d / f"{name}.y4m", d / f"{name}_depth.y4m"
    with Y4MWriter(clip, w, h, 24.0) as wr:
        for i in range(t):
            wr.write(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    with Y4MWriter(depth, w, h, 24.0) as wr:
        for i in range(t):
            g = np.linspace(30, 220, w, dtype=np.uint8)[None, :].repeat(h, 0)
            wr.write(np.repeat(g[..., None], 3, -1))
    return clip, depth


def test_checkpoint_roundtrip(tmp_path):
    t0 = init_trackers(8, 8)
    t0 = t0.replace(fw_offset=t0.fw_offset + 0.123)
    out = tmp_path / "o.y4m"
    save_checkpoint(out, 42, t0)
    idx, t1 = load_checkpoint(out, init_trackers(8, 8))
    assert idx == 42
    assert abs(float(t1.fw_offset) - 0.123) < 1e-7
    assert checkpoint_path(out).exists()


def test_resume_matches_uninterrupted(tmp_path):
    clip, depth = _write_pair(tmp_path, "a", t=8)
    params = StereoParams()
    base = RenderConfig(preserve_original_aspect=True, chunk_size=2,
                        checkpoint_every_chunks=1)

    out_full = tmp_path / "full.y4m"
    render_stereo_video(clip, depth, out_full, params, base)

    # interrupted render: cancel after 2 chunks (4 frames flushed or fewer)
    out_part = tmp_path / "part.y4m"
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 2

    render_stereo_video(clip, depth, out_part, params, base, cancel_check=cancel)
    assert checkpoint_path(out_part).exists()

    # resume and finish
    cfg2 = RenderConfig(preserve_original_aspect=True, chunk_size=2,
                        checkpoint_every_chunks=1, resume=True)
    render_stereo_video(clip, depth, out_part, params, cfg2)

    with Y4MReader(out_full) as r:
        full = np.stack(list(r))
    with Y4MReader(out_part) as r:
        part = np.stack(list(r))
    assert part.shape == full.shape
    # resumed frames must match the uninterrupted render (bit-identical
    # trackers; y4m chroma is deterministic)
    np.testing.assert_array_equal(part, full)


def test_batch_pairing_and_run(tmp_path):
    vids = tmp_path / "vids"
    deps = tmp_path / "deps"
    outs = tmp_path / "outs"
    vids.mkdir(), deps.mkdir()
    for name in ("one", "two"):
        clip, depth = _write_pair(tmp_path, name, t=4)
        clip.rename(vids / clip.name)
        depth.rename(deps / depth.name)
    items = pair_videos_with_depth(vids, deps, outs)
    assert len(items) == 2
    cfg = RenderConfig(preserve_original_aspect=True, chunk_size=2)
    done = run_batch(items, StereoParams(), cfg)
    assert all(i.status == "done" for i in done)
    assert all((outs / f"{n}_3D.y4m").exists() for n in ("one", "two"))


def test_batch_continue_on_error(tmp_path):
    good_clip, good_depth = _write_pair(tmp_path, "ok", t=4)
    items = [
        BatchItem(str(tmp_path / "missing.y4m"), str(good_depth),
                  str(tmp_path / "bad_3D.y4m")),
        BatchItem(str(good_clip), str(good_depth), str(tmp_path / "ok_3D.y4m")),
    ]
    cfg = RenderConfig(preserve_original_aspect=True, chunk_size=2)
    done = run_batch(items, StereoParams(), cfg)
    assert done[0].status == "error" and done[1].status == "done"


def test_pair_skips_depth_sidecars_in_video_dir(tmp_path):
    """When videos and depths share a directory, *_depth files must not be
    enqueued as inputs themselves."""
    from pathlib import Path

    for name in ("a.y4m", "a_depth.y4m"):
        with Y4MWriter(str(tmp_path / name), 32, 16, 24.0) as wr:
            wr.write(np.zeros((16, 32, 3), np.uint8))
    items = pair_videos_with_depth(tmp_path, tmp_path, tmp_path)
    assert [Path(i.input_path).name for i in items] == ["a.y4m"]
    assert Path(items[0].depth_path).name == "a_depth.y4m"
