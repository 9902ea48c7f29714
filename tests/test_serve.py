"""Web control surface tests (`vd3d serve`): job manager semantics +
the real HTTP API driving a real render end-to-end (the reference's
3-tab Tk app analog, VisionDepth3D.py:668-2659)."""

import json
import time
import urllib.request

import numpy as np
import pytest

from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
from visiondepth3d_tpu.serve import JobManager
from visiondepth3d_tpu.serve.app import coerce_params, run_in_thread


def _mk_clip(path, t=6, h=48, w=64, depth=False):
    with Y4MWriter(path, w, h, 24.0) as wr:
        for i in range(t):
            yy, xx = np.mgrid[0:h, 0:w]
            if depth:
                f = np.repeat(((xx / w * 200 + 20).astype(np.uint8))
                              [..., None], 3, -1)
            else:
                f = np.stack([(xx + 4 * i) % 256, yy % 256,
                              np.full((h, w), 90)], -1).astype(np.uint8)
            wr.write(f)


def _req(url, data=None, method=None):
    if data is not None:
        req = urllib.request.Request(
            url, json.dumps(data).encode(),
            {"Content-Type": "application/json"}, method=method or "POST")
    else:
        req = urllib.request.Request(url, method=method or "GET")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read() or b"{}")


def _wait(mgr, job, states=("done", "error", "cancelled"), timeout=120):
    t0 = time.time()
    while job.status not in states:
        assert time.time() - t0 < timeout, (job.status, job.error)
        time.sleep(0.1)
    return job


# ---------------------------------------------------------------- units


def test_coerce_params_types():
    from visiondepth3d_tpu.pipeline.stereo_pipeline import RenderConfig

    out = coerce_params(RenderConfig, {
        "chunk_size": "4", "skip_blank_frames": "true",
        "output_format": "Half-SBS", "crf": 20, "nonsense": "x",
        "fps": "", "mesh": "off"})
    assert out == {"chunk_size": 4, "skip_blank_frames": True,
                   "output_format": "Half-SBS", "crf": 20, "mesh": "off"}


def test_job_manager_order_and_error():
    seen = []

    def ok(job):
        seen.append(job.id)
        return "out"

    def boom(job):
        raise RuntimeError("nope")

    mgr = JobManager({"ok": ok, "boom": boom})
    j1 = mgr.submit("ok", {})
    j2 = mgr.submit("boom", {})
    j3 = mgr.submit("ok", {})
    _wait(mgr, j3)
    assert seen == [j1.id, j3.id]
    assert (j1.status, j1.output) == ("done", "out")
    assert j2.status == "error" and "nope" in j2.error
    with pytest.raises(ValueError):
        mgr.submit("unknown", {})
    mgr.shutdown()


def test_job_pause_resume_cancel():
    ticks = []

    def stepper(job):
        check = job.cancel_check(poll_s=0.02)
        for i in range(2000):
            if check():
                return None
            ticks.append(i)
            time.sleep(0.005)
        return None

    mgr = JobManager({"step": stepper})
    job = mgr.submit("step", {})
    while not ticks:
        time.sleep(0.01)
    mgr.control(job.id, "pause")
    time.sleep(0.2)  # let the poll loop observe the pause
    assert job.status == "paused"
    n = len(ticks)
    time.sleep(0.2)
    assert len(ticks) <= n + 1  # suspended: no forward progress
    mgr.control(job.id, "resume")
    time.sleep(0.2)
    assert len(ticks) > n + 1
    mgr.control(job.id, "cancel")
    _wait(mgr, job)
    assert job.status == "cancelled"
    # cancelling a queued job kills it without running
    j2 = mgr.submit("step", {})
    # worker may grab it quickly; accept either path
    mgr.control(j2.id, "cancel")
    _wait(mgr, j2)
    assert j2.status == "cancelled"
    mgr.shutdown()


# ----------------------------------------------------------- HTTP e2e


def test_http_render_job_end_to_end(tmp_path):
    clip = tmp_path / "in.y4m"
    depth = tmp_path / "d.y4m"
    out = tmp_path / "out.y4m"
    _mk_clip(clip)
    _mk_clip(depth, depth=True)

    httpd, mgr, port = run_in_thread()
    base = f"http://127.0.0.1:{port}"
    try:
        st, meta = _req(f"{base}/api/meta")
        assert st == 200
        # schema-generated forms: the same dataclasses as the CLI
        names = {s["name"] for s in meta["render"]["config"]}
        assert {"output_format", "chunk_size", "mesh"} <= names
        assert any(m["name"] == "depth-anything-v2-small"
                   for m in meta["depth"]["models"])
        assert meta["render"]["presets"]

        st, page = 0, urllib.request.urlopen(f"{base}/", timeout=10).read()
        # chrome strings come from the i18n catalog via /api/meta now
        assert b"tabs" in page and b"ui.btn.render" in page
        assert meta["i18n"]["ui.btn.render"] == "Start render"

        st, job = _req(f"{base}/api/jobs", {
            "kind": "render",
            "params": {"input": str(clip), "depth": str(depth),
                       "output": str(out), "output_format": "Full-SBS",
                       "preserve_original_aspect": "true",
                       "chunk_size": "3", "mesh": "off",
                       "fg_shift": "10.0"}})
        assert st == 201
        jid = job["id"]
        t0 = time.time()
        while True:
            st, jobs = _req(f"{base}/api/jobs")
            j = next(x for x in jobs if x["id"] == jid)
            if j["status"] in ("done", "error"):
                break
            assert time.time() - t0 < 300, j
            time.sleep(0.3)
        assert j["status"] == "done", j.get("error")
        assert j["progress"]["frames"] == 6
        with Y4MReader(out) as rd:
            frames = list(rd)
        assert len(frames) == 6
        assert frames[0].shape == (48, 128, 3)  # Full-SBS doubles width
    finally:
        mgr.shutdown()
        httpd.shutdown()


def test_http_validation_and_control(tmp_path):
    from visiondepth3d_tpu.config.i18n import set_language

    set_language("en")  # default meta language is the process language
    httpd, mgr, port = run_in_thread()
    base = f"http://127.0.0.1:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(f"{base}/api/jobs", {"kind": "nope", "params": {"input": "x"}})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(f"{base}/api/jobs", {"kind": "render", "params": {}})
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(f"{base}/api/jobs/999/control", {"action": "cancel"})
        assert ei.value.code == 404
        # per-session language switch on the meta endpoint
        en = json.loads(urllib.request.urlopen(
            f"{base}/api/meta", timeout=10).read())
        fr = json.loads(urllib.request.urlopen(
            f"{base}/api/meta?lang=fr", timeout=10).read())
        assert en["lang"] == "en" and fr["lang"] == "fr"
        assert en["i18n"]["ui.tab.render"] != fr["i18n"]["ui.tab.render"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/meta?lang=zz", timeout=10)
        assert ei.value.code == 400
    finally:
        mgr.shutdown()
        httpd.shutdown()


def test_scenes_job(tmp_path):
    clip = tmp_path / "scenes.y4m"
    h, w = 48, 64
    with Y4MWriter(clip, w, h, 24.0) as wr:
        for i in range(40):
            v = 30 if i < 20 else 220  # hard cut at frame 20
            wr.write(np.full((h, w, 3), v, np.uint8))

    httpd, mgr, port = run_in_thread()
    base = f"http://127.0.0.1:{port}"
    try:
        st, job = _req(f"{base}/api/jobs", {
            "kind": "scenes",
            "params": {"input": str(clip), "split": "true",
                       "output": str(tmp_path / "clips")}})
        j = mgr.get(job["id"])
        _wait(mgr, j)
        assert j.status == "done", j.error
        assert j.progress["scenes"] == 2
        clips = sorted((tmp_path / "clips").glob("*.y4m"))
        assert len(clips) == 2
        with Y4MReader(clips[0]) as rd:
            assert len(list(rd)) == 20
    finally:
        mgr.shutdown()
        httpd.shutdown()


def test_pipeline_cancel_checks(tmp_path):
    """The cancel_check contract on the depth and tools pipelines
    (reference cancel_requested Event, render_depth.py:37-39): cancelling
    after the first batch stops cleanly with a valid partial output."""
    from visiondepth3d_tpu.enhance import EnhanceConfig, run_merged_pipeline
    from visiondepth3d_tpu.pipeline.depth_pipeline import (
        DepthConfig, render_depth_video_file)

    src = tmp_path / "in.y4m"
    _mk_clip(src, t=10)

    calls = {"n": 0}

    def cancel_after_two():
        calls["n"] += 1
        return calls["n"] > 2

    out = tmp_path / "enh.y4m"
    cfg = EnhanceConfig(use_esrgan=False, use_rife=True, fps_multiplier=2,
                        chunk_size=3, rife_scales=(2, 1),
                        allow_random_weights=True)
    n = run_merged_pipeline(src, out, cfg, cancel_check=cancel_after_two)
    assert 0 < n < 19  # stopped early, frames written so far are intact
    with Y4MReader(out) as rd:
        assert len(list(rd)) == n

    calls["n"] = 0
    dout = tmp_path / "d.y4m"
    dcfg = DepthConfig(batch_size=3, inference_size=70, mesh="off")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        nd = render_depth_video_file(src, dout, dcfg,
                                     cancel_check=cancel_after_two)
    assert 0 < nd < 10
    with Y4MReader(dout) as rd:
        assert len(list(rd)) == nd


def test_serve_coerces_inference_size_specs():
    """The depth form accepts the same size spec language as the CLI:
    square ints, WxH rectangles, named presets."""
    from visiondepth3d_tpu.pipeline.depth_pipeline import DepthConfig
    from visiondepth3d_tpu.serve.app import coerce_params

    assert coerce_params(DepthConfig, {"inference_size": "518"}) == {
        "inference_size": 518}
    assert coerce_params(DepthConfig, {"inference_size": "1024x576"}) == {
        "inference_size": (576, 1024)}
    assert coerce_params(DepthConfig, {"inference_size": "dc-max-quality"}
                         ) == {"inference_size": (576, 1024)}
