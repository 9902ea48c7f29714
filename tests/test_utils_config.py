"""Utilities + config subsystems: FPS meter, memory sizing, i18n, settings,
presets, audio command construction, CLI dry run, preview renders."""

import json

import numpy as np
import pytest


def test_fps_meter():
    from visiondepth3d_tpu.utils import FpsMeter

    m = FpsMeter(total=100)
    for _ in range(5):
        m.tick(10)
    assert m.done == 50
    s = m.status()
    assert "50.00%" in s and "FPS" in s and "ETA" in s


def test_render_control():
    from visiondepth3d_tpu.utils import RenderControl

    rc = RenderControl()
    assert not rc.cancelled
    rc.cancel()
    assert rc.checkpoint() is True


def test_dynamic_batch_size():
    from visiondepth3d_tpu.utils.memory import dynamic_batch_size

    n = dynamic_batch_size((1080, 1920), 518)
    assert 1 <= n <= 32
    # tiny frames allow bigger batches than 4K frames
    assert dynamic_batch_size((360, 640), 256) >= dynamic_batch_size(
        (2160, 3840), 1024
    )


def test_i18n_lookup_and_fallback():
    from visiondepth3d_tpu.config.i18n import available_languages, set_language, t

    assert set(available_languages()) >= {"en", "fr", "de", "es", "ja"}
    set_language("en")
    assert "3D" in t("render.start")
    msg = t("render.done", frames=10, fps=2.5, output="x.y4m")
    assert "10" in msg and "x.y4m" in msg
    set_language("fr")
    assert "video 3D" in t("render.start")
    # missing key in fr falls back to en
    assert t("error.no_ffmpeg") != "error.no_ffmpeg"
    set_language("en")


def test_settings_roundtrip(tmp_path):
    from visiondepth3d_tpu.config.settings import load_settings, save_settings
    from visiondepth3d_tpu.pipeline import RenderConfig
    from visiondepth3d_tpu.stereo import StereoParams

    p = StereoParams(fg_shift=11.0)
    cfg = RenderConfig(output_format="Half-SBS")
    path = tmp_path / "settings.json"
    save_settings(p, cfg, {"language": "fr"}, path)
    p2, cfg2, extras = load_settings(path)
    assert abs(float(p2.fg_shift) - 11.0) < 1e-6
    assert cfg2.output_format == "Half-SBS"
    assert extras["language"] == "fr"


def test_preset_clamping(tmp_path):
    from visiondepth3d_tpu.config import load_preset, save_preset
    from visiondepth3d_tpu.stereo import StereoParams

    path = tmp_path / "p.json"
    path.write_text(json.dumps({"fg_shift": 9999.0, "parallax_balance": -5.0}))
    p, _ = load_preset(path)
    assert float(p.fg_shift) <= 30.0
    assert float(p.parallax_balance) >= 0.1
    save_preset(tmp_path / "out.json", StereoParams())
    assert (tmp_path / "out.json").exists()


def test_audio_command_construction():
    from visiondepth3d_tpu.io import ffmpeg as ff

    cmd = ff.rip_audio_cmd("in.mkv", "out.aac", "aac", "192k")
    assert "-acodec" in cmd and "aac" in cmd and "192k" in cmd
    cmd = ff.attach_audio_cmd("v.mp4", "a.aac", "o.mp4", offset_s=1.5)
    assert "-itsoffset" in cmd and "-shortest" in cmd
    assert ff.validate_codec("garbage") == "libx264"
    assert ff.validate_codec(None) == "libx264"
    assert ff.validate_codec("libx265") == "libx265"


def test_cli_dry_run(capsys):
    from visiondepth3d_tpu.cli.main import main

    rc = main([
        "render", "--input", "a.y4m", "--depth", "d.y4m", "--dry-run",
        "--fg_shift", "12.5", "--format", "Half-SBS",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    data = json.loads(out)
    assert data["params"]["fg_shift"] == 12.5
    assert data["output"].endswith("Half-SBS.y4m")


def test_preview_modes(rgb_frame, depth_ramp):
    from visiondepth3d_tpu.preview import PREVIEW_MODES, render_preview

    for mode in PREVIEW_MODES:
        out = render_preview(rgb_frame, depth_ramp, mode=mode)
        assert out.dtype == np.uint8
        assert out.ndim == 3 and out.shape[-1] == 3


def test_preview_save_set(tmp_path, rgb_frame, depth_ramp):
    from visiondepth3d_tpu.preview import save_preview_set

    out = save_preview_set(rgb_frame, depth_ramp, tmp_path / "pv", mode="anaglyph")
    assert (out / "preview_anaglyph.png").exists()
    assert (out / "preview_input.png").exists()
    assert (out / "preview_depth.png").exists()


def test_tiling_roundtrip(rng):
    import jax.numpy as jnp

    from visiondepth3d_tpu.ops.tiling import tiled_apply

    img = jnp.asarray(rng.random((70, 100, 3), dtype=np.float32))
    out = tiled_apply(lambda t: t, img, (32, 48), overlap=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_scene_spans_as_dp_segments():
    from visiondepth3d_tpu.parallel import segment_bounds
    from visiondepth3d_tpu.utils import scenes_to_spans

    spans = scenes_to_spans([0, 30, 60], 90)
    assert spans == [(0, 30), (30, 60), (60, 90)]
    bounds = segment_bounds(90, 3, scene_cuts=[30, 60])
    assert bounds == [(0, 30), (30, 60), (60, 90)]


def test_models_cli_listing(capsys):
    from visiondepth3d_tpu.cli.main import main

    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "midas-v3-hybrid" in out and "dpt_hybrid" in out
    assert "depth-anything-v2-small" in out and "518" in out


def test_params_dict_roundtrip_preserves_static_types():
    """params_to_dict floats every scalar; from_dict must coerce bool/int
    STATIC fields back (a float blur_ksize reaches a jit shape expression
    and crashes) — regression for the preview session-file loop."""
    from visiondepth3d_tpu.config.presets import (
        params_from_dict,
        params_to_dict,
    )
    from visiondepth3d_tpu.stereo import StereoParams

    p0 = StereoParams(blur_ksize=7, enable_healing=True)
    d = params_to_dict(p0)
    assert isinstance(d["blur_ksize"], float)  # the hazard being tested
    p1, _ = params_from_dict(d)
    assert p1.blur_ksize == 7 and isinstance(p1.blur_ksize, int)
    assert p1.enable_healing is True
    assert isinstance(p1.enable_feathering, bool)


def test_cli_lang_switches_messages(tmp_path, capsys):
    """--lang routes user-facing CLI messages through the i18n packs
    (VisionDepth3D.py:88-110 analog)."""
    import numpy as np

    from visiondepth3d_tpu.cli.main import main
    from visiondepth3d_tpu.config.i18n import set_language, t
    from visiondepth3d_tpu.io import Y4MWriter

    set_language("fr")
    assert t("render.done", frames=3, fps=1.0, output="x") != t.__doc__
    fr = t("render.done", frames=3, fps=1.0, output="x")
    set_language("en")
    en = t("render.done", frames=3, fps=1.0, output="x")
    assert fr != en and "3" in fr and "x" in fr

    # end-to-end: a tiny render with --lang fr prints the french message
    src, dep = tmp_path / "c.y4m", tmp_path / "d.y4m"
    for p in (src, dep):
        with Y4MWriter(p, 48, 32, 24.0) as wr:
            for i in range(2):
                wr.write(np.full((32, 48, 3), 100 + i, np.uint8))
    rc = main(["--lang", "fr", "render", "--input", str(src),
               "--depth", str(dep), "--output", str(tmp_path / "o.y4m"),
               "--height", "32", "--preserve-aspect", "--chunk-size", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert fr.split("{")[0][:10] in out or "2" in out
    set_language("en")


def test_make_control_check(tmp_path):
    """Suspend/resume/cancel control file (render_3d.py:1195-1220 analog)."""
    import threading
    import time

    from visiondepth3d_tpu.utils.observability import make_control_check

    ctl = tmp_path / "ctl"
    check = make_control_check(str(ctl), poll_s=0.05)
    assert check() is False          # missing file -> run
    ctl.write_text("run")
    assert check() is False
    ctl.write_text("cancel")
    assert check() is True

    # pause blocks until the state changes
    ctl.write_text("pause")
    released = []

    def worker():
        released.append(check())

    th = threading.Thread(target=worker)
    th.start()
    time.sleep(0.15)
    assert not released              # still suspended
    ctl.write_text("run")
    th.join(timeout=2.0)
    assert released == [False]       # resumed, not cancelled


def test_parse_timecode_reference_semantics():
    """render_3d.py:77-97 parity: HH:MM:SS / MM:SS / SS with optional .ms;
    blank or unparseable -> None; numbers pass through."""
    from visiondepth3d_tpu.pipeline.geometry import parse_timecode as P

    assert P("01:02:03") == 3723.0
    assert P("02:03.5") == 123.5
    assert P("90") == 90.0
    assert P("90.25") == 90.25
    assert P("") is None and P(None) is None and P("  ") is None
    assert P("nonsense") is None
    assert P(12.5) == 12.5


def test_resolve_clip_window_duration_semantics():
    """VisionDepth3D.py:1589-1594 parity: end <= start means end is a
    DURATION; degenerate windows get a 1 ms guard."""
    from visiondepth3d_tpu.pipeline.geometry import resolve_clip_window as R

    assert R("00:52:26", "00:00:30") == (3146.0, 3176.0)
    assert R(10.0, 40.0) == (10.0, 40.0)  # normal window untouched
    assert R(10.0, 5.0) == (10.0, 15.0)  # duration
    s, e = R(10.0, 0.0)
    assert s == 10.0 and e == pytest.approx(10.001)
    assert R(None, 30.0) == (None, 30.0)
    assert R(5.0, None) == (5.0, None)
