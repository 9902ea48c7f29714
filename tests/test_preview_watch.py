"""Interactive preview watch loop (preview/watch.py): session-file
template round-trip, debounced re-render on edit, frame re-seek, quit."""

import json
import threading
import time
from pathlib import Path

import numpy as np

from visiondepth3d_tpu.io import Y4MWriter
from visiondepth3d_tpu.io.depth_io import Depth16Writer
from visiondepth3d_tpu.preview.watch import (
    watch_preview,
    write_session_template,
)


def _make_clip(tmp_path, t=3, h=32, w=48):
    src = tmp_path / "in.y4m"
    dep = tmp_path / "d.vd16"
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            f = np.full((h, w, 3), 40 * i + 20, np.uint8)
            wr.write(f)
    dw = Depth16Writer(dep, w, h, 24.0)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(t):
        d = ((xx / w) * 65535).astype(np.uint16)
        dw.write(d)
    dw.close()
    return src, dep


def test_session_template_roundtrip(tmp_path):
    sess = tmp_path / "s.json"
    write_session_template(sess, mode="anaglyph", frame=1)
    d = json.loads(sess.read_text())
    assert d["mode"] == "anaglyph" and d["frame"] == 1
    assert "fg_shift" in d and "quit" in d


def test_watch_rerenders_on_edit_and_quits(tmp_path):
    src, dep = _make_clip(tmp_path)
    sess = tmp_path / "s.json"
    out = tmp_path / "out"
    msgs = []

    th = threading.Thread(
        target=lambda: watch_preview(
            src, dep, sess, out, poll_s=0.05, debounce_s=0.05,
            status_cb=msgs.append,
        ),
        daemon=True,
    )
    th.start()
    # initial render (template auto-written)
    for _ in range(600):
        if len(msgs) >= 1:
            break
        time.sleep(0.1)
    assert len(msgs) >= 1, "no initial render"
    png = out / "preview_sbs.png"
    assert png.exists()

    # edit: switch mode + frame -> re-render with the new mode
    d = json.loads(sess.read_text())
    d.update({"mode": "depth", "frame": 2})
    sess.write_text(json.dumps(d))
    for _ in range(600):
        if len(msgs) >= 2:
            break
        time.sleep(0.1)
    assert len(msgs) >= 2, "no re-render after edit"
    assert (out / "preview_depth.png").exists()
    assert "frame 2" in msgs[-1] and "mode depth" in msgs[-1]

    # quit
    d["quit"] = True
    sess.write_text(json.dumps(d))
    th.join(timeout=20)
    assert not th.is_alive()
