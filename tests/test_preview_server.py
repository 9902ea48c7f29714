"""HTTP preview surface (VERDICT r2 missing #4): the web analog of the
reference's Tk preview window (preview_gui.py:41-669) — image display +
two-way param binding over the debounced watch loop."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from visiondepth3d_tpu.io import Y4MWriter


@pytest.fixture
def clip_pair(tmp_path):
    h, w = 48, 64
    clip = str(tmp_path / "c.y4m")
    depth = str(tmp_path / "d.y4m")
    with Y4MWriter(clip, w, h, 24.0) as wr:
        for i in range(4):
            yy, xx = np.mgrid[0:h, 0:w]
            f = np.zeros((h, w, 3), np.uint8)
            f[..., 0] = (xx * 3 + i * 11) % 256
            f[..., 1] = (yy * 5) % 256
            wr.write(f)
    with Y4MWriter(depth, w, h, 24.0) as wr:
        for i in range(4):
            _, xx = np.mgrid[0:h, 0:w]
            d = (xx / w * 200 + 20).astype(np.uint8)
            wr.write(np.repeat(d[..., None], 3, -1))
    return clip, depth


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def test_preview_server_end_to_end(tmp_path, clip_pair):
    from visiondepth3d_tpu.preview.server import serve_preview

    clip, depth = clip_pair
    out = tmp_path / "prev"
    port_box = {}
    evt = threading.Event()

    def started(port):
        port_box["port"] = port
        evt.set()

    result = {}

    def run():
        result["n"] = serve_preview(clip, depth, out, port=0,
                                    max_renders=3,
                                    server_started=started)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    assert evt.wait(30)
    base = f"http://127.0.0.1:{port_box['port']}"

    # the page and the state endpoint serve
    page = _get(base + "/").decode()
    assert "vd3d preview" in page and "/state" in page

    # wait for the first render (session template write triggers it)
    for _ in range(100):
        st = json.loads(_get(base + "/state"))
        if st["renders"] >= 1:
            break
        time.sleep(0.2)
    assert st["renders"] >= 1
    assert "fg_shift" in st["session"]

    # the rendered PNG set is served
    png = _get(base + "/img/preview_sbs.png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert _get(base + "/img/preview_input.png")[:4] == b"\x89PNG"[:4]

    # two-way binding: POST a param change -> watch loop re-renders
    req = urllib.request.Request(
        base + "/update", data=json.dumps({"fg_shift": 9.0}).encode(),
        method="POST")
    urllib.request.urlopen(req, timeout=10).read()
    for _ in range(100):
        st2 = json.loads(_get(base + "/state"))
        if st2["renders"] >= 2:
            break
        time.sleep(0.2)
    assert st2["renders"] >= 2
    assert st2["session"]["fg_shift"] == 9.0

    # quit via the session flag ends the loop
    req = urllib.request.Request(
        base + "/update", data=json.dumps({"quit": True}).encode(),
        method="POST")
    urllib.request.urlopen(req, timeout=10).read()
    th.join(timeout=30)
    assert not th.is_alive()
    assert result["n"] >= 2
