"""vd3d verify-checkpoints: the one-command CLI readiness harness
(VERDICT r4 #6) — exercised with offline-constructible artifacts, NOT
gated on real weights (tests/test_real_weights.py is the gated, stricter
per-family harness for the day real checkpoints land)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_verify_checkpoints_walk(tmp_path):
    """The walker must: pass a valid artifact, fail a corrupt one, report
    the rest missing, write the JSON report, and never abort the walk."""
    import torch.nn as tnn
    import torch.nn.functional as tF

    from test_enhance import _bsrgan_net
    from visiondepth3d_tpu.utils.onnx_reader import write_onnx_initializers
    from visiondepth3d_tpu.utils.verify_checkpoints import verify_checkpoints

    # a loadable tiny BSRGANx2-format artifact (geometry is inferred, so
    # a small nf/nb exercises the same code path as the released file)
    net = _bsrgan_net(torch, tnn, tF, nf=8, gc=4, nb=1, sf=2).eval()
    state = {}
    for k, v in net.state_dict().items():
        k = k.replace(".rdb1.", ".RDB1.").replace(".rdb2.", ".RDB2.") \
             .replace(".rdb3.", ".RDB3.")
        if not k.startswith("upconv2."):  # ONNX export prunes unused
            state[k] = v.numpy().astype(np.float16)
    write_onnx_initializers(tmp_path / "BSRGANx2_fp16.onnx", state)

    # a corrupt artifact for another family
    (tmp_path / "rife.onnx").write_bytes(b"not a real onnx file")

    report = verify_checkpoints(str(tmp_path), progress=lambda *_: None)
    res = report["results"]
    assert res["esrgan:BSRGANx2"]["status"] == "pass"
    assert res["rife"]["status"] == "fail" and "error" in res["rife"]
    assert res["depth-anything-v2-small"]["status"] == "missing"
    assert report["failed"] == 1
    assert not (tmp_path / "vd3d_verify.json").exists()  # not asked

    # CLI path writes the report and exits nonzero on failures
    from visiondepth3d_tpu.cli.main import main

    rc = main(["verify-checkpoints", str(tmp_path)])
    assert rc == 1  # the corrupt rife.onnx
    with open(tmp_path / "vd3d_verify.json") as f:
        saved = json.load(f)
    assert saved["passed"] >= 1
