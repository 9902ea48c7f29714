"""The arbitrary-ONNX graph executor (VERDICT r2 missing #2).

The reference runs any [Local] model.onnx through onnxruntime
(render_depth.py:716-724,832-954); here the graph is parsed dependency-free
and interpreted onto jax/lax ops. Fixtures are written by our own
write_onnx_graph (no ``onnx`` package in the image — torch's exporter
needs it); numerics are checked against torch CPU ops.
"""

import numpy as np
import pytest

from visiondepth3d_tpu.depth.onnx_exec import (
    OnnxDepthPredictor,
    OnnxExecutor,
    OnnxUnsupportedOp,
)
from visiondepth3d_tpu.utils.onnx_reader import (
    read_onnx_graph,
    write_onnx_graph,
)

torch = pytest.importorskip("torch")


def _node(op, inputs, outputs, **attrs):
    return {"op": op, "inputs": inputs, "outputs": outputs, "attrs": attrs}


def test_roundtrip_graph_parse(tmp_path):
    p = str(tmp_path / "m.onnx")
    w = np.random.default_rng(0).standard_normal((4, 3, 3, 3)).astype(
        np.float32)
    write_onnx_graph(
        p,
        inputs=[("x", [1, 3, 8, 8])],
        outputs=[("y", [1, 4, 8, 8])],
        nodes=[_node("Conv", ["x", "w"], ["y"], pads=[1, 1, 1, 1],
                     strides=[1, 1])],
        initializers={"w": w},
    )
    g = read_onnx_graph(p)
    assert g["inputs"] == [("x", [1, 3, 8, 8])]
    assert g["outputs"][0][0] == "y"
    assert g["nodes"][0]["op"] == "Conv"
    assert g["nodes"][0]["attrs"]["pads"] == [1, 1, 1, 1]
    np.testing.assert_array_equal(g["initializers"]["w"], w)


def test_conv_bn_relu_resize_vs_torch(tmp_path):
    """A small depth-net graph: Conv/BN/Relu/bilinear Resize/squeeze —
    the backbone op pattern of every CNN in the catalog."""
    rng = np.random.default_rng(1)
    w1 = rng.standard_normal((8, 3, 3, 3)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(8).astype(np.float32) * 0.1
    scale = rng.random(8).astype(np.float32) + 0.5
    bias = rng.standard_normal(8).astype(np.float32) * 0.1
    mean = rng.standard_normal(8).astype(np.float32) * 0.1
    var = rng.random(8).astype(np.float32) + 0.5
    w2 = rng.standard_normal((1, 8, 1, 1)).astype(np.float32) * 0.2

    p = str(tmp_path / "m.onnx")
    write_onnx_graph(
        p,
        inputs=[("x", [None, 3, 32, 32])],
        outputs=[("d", None)],
        nodes=[
            _node("Conv", ["x", "w1", "b1"], ["h1"], strides=[2, 2],
                  pads=[1, 1, 1, 1]),
            _node("BatchNormalization",
                  ["h1", "scale", "bias", "mean", "var"], ["h2"],
                  epsilon=1e-5),
            _node("Relu", ["h2"], ["h3"]),
            _node("Resize", ["h3", "", "scales"], ["h4"], mode=b"linear",
                  coordinate_transformation_mode=b"half_pixel"),
            _node("Conv", ["h4", "w2"], ["h5"]),
            _node("Squeeze", ["h5"], ["d"], axes=[1]),
        ],
        initializers={
            "w1": w1, "b1": b1, "scale": scale, "bias": bias,
            "mean": mean, "var": var, "w2": w2,
            "scales": np.asarray([1.0, 1.0, 2.0, 2.0], np.float32),
        },
    )
    exe = OnnxExecutor(p)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    (got,) = exe.run(exe.initializers, {"x": x})

    xt = torch.from_numpy(x)
    h = torch.nn.functional.conv2d(xt, torch.from_numpy(w1),
                                   torch.from_numpy(b1), 2, 1)
    h = torch.nn.functional.batch_norm(
        h, torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
    h = torch.relu(h)
    h = torch.nn.functional.interpolate(h, scale_factor=2, mode="bilinear",
                                        align_corners=False)
    h = torch.nn.functional.conv2d(h, torch.from_numpy(w2))
    ref = h.squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_vit_block_ops_vs_torch(tmp_path):
    """Transformer-ish ops: MatMul + Add + LayerNorm + Softmax + Erf-GELU
    + Transpose — the ViT op set."""
    rng = np.random.default_rng(2)
    d = 16
    wq = rng.standard_normal((d, d)).astype(np.float32) * 0.2
    g = rng.random(d).astype(np.float32) + 0.5
    b = rng.standard_normal(d).astype(np.float32) * 0.1
    p = str(tmp_path / "vit.onnx")
    write_onnx_graph(
        p,
        inputs=[("x", [1, 8, d])],
        outputs=[("y", None)],
        nodes=[
            _node("LayerNormalization", ["x", "g", "b"], ["h"], axis=-1,
                  epsilon=1e-5),
            _node("MatMul", ["h", "wq"], ["q"]),
            _node("Transpose", ["q"], ["qt"], perm=[0, 2, 1]),
            _node("MatMul", ["q", "qt"], ["att"]),
            _node("Softmax", ["att"], ["attp"], axis=-1),
            _node("MatMul", ["attp", "q"], ["o"]),
            _node("Div", ["o", "c_sqrt2"], ["o1"]),
            _node("Erf", ["o1"], ["o2"]),
            _node("Add", ["o2", "c_one"], ["o3"]),
            _node("Mul", ["o", "o3"], ["o4"]),
            _node("Mul", ["o4", "c_half"], ["y"]),
        ],
        initializers={
            "wq": wq, "g": g, "b": b,
            "c_sqrt2": np.float32(np.sqrt(2.0)),
            "c_one": np.float32(1.0), "c_half": np.float32(0.5),
        },
    )
    exe = OnnxExecutor(p)
    x = rng.standard_normal((1, 8, d)).astype(np.float32)
    (got,) = exe.run(exe.initializers, {"x": x})

    xt = torch.from_numpy(x)
    h = torch.nn.functional.layer_norm(xt, (d,), torch.from_numpy(g),
                                       torch.from_numpy(b), eps=1e-5)
    q = h @ torch.from_numpy(wq)
    att = torch.softmax(q @ q.transpose(1, 2), dim=-1)
    o = att @ q
    ref = torch.nn.functional.gelu(o).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_shape_math_stays_static(tmp_path):
    """Shape -> Gather -> Concat -> Reshape: the exporter's dynamic-shape
    idiom must be folded to static ints at trace time."""
    p = str(tmp_path / "s.onnx")
    write_onnx_graph(
        p,
        inputs=[("x", [2, 3, 4, 5])],
        outputs=[("y", None)],
        nodes=[
            _node("Shape", ["x"], ["sh"]),
            _node("Gather", ["sh", "i0"], ["b"], axis=0),
            _node("Unsqueeze", ["b"], ["b1"], axes=[0]),
            _node("Concat", ["b1", "negone"], ["tgt"], axis=0),
            _node("Reshape", ["x", "tgt"], ["y"]),
        ],
        initializers={"i0": np.asarray(0, np.int64),
                      "negone": np.asarray([-1], np.int64)},
    )
    exe = OnnxExecutor(p)
    import jax

    x = np.random.default_rng(0).random((2, 3, 4, 5)).astype(np.float32)
    # must survive jit: shape math happens at trace time
    (y,) = jax.jit(lambda px, fx: exe.run(px, {"x": fx}))(
        exe.initializers, x)
    assert y.shape == (2, 60)
    np.testing.assert_allclose(np.asarray(y), x.reshape(2, 60), atol=0)


def test_pool_pad_ops_vs_torch(tmp_path):
    rng = np.random.default_rng(3)
    p = str(tmp_path / "pool.onnx")
    write_onnx_graph(
        p,
        inputs=[("x", [1, 2, 8, 8])],
        outputs=[("y", None), ("z", None)],
        nodes=[
            _node("Pad", ["x", "pads"], ["xp"], mode=b"reflect"),
            _node("MaxPool", ["xp"], ["y"], kernel_shape=[2, 2],
                  strides=[2, 2]),
            _node("AveragePool", ["x"], ["z"], kernel_shape=[3, 3],
                  strides=[1, 1], pads=[1, 1, 1, 1]),
        ],
        initializers={"pads": np.asarray([0, 0, 1, 1, 0, 0, 1, 1],
                                         np.int64)},
    )
    exe = OnnxExecutor(p)
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    y, z = exe.run(exe.initializers, {"x": x})
    xt = torch.from_numpy(x)
    xp = torch.nn.functional.pad(xt, (1, 1, 1, 1), mode="reflect")
    ref_y = torch.nn.functional.max_pool2d(xp, 2, 2).numpy()
    ref_z = torch.nn.functional.avg_pool2d(
        xt, 3, 1, 1, count_include_pad=False).numpy()
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), ref_z, atol=1e-6)


def test_unsupported_op_fails_actionably(tmp_path):
    p = str(tmp_path / "bad.onnx")
    write_onnx_graph(
        p, inputs=[("x", [1, 3, 8, 8])], outputs=[("y", None)],
        nodes=[_node("GridSample", ["x", "x"], ["y"])], initializers={})
    with pytest.raises(OnnxUnsupportedOp, match="GridSample.*vd3d convert"):
        OnnxExecutor(p)


def test_onnx_depth_predictor_contract(tmp_path):
    """OnnxDepthPredictor: [B, H, W, 3] float01 -> [B, s, s] raw depth,
    ImageNet normalize + /32 snap (run_onnx parity,
    render_depth.py:832-954)."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal((1, 3, 3, 3)).astype(np.float32) * 0.3
    p = str(tmp_path / "depth.onnx")
    write_onnx_graph(
        p,
        inputs=[("input", [None, 3, None, None])],
        outputs=[("depth", None)],
        nodes=[
            _node("Conv", ["input", "w"], ["h"], pads=[1, 1, 1, 1]),
            _node("Relu", ["h"], ["hr"]),
            _node("Squeeze", ["hr"], ["depth"], axes=[1]),
        ],
        initializers={"w": w},
    )
    pred = OnnxDepthPredictor(p, inference_size=70)
    assert pred._size == 64  # /32 snap
    frames = rng.random((2, 48, 80, 3), dtype=np.float32)
    d = np.asarray(pred(frames))
    assert d.shape == (2, 64, 64)
    assert np.isfinite(d).all()


def test_local_onnx_dir_e2e_pipeline(tmp_path):
    """A [Local] folder holding only model.onnx runs end-to-end through
    the REAL `vd3d depth` pipeline (reference [Local] ONNX capability,
    render_depth.py:716-724)."""
    rng = np.random.default_rng(5)
    mdir = tmp_path / "MyDepthModel"
    mdir.mkdir()
    w = rng.standard_normal((1, 3, 3, 3)).astype(np.float32) * 0.3
    write_onnx_graph(
        str(mdir / "model.onnx"),
        inputs=[("input", [None, 3, None, None])],
        outputs=[("depth", None)],
        nodes=[
            _node("Conv", ["input", "w"], ["h"], pads=[1, 1, 1, 1]),
            _node("Relu", ["h"], ["hr"]),
            _node("Squeeze", ["hr"], ["depth"], axes=[1]),
        ],
        initializers={"w": w},
    )
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter
    from visiondepth3d_tpu.pipeline.depth_pipeline import (
        DepthConfig,
        render_depth_video_file,
    )

    src = str(tmp_path / "in.y4m")
    with Y4MWriter(src, 48, 32, 24.0) as wr:
        for i in range(5):
            yy, xx = np.mgrid[0:32, 0:48]
            f = ((xx * 2 + yy + i * 7) % 256).astype(np.uint8)
            wr.write(np.repeat(f[..., None], 3, -1))
    cfg = DepthConfig(model=f"local:{mdir}", inference_size=64,
                      batch_size=2)
    n = render_depth_video_file(src, str(tmp_path / "d.y4m"), cfg)
    assert n == 5
    with Y4MReader(str(tmp_path / "d.y4m")) as rd:
        frames = list(rd)
    assert len(frames) == 5 and frames[0].shape == (32, 48, 3)
