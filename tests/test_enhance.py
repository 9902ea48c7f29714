"""RIFE / Real-ESRGAN: torch-parity for RRDBNet, behavioral checks for IFNet,
merged pipeline end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from visiondepth3d_tpu.enhance import (
    EnhanceConfig,
    IFNet,
    RRDBNet,
    blend_images,
    convert_rrdbnet,
    init_enhance_params,
    run_merged_pipeline,
)
from visiondepth3d_tpu.ops.flow_warp import flow_warp


def test_flow_warp_identity(rgb_frame):
    flow = np.zeros(rgb_frame.shape[:2] + (2,), np.float32)
    out = np.asarray(flow_warp(jnp.asarray(rgb_frame), jnp.asarray(flow)))
    np.testing.assert_allclose(out, rgb_frame, atol=1e-6)


def test_flow_warp_integer_shift(rgb_frame):
    flow = np.zeros(rgb_frame.shape[:2] + (2,), np.float32)
    flow[..., 0] = 3.0  # sample 3 px to the right
    out = np.asarray(flow_warp(jnp.asarray(rgb_frame), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :-3], rgb_frame[:, 3:], atol=1e-6)


def test_rrdbnet_matches_torch_transcription():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    nf, gc, nb = 16, 8, 2

    class RDB(tnn.Module):
        def __init__(self):
            super().__init__()
            for k in range(1, 6):
                cin = nf + (k - 1) * gc
                cout = gc if k < 5 else nf
                setattr(self, f"conv{k}", tnn.Conv2d(cin, cout, 3, 1, 1))

        def forward(self, x):
            x1 = tF.leaky_relu(self.conv1(x), 0.2)
            x2 = tF.leaky_relu(self.conv2(torch.cat([x, x1], 1)), 0.2)
            x3 = tF.leaky_relu(self.conv3(torch.cat([x, x1, x2], 1)), 0.2)
            x4 = tF.leaky_relu(self.conv4(torch.cat([x, x1, x2, x3], 1)), 0.2)
            x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
            return x + 0.2 * x5

    class RRDBt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDB(), RDB(), RDB()

        def forward(self, x):
            return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = tnn.Conv2d(3, nf, 3, 1, 1)
            self.body = tnn.ModuleList([RRDBt() for _ in range(nb)])
            self.conv_body = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = tnn.Conv2d(nf, 3, 3, 1, 1)

        def forward(self, x):
            feat = self.conv_first(x)
            trunk = feat
            for b in self.body:
                trunk = b(trunk)
            feat = feat + self.conv_body(trunk)
            feat = tF.leaky_relu(
                self.conv_up1(tF.interpolate(feat, scale_factor=2, mode="nearest")), 0.2
            )
            feat = tF.leaky_relu(
                self.conv_up2(tF.interpolate(feat, scale_factor=2, mode="nearest")), 0.2
            )
            return self.conv_last(tF.leaky_relu(self.conv_hr(feat), 0.2))

    torch.manual_seed(0)
    net = Net().eval()
    x = np.random.default_rng(0).random((1, 12, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ref = np.moveaxis(ref, 1, -1)

    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params = convert_rrdbnet(state, nb=nb)
    model = RRDBNet(nf=nf, nb=nb, gc=gc, scale=4)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_ifnet_shapes_and_identity():
    model = IFNet(c=32, scales=(2, 1))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 64, 96, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), img, img)["params"]
    out = model.apply({"params": params}, img, img, 0.5)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    # identical inputs: any flow field still samples the same image, so the
    # merge must reproduce it wherever flows stay in-bounds; check bounds only
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1


def test_blend_modes(rgb_frame):
    up = np.clip(rgb_frame * 1.1, 0, 1)
    for mode, alpha in [("OFF", 1.0), ("LOW", 0.85), ("MEDIUM", 0.5), ("HIGH", 0.25)]:
        out = np.asarray(blend_images(jnp.asarray(rgb_frame), jnp.asarray(up), mode))
        ref = up * alpha + rgb_frame * (1 - alpha)
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_merged_pipeline_e2e(tmp_path):
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter

    src = tmp_path / "in.y4m"
    dst = tmp_path / "out.y4m"
    t, h, w = 5, 48, 64
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            f = np.full((h, w, 3), 20 * i + 30, np.uint8)
            wr.write(f)
    cfg = EnhanceConfig(
        use_esrgan=False, use_rife=True, fps_multiplier=2, chunk_size=3,
        rife_scales=(2, 1), allow_random_weights=True,
    )
    n = run_merged_pipeline(src, dst, cfg)
    assert n == (t - 1) * 2 + 1  # 2x interpolation
    with Y4MReader(dst) as rd:
        assert abs(rd.fps - 48.0) < 1e-3
        outs = list(rd)
    assert len(outs) == n


def test_merged_pipeline_requires_weights(tmp_path):
    from visiondepth3d_tpu.io import Y4MWriter

    src = tmp_path / "in.y4m"
    with Y4MWriter(src, 32, 32, 24.0) as wr:
        wr.write(np.zeros((32, 32, 3), np.uint8))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="converted checkpoints"):
        run_merged_pipeline(src, tmp_path / "out.y4m",
                            EnhanceConfig(rife_scales=(2, 1)))


def test_merged_pipeline_upscaled_output_size(tmp_path):
    """keep_original_size=False: writer geometry must follow the ESRGAN
    scale (reference merged_pipeline.py:240-267 resize-back is optional)."""
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter

    src = tmp_path / "in.y4m"
    dst = tmp_path / "out.y4m"
    t, h, w = 3, 24, 32
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            wr.write(np.full((h, w, 3), 40 * i + 20, np.uint8))
    cfg = EnhanceConfig(
        use_esrgan=True, esrgan_scale=2, esrgan_nf=8, esrgan_nb=1,
        keep_original_size=False, use_rife=False, chunk_size=2,
        allow_random_weights=True,
    )
    n = run_merged_pipeline(src, dst, cfg)
    assert n == t
    with Y4MReader(dst) as rd:
        assert (rd.width, rd.height) == (w * 2, h * 2)
        assert len(list(rd)) == t


def test_enhance_bf16_close_to_f32(tmp_path):
    """EnhanceConfig(dtype='bfloat16') output within a few u8 steps of the
    f32 path (u8 source, u8 sink — bf16 mantissa covers it)."""
    import numpy as np
    import jax.numpy as jnp

    from visiondepth3d_tpu.enhance import EnhanceConfig, init_enhance_params
    from visiondepth3d_tpu.enhance.pipeline import make_enhance_fn

    cfg32 = EnhanceConfig(esrgan_nb=2, esrgan_nf=16, use_rife=True,
                          fps_multiplier=2, esrgan_scale=2,
                          keep_original_size=True)
    ep, rp = init_enhance_params(cfg32)
    cfg16 = EnhanceConfig(**{**cfg32.__dict__, "dtype": "bfloat16"})
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 32, 48, 3)).astype(np.uint8)
    f32 = make_enhance_fn(cfg32, ep, rp, (32, 48))
    f16 = make_enhance_fn(cfg16, ep, rp, (32, 48))
    o32 = np.asarray(f32(jnp.asarray(frames))).astype(np.int32)
    o16 = np.asarray(f16(jnp.asarray(frames))).astype(np.int32)
    assert o32.shape == o16.shape
    assert np.mean(np.abs(o32 - o16)) < 3.0
    assert np.percentile(np.abs(o32 - o16), 99) <= 12


def test_rrdbnet_staged_matches_whole():
    """apply_rrdbnet_staged (trunk whole, tail tiled w/ halo) == RRDBNet.apply
    exactly, including true-border zero padding, for x4 and the
    pixel-unshuffle x2 variant."""
    import jax
    import jax.numpy as jnp

    from visiondepth3d_tpu.enhance.esrgan import RRDBNet, apply_rrdbnet_staged

    rng = np.random.default_rng(7)
    for scale, hw in ((4, (24, 32)), (2, (24, 32))):
        model = RRDBNet(nf=16, nb=2, gc=8, scale=scale)
        x = jnp.asarray(rng.random((1, *hw, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        whole = model.apply({"params": params}, x)
        # trunk output is (H, W)/unshuffle; tiles must divide it
        fh = hw[0] // (4 // scale)
        staged = apply_rrdbnet_staged(model, params, x,
                                      tail_tile_hw=(fh // 2, 8), halo=2)
        assert staged.shape == whole.shape
        np.testing.assert_allclose(np.asarray(staged), np.asarray(whole),
                                   atol=2e-6)


def test_apply_esrgan_staged_threshold():
    """_apply_esrgan picks the staged path above the HBM threshold and the
    two paths agree exactly."""
    import jax
    import jax.numpy as jnp

    from visiondepth3d_tpu.enhance.esrgan import RRDBNet
    from visiondepth3d_tpu.enhance.pipeline import EnhanceConfig, _apply_esrgan

    cfg = EnhanceConfig(esrgan_nf=8, esrgan_nb=1, esrgan_scale=4)
    model = RRDBNet(nf=8, nb=1, gc=8, scale=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 40, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    whole = model.apply({"params": params}, x)
    # below the threshold: the dispatcher returns the monolithic result
    out = _apply_esrgan(cfg, model, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(whole), atol=0)
    # shrink the threshold so the DISPATCHER takes the staged branch
    import visiondepth3d_tpu.enhance.pipeline as pl_mod

    orig = pl_mod._STAGE_THRESHOLD_PX
    try:
        pl_mod._STAGE_THRESHOLD_PX = 1
        staged = _apply_esrgan(cfg, model, params, x)
    finally:
        pl_mod._STAGE_THRESHOLD_PX = orig
    np.testing.assert_allclose(np.asarray(staged), np.asarray(whole),
                               atol=2e-6)
    # prime-ish dims have no usable tile divisor -> monolithic fallback,
    # not an assert crash
    x2 = jnp.asarray(np.random.default_rng(4).random((1, 37, 41, 3)),
                     jnp.float32)
    whole2 = model.apply({"params": params}, x2)
    try:
        pl_mod._STAGE_THRESHOLD_PX = 1
        # 37/41 are prime: no usable tile divisor -> monolithic fallback
        out2 = _apply_esrgan(cfg, model, params, x2)
    finally:
        pl_mod._STAGE_THRESHOLD_PX = orig
    np.testing.assert_allclose(np.asarray(out2), np.asarray(whole2), atol=0)


def test_merged_pipeline_mesh_parity(tmp_path):
    """`vd3d tools --mesh dp=8` semantics: sharding the chunk's frame axis
    over the 8-virtual-device CPU mesh is bit-identical to single-device
    (VERDICT r2 item 1 extended to the frame-tools pipeline)."""
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter

    src = tmp_path / "in.y4m"
    t, h, w = 11, 48, 64
    rng = np.random.default_rng(7)
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            wr.write((rng.random((h, w, 3)) * 255).astype(np.uint8))
    cfg = EnhanceConfig(
        use_esrgan=True, esrgan_nb=1, esrgan_nf=16, esrgan_scale=4,
        use_rife=True, fps_multiplier=2, chunk_size=8,
        rife_scales=(2, 1), allow_random_weights=True,
    )
    ep, rp = init_enhance_params(cfg)
    single = tmp_path / "single.y4m"
    meshed = tmp_path / "meshed.y4m"
    n1 = run_merged_pipeline(src, single, cfg, esrgan_params=ep,
                             rife_params=rp)
    n2 = run_merged_pipeline(src, meshed, cfg, esrgan_params=ep,
                             rife_params=rp, mesh_axes={"dp": 8})
    assert n1 == n2 == (t - 1) * 2 + 1
    with Y4MReader(single) as rd:
        a = np.stack(list(rd))
    with Y4MReader(meshed) as rd:
        b = np.stack(list(rd))
    np.testing.assert_array_equal(a, b)


def test_tools_cli_mesh_flag(tmp_path):
    """--mesh parses and routes through cmd_tools."""
    from visiondepth3d_tpu.cli.main import main as cli_main
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter

    src = tmp_path / "in.y4m"
    with Y4MWriter(src, 64, 48, 24.0) as wr:
        for i in range(5):
            wr.write(np.full((48, 64, 3), 30 + i * 11, np.uint8))
    dst = tmp_path / "out.y4m"
    rc = cli_main(["tools", "--input", str(src), "--output", str(dst),
                   "--rife", "--chunk-size", "3", "--mesh", "dp=4",
                   "--allow-random-weights"])
    assert rc == 0
    with Y4MReader(dst) as rd:
        assert len(list(rd)) == 9


def _torch_rdb_cls(torch, tnn, tF, nf, gc):
    class RDB(tnn.Module):
        def __init__(self):
            super().__init__()
            for k in range(1, 6):
                cin = nf + (k - 1) * gc
                cout = gc if k < 5 else nf
                setattr(self, f"conv{k}", tnn.Conv2d(cin, cout, 3, 1, 1))

        def forward(self, x):
            x1 = tF.leaky_relu(self.conv1(x), 0.2)
            x2 = tF.leaky_relu(self.conv2(torch.cat([x, x1], 1)), 0.2)
            x3 = tF.leaky_relu(self.conv3(torch.cat([x, x1, x2], 1)), 0.2)
            x4 = tF.leaky_relu(self.conv4(torch.cat([x, x1, x2, x3], 1)), 0.2)
            x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
            return x + 0.2 * x5

    class RRDBt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDB(), RDB(), RDB()

        def forward(self, x):
            return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))

    return RRDBt


def test_realesrgan_x2_pixel_unshuffle_parity():
    """Real-ESRGAN x2plus style: torch pixel_unshuffle (c-major channel
    order) feeds a 12-in conv_first; converted weights must reproduce the
    torch output exactly — this pins our NHWC unshuffle channel order."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    from visiondepth3d_tpu.enhance import convert_esrgan

    nf, gc, nb = 16, 8, 2
    RRDBt = _torch_rdb_cls(torch, tnn, tF, nf, gc)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = tnn.Conv2d(12, nf, 3, 1, 1)
            self.body = tnn.ModuleList([RRDBt() for _ in range(nb)])
            self.conv_body = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = tnn.Conv2d(nf, 3, 3, 1, 1)

        def forward(self, x):
            feat = tF.pixel_unshuffle(x, 2)
            feat = self.conv_first(feat)
            trunk = feat
            for b in self.body:
                trunk = b(trunk)
            feat = feat + self.conv_body(trunk)
            feat = tF.leaky_relu(self.conv_up1(
                tF.interpolate(feat, scale_factor=2, mode="nearest")), 0.2)
            feat = tF.leaky_relu(self.conv_up2(
                tF.interpolate(feat, scale_factor=2, mode="nearest")), 0.2)
            return self.conv_last(tF.leaky_relu(self.conv_hr(feat), 0.2))

    torch.manual_seed(1)
    net = Net().eval()
    x = np.random.default_rng(1).random((1, 12, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ref = np.moveaxis(ref, 1, -1)

    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params, cfg = convert_esrgan(state)
    assert (cfg.scale, cfg.n_up, cfg.unshuffle) == (2, 2, True)
    assert (cfg.nf, cfg.nb, cfg.gc) == (nf, nb, gc)
    ours = np.asarray(cfg.build().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def _bsrgan_net(torch, tnn, tF, nf, gc, nb, sf):
    """KAIR/BSRGAN network_rrdbnet.py transcription: RRDB_trunk naming,
    no unshuffle, upconv2 applied only at sf=4 (but always DEFINED —
    the .pth ambiguity the scale override exists for)."""
    RRDBt = _torch_rdb_cls(torch, tnn, tF, nf, gc)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_first = tnn.Conv2d(3, nf, 3, 1, 1)
            self.RRDB_trunk = tnn.Sequential(*[RRDBt() for _ in range(nb)])
            self.trunk_conv = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.upconv1 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.upconv2 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.HRconv = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = tnn.Conv2d(nf, 3, 3, 1, 1)

        def forward(self, x):
            fea = self.conv_first(x)
            fea = fea + self.trunk_conv(self.RRDB_trunk(fea))
            fea = tF.leaky_relu(self.upconv1(
                tF.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
            if sf == 4:
                fea = tF.leaky_relu(self.upconv2(
                    tF.interpolate(fea, scale_factor=2, mode="nearest")), 0.2)
            return self.conv_last(tF.leaky_relu(self.HRconv(fea), 0.2))

    return Net()


def test_bsrgan_x2_parity_and_onnx_roundtrip(tmp_path):
    """BSRGANx2: KAIR naming, single upsample stage. Exercises (a) the
    KAIR->canonical rename, (b) scale override for the .pth ambiguity,
    (c) the ONNX-initializer load path (pruned upconv2 -> x2 inferred
    with NO override), mirroring the reference's shipped fp16 exports."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    from visiondepth3d_tpu.enhance import convert_esrgan, load_esrgan_weights
    from visiondepth3d_tpu.utils.onnx_reader import write_onnx_initializers

    nf, gc, nb = 16, 8, 2
    torch.manual_seed(2)
    net = _bsrgan_net(torch, tnn, tF, nf, gc, nb, sf=2).eval()
    x = np.random.default_rng(2).random((1, 12, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ref = np.moveaxis(ref, 1, -1)

    # KAIR uses RDB1/RDB2/RDB3 attribute case; rename rdbN -> RDBN to
    # present the authentic key shapes
    state = {}
    for k, v in net.state_dict().items():
        k = k.replace(".rdb1.", ".RDB1.").replace(".rdb2.", ".RDB2.") \
             .replace(".rdb3.", ".RDB3.")
        state[k] = v.numpy()

    # (a)+(b): full .pth-style table with unused upconv2 -> needs override
    params, cfg = convert_esrgan(state, scale=2)
    assert (cfg.scale, cfg.n_up, cfg.unshuffle) == (2, 1, False)
    ours = np.asarray(cfg.build().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # without the override, the dangling upconv2 makes it look like x4
    _, cfg4 = convert_esrgan(state)
    assert cfg4.scale == 4

    # (c): ONNX export prunes unused initializers -> x2 auto-inferred;
    # fp16 storage like the reference's *_fp16.onnx artifacts
    pruned = {k: v.astype(np.float16) for k, v in state.items()
              if not k.startswith("upconv2.")}
    path = tmp_path / "BSRGANx2_fp16.onnx"
    write_onnx_initializers(path, pruned)
    params_o, cfg_o = load_esrgan_weights(path)
    assert (cfg_o.scale, cfg_o.n_up, cfg_o.unshuffle) == (2, 1, False)
    ours_o = np.asarray(cfg_o.build().apply({"params": params_o},
                                            jnp.asarray(x)))
    np.testing.assert_allclose(ours_o, ref, atol=2e-3)  # fp16 storage


def test_bsrgan_x4_parity():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    from visiondepth3d_tpu.enhance import convert_esrgan

    nf, gc, nb = 16, 8, 1
    torch.manual_seed(3)
    net = _bsrgan_net(torch, tnn, tF, nf, gc, nb, sf=4).eval()
    x = np.random.default_rng(3).random((1, 8, 12, 3), dtype=np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ref = np.moveaxis(ref, 1, -1)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    params, cfg = convert_esrgan(state)
    assert (cfg.scale, cfg.n_up, cfg.unshuffle) == (4, 2, False)
    ours = np.asarray(cfg.build().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_esrgan_catalog_names():
    from visiondepth3d_tpu.enhance import ESRGAN_CATALOG

    # the five shipped dropdown entries (VisionDepth3D.py:1094-1100)
    assert set(ESRGAN_CATALOG) == {
        "RealESR_Gx4", "RealESRGAN_x4", "RealESR_Animex4",
        "BSRGANx2", "BSRGANx4",
    }
    for name, entry in ESRGAN_CATALOG.items():
        assert entry["file"].endswith(".onnx")
        assert entry["scale"] in (2, 4)


def test_merged_pipeline_accepts_rife_tuple(tmp_path):
    """CLI/serve pass load_rife_weights' (params, IFNetConfig) straight to
    run_merged_pipeline; the pipeline must unpack it and build the net
    from the checkpoint's own geometry (this path was broken before r5 —
    the tuple went into rife.apply)."""
    from visiondepth3d_tpu.enhance.rife import IFNetConfig
    from visiondepth3d_tpu.io import Y4MReader, Y4MWriter

    src = tmp_path / "in.y4m"
    t, h, w = 3, 32, 48
    with Y4MWriter(src, w, h, 24.0) as wr:
        for i in range(t):
            wr.write(np.full((h, w, 3), 40 * i + 40, np.uint8))
    rcfg = IFNetConfig(cs=(8, 4), scales=(2, 1), n_res=2, tail_out=5)
    model = rcfg.build()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 48, 3)), jnp.zeros((1, 32, 48, 3))
                        )["params"]
    cfg = EnhanceConfig(use_esrgan=False, use_rife=True, fps_multiplier=2,
                        chunk_size=2, allow_random_weights=True)
    dst = tmp_path / "out.y4m"
    n = run_merged_pipeline(src, dst, cfg, rife_params=(params, rcfg))
    assert n == (t - 1) * 2 + 1
    with Y4MReader(dst) as rd:
        assert len(list(rd)) == n
