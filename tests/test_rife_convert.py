"""convert_rife parity: a torch transcription of the practical-RIFE v4.x
IFBlock (the layout the reference's RIFE_fp32.onnx export carries,
merged_pipeline.py:52-60) is run against the Flax IFBlock with converted
weights, for both residual-conv flavors; plus geometry inference and the
no-dependency ONNX initializer round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from visiondepth3d_tpu.enhance.rife import (
    IFBlock,
    IFNet,
    convert_rife,
    infer_rife_config,
    load_rife_weights,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


def _conv_prelu(cin, cout, stride=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, stride, 1),
        tnn.PReLU(cout),
    )


class ResConvT(tnn.Module):
    def __init__(self, c, res_prelu):
        super().__init__()
        self.res_prelu = res_prelu
        if res_prelu:
            self.conv = _conv_prelu(c, c)
        else:
            self.conv = tnn.Conv2d(c, c, 3, 1, 1)
        self.beta = tnn.Parameter(torch.ones((1, c, 1, 1)))

    def forward(self, x):
        if self.res_prelu:
            return x + self.conv(x) * self.beta
        return tF.leaky_relu(self.conv(x) * self.beta + x, 0.2)


class IFBlockT(tnn.Module):
    def __init__(self, cin, c, n_res, tail, res_prelu):
        super().__init__()
        self.conv0 = tnn.Sequential(
            _conv_prelu(cin, c // 2, 2), _conv_prelu(c // 2, c, 2)
        )
        self.convblock = tnn.Sequential(
            *[ResConvT(c, res_prelu) for _ in range(n_res)]
        )
        self.lastconv = tnn.Sequential(
            tnn.ConvTranspose2d(c, 4 * tail, 4, 2, 1), tnn.PixelShuffle(2)
        )

    def forward(self, x):
        return self.lastconv(self.convblock(self.conv0(x)))


def _make_state(n_blocks=2, cin=(7, 12), cs=(16, 8), n_res=3, tail=5,
                res_prelu=False, seed=0):
    torch.manual_seed(seed)
    blocks = [IFBlockT(cin[i], cs[i], n_res, tail, res_prelu)
              for i in range(n_blocks)]
    state = {}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            state[f"module.block{i}.{k}"] = v.numpy()
    return blocks, state


@pytest.mark.parametrize("res_prelu", [False, True])
def test_ifblock_parity(res_prelu):
    blocks, state = _make_state(res_prelu=res_prelu)
    params, cfg = convert_rife(state)
    assert cfg.cs == (16, 8) and cfg.n_res == 3 and cfg.tail_out == 5
    assert cfg.res_prelu == res_prelu
    assert cfg.scales == (2, 1)

    rng = np.random.default_rng(0)
    for i, (cin, c) in enumerate(zip((7, 12), cfg.cs)):
        x = rng.standard_normal((1, 16, 24, cin)).astype(np.float32)
        with torch.no_grad():
            ref = blocks[i](torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ref = ref.numpy().transpose(0, 2, 3, 1)
        blk = IFBlock(c, cfg.n_res, cfg.tail_out, cfg.res_prelu)
        ours = np.asarray(
            blk.apply({"params": params[f"block{i}"]}, jnp.asarray(x))
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_full_ifnet_runs_with_converted_weights():
    _, state = _make_state()
    params, cfg = convert_rife(state)
    model = cfg.build()
    rng = np.random.default_rng(1)
    img0 = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
    img1 = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
    out = np.asarray(model.apply({"params": params}, img0, img1, 0.5))
    assert out.shape == (1, 32, 48, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def test_infer_config_four_blocks():
    _, state = _make_state(n_blocks=4, cin=(7, 12, 12, 12), cs=(16, 16, 8, 8))
    cfg = infer_rife_config(state)
    assert cfg.scales == (8, 4, 2, 1)


def test_onnx_roundtrip(tmp_path):
    from visiondepth3d_tpu.utils.onnx_reader import (
        read_onnx_initializers,
        write_onnx_initializers,
    )

    _, state = _make_state(seed=2)
    path = tmp_path / "rife.onnx"
    write_onnx_initializers(path, state)
    back = read_onnx_initializers(path)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])

    params_direct, cfg_d = convert_rife(state)
    params_onnx, cfg_o = load_rife_weights(path)
    assert cfg_d == cfg_o
    flat_d = jnp.asarray(params_direct["block0"]["down0"]["conv"]["kernel"])
    flat_o = jnp.asarray(params_onnx["block0"]["down0"]["conv"]["kernel"])
    np.testing.assert_array_equal(np.asarray(flat_d), np.asarray(flat_o))


def test_ifnet_param_tree_matches_converter():
    """IFNet.init's tree must line up with convert_rife's output so
    converted checkpoints drop straight into apply()."""
    import jax

    _, state = _make_state()
    params, cfg = convert_rife(state)
    model = cfg.build()
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16, 16, 3)),
    )["params"]
    paths_init = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    paths_conv = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert paths_init == paths_conv
    shapes_i = {jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_leaves_with_path(init)}
    for p, v in jax.tree_util.tree_leaves_with_path(params):
        assert shapes_i[jax.tree_util.keystr(p)] == np.asarray(v).shape
