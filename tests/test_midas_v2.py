"""MiDaS v2.1-small port: BN-folding parity against torch blocks, and the
converter's tree congruence with the Flax model (checkpoint naming per
isl-org MiDaS midas_v21_small_256 / its ONNX export)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiondepth3d_tpu.depth.midas_v2 import (
    MIDAS_V2_TINY,
    MBConvLite,
    MidasNetSmall,
    convert_midas_small,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class MBConvT(tnn.Module):
    """timm-style inverted residual (lite: no SE, ReLU6) with BN."""

    def __init__(self, cin, cout, expand, stride, k):
        super().__init__()
        self.expand = expand
        self.stride = stride
        self.cin, self.cout = cin, cout
        mid = cin * expand
        if expand != 1:
            self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
            self.conv_dw = tnn.Conv2d(mid, mid, k, stride, k // 2,
                                      groups=mid, bias=False)
            self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
            self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(cout, eps=1e-3)
        else:
            self.conv_dw = tnn.Conv2d(cin, cin, k, stride, k // 2,
                                      groups=cin, bias=False)
            self.bn1 = tnn.BatchNorm2d(cin, eps=1e-3)
            self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        r6 = tnn.functional.relu6
        if self.expand != 1:
            h = r6(self.bn1(self.conv_pw(x)))
            h = r6(self.bn2(self.conv_dw(h)))
            h = self.bn3(self.conv_pwl(h))
        else:
            h = r6(self.bn1(self.conv_dw(x)))
            h = self.bn2(self.conv_pw(h))
        if self.stride == 1 and self.cin == self.cout:
            h = h + x
        return h


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)


@pytest.mark.parametrize("expand,stride", [(1, 1), (6, 2), (6, 1)])
def test_mbconv_bn_folding_parity(expand, stride):
    torch.manual_seed(0)
    cin, cout, k = 8, 8 if stride == 1 else 12, 3
    blk = MBConvT(cin, cout, expand, stride, k).eval()
    _randomize_bn(blk)
    state = {f"pre.{kk}": v.numpy() for kk, v in blk.state_dict().items()}

    # fold through the converter's private path
    from visiondepth3d_tpu.depth.midas_v2 import _fold_bn

    def folded(conv_p, bn_p):
        w, b = _fold_bn(
            state[f"pre.{conv_p}.weight"], None,
            (state[f"pre.{bn_p}.weight"], state[f"pre.{bn_p}.bias"],
             state[f"pre.{bn_p}.running_mean"],
             state[f"pre.{bn_p}.running_var"]),
        )
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    if expand == 1:
        params = {"dw": folded("conv_dw", "bn1"), "pwl": folded("conv_pw", "bn2")}
    else:
        params = {"pw": folded("conv_pw", "bn1"),
                  "dw": folded("conv_dw", "bn2"),
                  "pwl": folded("conv_pwl", "bn3")}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 16, cin)).astype(np.float32)
    with torch.no_grad():
        ref = blk(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)
    ours = np.asarray(
        MBConvLite(cin, cout, expand, stride, k).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def _manifest_state(cfg, seed=0):
    """Synthetic checkpoint with the isl-org key layout + correct shapes."""
    rng = np.random.default_rng(seed)
    g = {}

    def conv(prefix, cin, cout, k, groups=1, bias=False):
        g[f"{prefix}.weight"] = rng.normal(
            0, 0.05, (cout, cin // groups, k, k)).astype(np.float32)
        if bias:
            g[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def bn(prefix, c):
        g[f"{prefix}.weight"] = np.ones(c, np.float32)
        g[f"{prefix}.bias"] = np.zeros(c, np.float32)
        g[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        g[f"{prefix}.running_var"] = np.ones(c, np.float32)

    conv("pretrained.layer1.0", 3, cfg.stem_channels, 3)
    bn("pretrained.layer1.1", cfg.stem_channels)
    prefixes = {}
    for li, group in enumerate(cfg.taps):
        base = 3 if li == 0 else 0
        for off, si in enumerate(group):
            prefixes[si] = f"pretrained.layer{li + 1}.{base + off}"
    cin = cfg.stem_channels
    for si, (e, c, n, s, k) in enumerate(cfg.stages):
        for j in range(n):
            pre = f"{prefixes[si]}.{j}"
            if e == 1:
                conv(f"{pre}.conv_dw", cin, cin, k, groups=cin)
                bn(f"{pre}.bn1", cin)
                conv(f"{pre}.conv_pw", cin, c, 1)
                bn(f"{pre}.bn2", c)
            else:
                mid = cin * e
                conv(f"{pre}.conv_pw", cin, mid, 1)
                bn(f"{pre}.bn1", mid)
                conv(f"{pre}.conv_dw", mid, mid, k, groups=mid)
                bn(f"{pre}.bn2", mid)
                conv(f"{pre}.conv_pwl", mid, c, 1)
                bn(f"{pre}.bn3", c)
            cin = c
    fus = cfg.fusion_channels
    taps_c = cfg.tap_channels
    for i in range(4):
        conv(f"scratch.layer{i + 1}_rn", taps_c[i], fus[i], 3)
    out_by_rn = {4: fus[2], 3: fus[1], 2: fus[0], 1: cfg.features}
    for npos in range(4, 0, -1):
        pre = f"scratch.refinenet{npos}"
        ch = fus[npos - 1]
        for u in (1, 2):
            conv(f"{pre}.resConfUnit{u}.conv1", ch, ch, 3, bias=True)
            conv(f"{pre}.resConfUnit{u}.conv2", ch, ch, 3, bias=True)
        conv(f"{pre}.out_conv", ch, out_by_rn[npos], 1, bias=True)
    conv("scratch.output_conv.0", cfg.features, cfg.features // 2, 3,
         bias=True)
    conv("scratch.output_conv.2", cfg.features // 2, 32, 3, bias=True)
    conv("scratch.output_conv.4", 32, 1, 1, bias=True)
    return g


def test_convert_midas_small_congruent_and_runs():
    state = _manifest_state(MIDAS_V2_TINY)
    params = convert_midas_small(state, MIDAS_V2_TINY)
    model = MidasNetSmall(MIDAS_V2_TINY)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]

    def paths(t):
        return {jax.tree_util.keystr(p): np.asarray(v).shape
                for p, v in jax.tree_util.tree_leaves_with_path(t)}

    a, b = paths(params), paths(init)
    assert set(a) == set(b), f"missing={set(b) - set(a)} extra={set(a) - set(b)}"
    for k in a:
        assert a[k] == b[k], f"{k}: {a[k]} vs {b[k]}"

    out = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                      jnp.full((2, 64, 64, 3), 0.5, jnp.float32))
    assert out.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(out)).all()
    assert np.asarray(out).min() >= 0  # non_negative head
