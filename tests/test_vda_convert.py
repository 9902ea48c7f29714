"""convert_vda: tree congruence with the Flax model from an upstream-named
checkpoint (pretrained.* DINOv2 + head.* DPT), and the identity-temporal
guarantee — with no matching motion modules, the converted VDA must equal
per-frame Depth Anything on the same spatial weights."""

import numpy as np

import jax
import jax.numpy as jnp

from visiondepth3d_tpu.depth.dpt import DepthAnything
from visiondepth3d_tpu.depth.vda import (
    VDA_TINY,
    VideoDepthAnything,
    convert_vda,
)


def _manifest_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    bb = cfg.base.backbone
    hid, patch = bb.hidden_size, bb.patch_size
    g = {}

    def lin(prefix, cin, cout, bias=True):
        g[f"{prefix}.weight"] = rng.normal(0, cin ** -0.5,
                                           (cout, cin)).astype(np.float32)
        if bias:
            g[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def conv(prefix, cin, cout, k, bias=True):
        g[f"{prefix}.weight"] = rng.normal(
            0, 0.05, (cout, cin, k, k)).astype(np.float32)
        if bias:
            g[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def ln(prefix, c):
        g[f"{prefix}.weight"] = np.ones(c, np.float32)
        g[f"{prefix}.bias"] = np.zeros(c, np.float32)

    n_tok = (bb.image_size // patch) ** 2 + 1
    g["pretrained.cls_token"] = np.zeros((1, 1, hid), np.float32)
    g["pretrained.pos_embed"] = rng.normal(
        0, 0.02, (1, n_tok, hid)).astype(np.float32)
    conv("pretrained.patch_embed.proj", 3, hid, patch)
    ln("pretrained.norm", hid)
    for i in range(bb.num_layers):
        pre = f"pretrained.blocks.{i}"
        ln(f"{pre}.norm1", hid)
        ln(f"{pre}.norm2", hid)
        lin(f"{pre}.attn.qkv", hid, 3 * hid)
        lin(f"{pre}.attn.proj", hid, hid)
        lin(f"{pre}.mlp.fc1", hid, hid * 4)
        lin(f"{pre}.mlp.fc2", hid * 4, hid)
        if bb.layerscale:
            g[f"{pre}.ls1.gamma"] = np.full(hid, 0.1, np.float32)
            g[f"{pre}.ls2.gamma"] = np.full(hid, 0.1, np.float32)

    dpt = cfg.base
    for i, factor in enumerate(dpt.reassemble_factors):
        ch = dpt.neck_hidden_sizes[i]
        conv(f"head.projects.{i}", hid, ch, 1)
        if factor > 1:
            f = int(factor)
            g[f"head.resize_layers.{i}.weight"] = rng.normal(
                0, 0.05, (ch, ch, f, f)).astype(np.float32)
            g[f"head.resize_layers.{i}.bias"] = np.zeros(ch, np.float32)
        elif factor < 1:
            conv(f"head.resize_layers.{i}", ch, ch, 3)
    fh = dpt.fusion_hidden_size
    for i, ch in enumerate(dpt.neck_hidden_sizes):
        conv(f"head.scratch.layer{i + 1}_rn", ch, fh, 3, bias=False)
    for npos in range(len(dpt.neck_hidden_sizes), 0, -1):
        pre = f"head.scratch.refinenet{npos}"
        for u in (1, 2):
            conv(f"{pre}.resConfUnit{u}.conv1", fh, fh, 3)
            conv(f"{pre}.resConfUnit{u}.conv2", fh, fh, 3)
        conv(f"{pre}.out_conv", fh, fh, 1)
    conv("head.scratch.output_conv1", fh, fh // 2, 3)
    conv("head.scratch.output_conv2.0", fh // 2, dpt.head_hidden_size, 3)
    conv("head.scratch.output_conv2.2", dpt.head_hidden_size, 1, 1)
    return g


def test_convert_vda_congruent():
    state = _manifest_state(VDA_TINY)
    params = convert_vda(state, VDA_TINY)
    model = VideoDepthAnything(VDA_TINY)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, VDA_TINY.window, 70, 70, 3), jnp.float32),
    )["params"]

    def paths(t):
        return {jax.tree_util.keystr(p): np.asarray(v).shape
                for p, v in jax.tree_util.tree_leaves_with_path(t)}

    a, b = paths(params), paths(init)
    assert set(a) == set(b), f"missing={set(b) - set(a)} extra={set(a) - set(b)}"
    for k in a:
        assert a[k] == b[k], f"{k}: {a[k]} vs {b[k]}"


def test_converted_vda_equals_per_frame_depth_anything():
    """Zero-initialized temporal projections make the temporal attention a
    no-op, so VDA(frames) must match DepthAnything frame by frame."""
    state = _manifest_state(VDA_TINY, seed=3)
    params = convert_vda(state, VDA_TINY)
    vda = VideoDepthAnything(VDA_TINY)
    rng = np.random.default_rng(0)
    frames = rng.random((1, VDA_TINY.window, 70, 70, 3), dtype=np.float32)
    out_vda = np.asarray(
        vda.apply({"params": jax.tree.map(jnp.asarray, params)},
                  jnp.asarray(frames))
    )[0]

    da = DepthAnything(VDA_TINY.base)
    da_params = {"backbone": params["backbone"],
                 "neck_head": params["neck_head"]}
    out_da = np.asarray(
        da.apply({"params": jax.tree.map(jnp.asarray, da_params)},
                 jnp.asarray(frames[0]))
    )
    np.testing.assert_allclose(out_vda, out_da, atol=1e-4)
