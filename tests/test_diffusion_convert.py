"""Diffusion-stack converters and checkpoint-dir loaders.

- CLIP vision: TRUE numerical parity against transformers'
  CLIPVisionModelWithProjection (the laion image encoder DepthCrafter
  conditions on, depthcrafter_adapter.py:33-36).
- VAE / UNet2D / ST-UNet: synthetic diffusers-NAMED checkpoints (built by
  inverse-mapping our init trees back to the diffusers layout, plus the
  diffusers-only extras our design drops) must convert into trees congruent
  with model.init and run.
- load_marigold / load_depthcrafter: end-to-end from a checkpoint
  directory (safetensors + config.json), the layout the reference consumes
  (weights/DepthCrafter, WEIGHTS_README)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visiondepth3d_tpu.depth.diffusion import (
    CLIP_TINY,
    UNET2D_TINY,
    UNET_ST_TINY,
    VAE_TINY,
    AutoencoderKL,
    CLIPVisionEncoder,
    UNet2DCondition,
    UNetSpatioTemporal,
    convert_clip_vision,
    convert_unet2d,
    convert_unet_st,
    convert_vae,
)


def tree_paths(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def assert_congruent(converted, init):
    a, b = tree_paths(converted), tree_paths(init)
    missing = set(b) - set(a)
    extra = set(a) - set(b)
    assert not missing and not extra, f"missing={missing} extra={extra}"
    for k in b:
        assert a[k] == b[k], f"{k}: {a[k]} vs {b[k]}"


# ---------------------------------------------------------------------------
# inverse mapping: our params tree -> diffusers-style state dict
# ---------------------------------------------------------------------------

def _inv(flat, prefix, leaf):
    flat[prefix] = leaf


def inv_conv(flat, prefix, p):
    _inv(flat, f"{prefix}.weight", np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        _inv(flat, f"{prefix}.bias", np.asarray(p["bias"]))


def inv_lin(flat, prefix, p):
    _inv(flat, f"{prefix}.weight", np.asarray(p["kernel"]).T)
    if "bias" in p:
        _inv(flat, f"{prefix}.bias", np.asarray(p["bias"]))


def inv_norm(flat, prefix, p):
    _inv(flat, f"{prefix}.weight", np.asarray(p["scale"]))
    _inv(flat, f"{prefix}.bias", np.asarray(p["bias"]))


def inv_resnet(flat, prefix, p):
    inv_norm(flat, f"{prefix}.norm1", p["norm1"])
    inv_conv(flat, f"{prefix}.conv1", p["conv1"])
    inv_norm(flat, f"{prefix}.norm2", p["norm2"])
    inv_conv(flat, f"{prefix}.conv2", p["conv2"])
    if "shortcut" in p:
        inv_conv(flat, f"{prefix}.conv_shortcut", p["shortcut"])
    if "time_emb" in p:
        inv_lin(flat, f"{prefix}.time_emb_proj", p["time_emb"])


def inv_temporal_resnet(flat, prefix, p):
    inv_norm(flat, f"{prefix}.norm1", p["norm1"])
    inv_norm(flat, f"{prefix}.norm2", p["norm2"])
    for c in ("conv1", "conv2"):
        k = np.asarray(p[c]["kernel"])  # [3, I, O]
        flat[f"{prefix}.{c}.weight"] = k.transpose(2, 1, 0)[:, :, :, None, None]
        flat[f"{prefix}.{c}.bias"] = np.asarray(p[c]["bias"])
    if "shortcut" in p:
        k = np.asarray(p["shortcut"]["kernel"])  # [I, O]
        flat[f"{prefix}.conv_shortcut.weight"] = k.T[:, :, None, None, None]
        flat[f"{prefix}.conv_shortcut.bias"] = np.asarray(p["shortcut"]["bias"])
    if "time_emb" in p:
        inv_lin(flat, f"{prefix}.time_emb_proj", p["time_emb"])


def inv_tlayer(flat, prefix, p):
    for n in ("norm1", "norm2", "norm3"):
        inv_norm(flat, f"{prefix}.{n}", p[n])
    for a in ("attn1", "attn2"):
        for q in ("to_q", "to_k", "to_v"):
            inv_lin(flat, f"{prefix}.{a}.{q}", p[a][q])
        inv_lin(flat, f"{prefix}.{a}.to_out.0", p[a]["to_out"])
    inv_lin(flat, f"{prefix}.ff.net.0.proj", p["ff_geglu"]["proj"])
    inv_lin(flat, f"{prefix}.ff.net.2", p["ff_out"])


def inv_sblock(flat, prefix, p):
    inv_norm(flat, f"{prefix}.norm", p["norm"])
    inv_lin(flat, f"{prefix}.proj_in", p["proj_in"])
    inv_lin(flat, f"{prefix}.proj_out", p["proj_out"])
    inv_tlayer(flat, f"{prefix}.transformer_blocks.0", p["block"])


def inv_st_resnet(flat, prefix, p):
    inv_resnet(flat, f"{prefix}.spatial_res_block", p["spatial"])
    inv_temporal_resnet(flat, f"{prefix}.temporal_res_block", p["temporal"])
    flat[f"{prefix}.time_mixer.mix_factor"] = np.asarray(
        p["mix"]["mix_factor"]
    ).reshape(1)


def inv_st_transformer(flat, prefix, p, extras=True):
    inv_norm(flat, f"{prefix}.norm", p["norm"])
    inv_lin(flat, f"{prefix}.proj_in", p["proj_in"])
    inv_lin(flat, f"{prefix}.proj_out", p["proj_out"])
    inv_tlayer(flat, f"{prefix}.transformer_blocks.0", p["spatial"])
    inv_tlayer(flat, f"{prefix}.temporal_transformer_blocks.0", p["temporal"])
    flat[f"{prefix}.time_mixer.mix_factor"] = np.asarray(
        p["mix"]["mix_factor"]
    ).reshape(1)
    if extras:  # diffusers-only sublayers the converter must IGNORE
        c = np.asarray(p["proj_in"]["kernel"]).shape[0]
        flat[f"{prefix}.temporal_transformer_blocks.0.norm_in.weight"] = (
            np.ones(c, np.float32))
        flat[f"{prefix}.temporal_transformer_blocks.0.norm_in.bias"] = (
            np.zeros(c, np.float32))
        flat[f"{prefix}.time_pos_embed.linear_1.weight"] = (
            np.zeros((c, c), np.float32))


def make_unet_st_state(cfg, seed=0):
    model = UNetSpatioTemporal(cfg)
    init = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 2, 8, 8, cfg.in_channels), jnp.float32),
        jnp.asarray(0.0),
        jnp.zeros((1, 1, cfg.cross_attention_dim), jnp.float32),
    )["params"]
    flat: dict = {}
    inv_conv(flat, "conv_in", init["conv_in"])
    inv_lin(flat, "time_embedding.linear_1", init["time_fc1"])
    inv_lin(flat, "time_embedding.linear_2", init["time_fc2"])
    inv_norm(flat, "conv_norm_out", init["norm_out"])
    inv_conv(flat, "conv_out", init["conv_out"])
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            inv_st_resnet(flat, f"down_blocks.{i}.resnets.{j}",
                          init[f"down{i}_res{j}"])
            if cfg.with_attn[i]:
                inv_st_transformer(flat, f"down_blocks.{i}.attentions.{j}",
                                   init[f"down{i}_attn{j}"])
        if f"down{i}_downsample" in init:
            inv_conv(flat, f"down_blocks.{i}.downsamplers.0.conv",
                     init[f"down{i}_downsample"])
    inv_st_resnet(flat, "mid_block.resnets.0", init["mid_res1"])
    inv_st_resnet(flat, "mid_block.resnets.1", init["mid_res2"])
    inv_st_transformer(flat, "mid_block.attentions.0", init["mid_attn"])
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            inv_st_resnet(flat, f"up_blocks.{i}.resnets.{j}",
                          init[f"up{i}_res{j}"])
            bi = n - 1 - i
            if cfg.with_attn[bi]:
                inv_st_transformer(flat, f"up_blocks.{i}.attentions.{j}",
                                   init[f"up{i}_attn{j}"])
        if f"up{i}_upsample" in init:
            inv_conv(flat, f"up_blocks.{i}.upsamplers.0.conv",
                     init[f"up{i}_upsample"])
    # model-level extras SVD checkpoints carry that our design drops
    flat["add_embedding.linear_1.weight"] = np.zeros((4, 4), np.float32)
    flat["add_embedding.linear_1.bias"] = np.zeros(4, np.float32)
    return flat, init


def make_unet2d_state(cfg, seed=0):
    model = UNet2DCondition(cfg)
    init = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32),
        jnp.asarray(1.0),
        jnp.zeros((1, 7, cfg.cross_attention_dim), jnp.float32),
    )["params"]
    flat: dict = {}
    inv_conv(flat, "conv_in", init["conv_in"])
    inv_lin(flat, "time_embedding.linear_1", init["time_fc1"])
    inv_lin(flat, "time_embedding.linear_2", init["time_fc2"])
    inv_norm(flat, "conv_norm_out", init["norm_out"])
    inv_conv(flat, "conv_out", init["conv_out"])
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            inv_resnet(flat, f"down_blocks.{i}.resnets.{j}",
                       init[f"down{i}_res{j}"])
            if cfg.with_attn[i]:
                inv_sblock(flat, f"down_blocks.{i}.attentions.{j}",
                           init[f"down{i}_attn{j}"])
        if f"down{i}_downsample" in init:
            inv_conv(flat, f"down_blocks.{i}.downsamplers.0.conv",
                     init[f"down{i}_downsample"])
    inv_resnet(flat, "mid_block.resnets.0", init["mid_res1"])
    inv_resnet(flat, "mid_block.resnets.1", init["mid_res2"])
    inv_sblock(flat, "mid_block.attentions.0", init["mid_attn"])
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            inv_resnet(flat, f"up_blocks.{i}.resnets.{j}",
                       init[f"up{i}_res{j}"])
            bi = n - 1 - i
            if cfg.with_attn[bi]:
                inv_sblock(flat, f"up_blocks.{i}.attentions.{j}",
                           init[f"up{i}_attn{j}"])
        if f"up{i}_upsample" in init:
            inv_conv(flat, f"up_blocks.{i}.upsamplers.0.conv",
                     init[f"up{i}_upsample"])
    return flat, init


def make_vae_state(cfg, seed=0):
    model = AutoencoderKL(cfg)
    init = model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 16, 16, 3), jnp.float32))["params"]
    flat: dict = {}
    n = len(cfg.block_out_channels)
    enc, dec = init["encoder"], init["decoder"]
    inv_conv(flat, "encoder.conv_in", enc["conv_in"])
    for i in range(n):
        for j in range(cfg.layers_per_block):
            inv_resnet(flat, f"encoder.down_blocks.{i}.resnets.{j}",
                       enc[f"down{i}_res{j}"])
        if f"down{i}_downsample" in enc:
            inv_conv(flat, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                     enc[f"down{i}_downsample"])
    inv_resnet(flat, "encoder.mid_block.resnets.0", enc["mid_res1"])
    inv_resnet(flat, "encoder.mid_block.resnets.1", enc["mid_res2"])

    def inv_vattn(prefix, p):
        inv_norm(flat, f"{prefix}.group_norm", p["norm"])
        for ours, theirs in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                             ("proj", "to_out.0")):
            inv_lin(flat, f"{prefix}.{theirs}", p[ours])

    inv_vattn("encoder.mid_block.attentions.0", enc["mid_attn"])
    inv_norm(flat, "encoder.conv_norm_out", enc["norm_out"])
    inv_conv(flat, "encoder.conv_out", enc["conv_out"])
    inv_conv(flat, "decoder.conv_in", dec["conv_in"])
    inv_resnet(flat, "decoder.mid_block.resnets.0", dec["mid_res1"])
    inv_resnet(flat, "decoder.mid_block.resnets.1", dec["mid_res2"])
    inv_vattn("decoder.mid_block.attentions.0", dec["mid_attn"])
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            inv_resnet(flat, f"decoder.up_blocks.{i}.resnets.{j}",
                       dec[f"up{i}_res{j}"])
        if f"up{i}_upsample" in dec:
            inv_conv(flat, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                     dec[f"up{i}_upsample"])
    inv_norm(flat, "decoder.conv_norm_out", dec["norm_out"])
    inv_conv(flat, "decoder.conv_out", dec["conv_out"])
    return flat, init


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_convert_unet_st_congruent_and_runs():
    flat, init = make_unet_st_state(UNET_ST_TINY)
    conv = convert_unet_st(flat, UNET_ST_TINY)
    assert_congruent(conv, init)
    model = UNetSpatioTemporal(UNET_ST_TINY)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, conv)},
        jnp.zeros((1, 2, 8, 8, UNET_ST_TINY.in_channels)),
        jnp.asarray(0.0),
        jnp.zeros((1, 1, UNET_ST_TINY.cross_attention_dim)),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_convert_unet2d_congruent():
    flat, init = make_unet2d_state(UNET2D_TINY)
    conv = convert_unet2d(flat, UNET2D_TINY)
    assert_congruent(conv, init)


def test_convert_vae_congruent():
    flat, init = make_vae_state(VAE_TINY)
    conv = convert_vae(flat, VAE_TINY.layers_per_block,
                       len(VAE_TINY.block_out_channels))
    assert_congruent(conv, init)


def test_clip_vision_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFConfig(
        hidden_size=CLIP_TINY.hidden_size,
        intermediate_size=CLIP_TINY.hidden_size * 4,
        num_hidden_layers=CLIP_TINY.num_layers,
        num_attention_heads=CLIP_TINY.num_heads,
        image_size=CLIP_TINY.image_size,
        patch_size=CLIP_TINY.patch_size,
        projection_dim=CLIP_TINY.projection_dim,
        hidden_act="gelu",  # laion ViT-H uses plain gelu
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(state, CLIP_TINY)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(
        (2, CLIP_TINY.image_size, CLIP_TINY.image_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    ours = np.asarray(
        CLIPVisionEncoder(CLIP_TINY).apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def _write_component(d, name, flat, cfg_json):
    from safetensors.numpy import save_file

    sub = d / name
    sub.mkdir(parents=True)
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()},
              str(sub / "diffusion_pytorch_model.safetensors"))
    (sub / "config.json").write_text(json.dumps(cfg_json))


def test_load_marigold_dir(tmp_path):
    uflat, _ = make_unet2d_state(UNET2D_TINY)
    vflat, _ = make_vae_state(VAE_TINY)
    _write_component(tmp_path, "unet", uflat, {
        "block_out_channels": list(UNET2D_TINY.block_out_channels),
        "layers_per_block": UNET2D_TINY.layers_per_block,
        "cross_attention_dim": UNET2D_TINY.cross_attention_dim,
        "attention_head_dim": list(UNET2D_TINY.attention_head_dim),
        "in_channels": UNET2D_TINY.in_channels,
        "out_channels": UNET2D_TINY.out_channels,
        "norm_groups": UNET2D_TINY.norm_groups,
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
    })
    _write_component(tmp_path, "vae", vflat, {
        "block_out_channels": list(VAE_TINY.block_out_channels),
        "layers_per_block": VAE_TINY.layers_per_block,
        "latent_channels": VAE_TINY.latent_channels,
        "norm_groups": VAE_TINY.norm_groups,
    })
    np.save(tmp_path / "empty_text_embed.npy",
            np.zeros((1, 7, UNET2D_TINY.cross_attention_dim), np.float32))

    from visiondepth3d_tpu.depth.diffusion import load_marigold

    pipe = load_marigold(str(tmp_path), steps=1)
    out = np.asarray(pipe(np.full((1, 16, 16, 3), 0.5, np.float32)))
    assert out.shape == (1, 16, 16)
    assert np.isfinite(out).all()


def test_load_depthcrafter_dir(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    uflat, _ = make_unet_st_state(UNET_ST_TINY)
    vflat, _ = make_vae_state(VAE_TINY)
    # flat reference layout: unet safetensors + unet_config.json at root
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in uflat.items()},
              str(tmp_path / "diffusion_pytorch_model.safetensors"))
    (tmp_path / "unet_config.json").write_text(json.dumps({
        "block_out_channels": list(UNET_ST_TINY.block_out_channels),
        "layers_per_block": UNET_ST_TINY.layers_per_block,
        "cross_attention_dim": UNET_ST_TINY.cross_attention_dim,
        "attention_head_dim": list(UNET_ST_TINY.attention_head_dim),
        "in_channels": UNET_ST_TINY.in_channels,
        "out_channels": UNET_ST_TINY.out_channels,
        "norm_groups": UNET_ST_TINY.norm_groups,
        "down_block_types": ["CrossAttnDownBlockSpatioTemporal",
                             "DownBlockSpatioTemporal"],
    }))
    _write_component(tmp_path, "vae", vflat, {
        "block_out_channels": list(VAE_TINY.block_out_channels),
        "layers_per_block": VAE_TINY.layers_per_block,
        "latent_channels": VAE_TINY.latent_channels,
        "norm_groups": VAE_TINY.norm_groups,
    })
    torch.manual_seed(0)
    clip_tiny = HFConfig(
        hidden_size=CLIP_TINY.hidden_size,
        intermediate_size=CLIP_TINY.hidden_size * 4,
        num_hidden_layers=CLIP_TINY.num_layers,
        num_attention_heads=CLIP_TINY.num_heads,
        image_size=CLIP_TINY.image_size,
        patch_size=CLIP_TINY.patch_size,
        projection_dim=UNET_ST_TINY.cross_attention_dim,
        hidden_act="gelu",
    )
    hf = CLIPVisionModelWithProjection(clip_tiny).eval()
    ce = tmp_path / "image_encoder"
    ce.mkdir()
    save_file({k: np.ascontiguousarray(v.numpy())
               for k, v in hf.state_dict().items()},
              str(ce / "model.safetensors"))
    (ce / "config.json").write_text(json.dumps({
        "hidden_size": CLIP_TINY.hidden_size,
        "num_hidden_layers": CLIP_TINY.num_layers,
        "num_attention_heads": CLIP_TINY.num_heads,
        "patch_size": CLIP_TINY.patch_size,
        "image_size": CLIP_TINY.image_size,
        "projection_dim": UNET_ST_TINY.cross_attention_dim,
    }))

    from visiondepth3d_tpu.depth.diffusion import load_depthcrafter

    pipe = load_depthcrafter(str(tmp_path), steps=1, window=4, overlap=2)
    frames = np.full((6, 16, 16, 3), 0.5, np.float32)
    out = pipe(frames)
    assert out.shape == (6, 16, 16)
    assert np.isfinite(out).all()
