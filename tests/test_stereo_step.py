"""End-to-end stereo step: jit-compilability, scan consistency, blank
handling, parity quantization, output packing."""

import numpy as np
import jax
import jax.numpy as jnp

from visiondepth3d_tpu.ops import format_3d_output, pack_per_eye
from visiondepth3d_tpu.state import init_trackers
from visiondepth3d_tpu.stereo import StereoParams, render_chunk, stereo_frame_step


def _clip(rng, t=4, h=64, w=96):
    frames = rng.random((t, h, w, 3), dtype=np.float32)
    depths = rng.random((t, h, w), dtype=np.float32)
    return jnp.asarray(frames), jnp.asarray(depths)


def test_step_shapes_and_jit(rng):
    frames, depths = _clip(rng)
    p = StereoParams()
    t = init_trackers(64, 96)
    step = jax.jit(stereo_frame_step)
    t, out = step(p, t, frames[0], depths[0])
    assert out.left.shape == (64, 96, 3)
    assert out.right.shape == (64, 96, 3)
    assert out.shift_map.shape == (64, 96)
    assert np.all(np.asarray(out.left) >= 0) and np.all(np.asarray(out.left) <= 1)


def test_scan_matches_frame_loop(rng):
    frames, depths = _clip(rng, t=5)
    p = StereoParams()
    t0 = init_trackers(64, 96)

    t_scan, outs = jax.jit(render_chunk)(p, t0, frames, depths)

    t_loop = t0
    for i in range(5):
        t_loop, out_i = stereo_frame_step(p, t_loop, frames[i], depths[i])
        np.testing.assert_allclose(
            np.asarray(outs.left[i]), np.asarray(out_i.left), atol=5e-5
        )
    np.testing.assert_allclose(
        np.asarray(t_scan.fw_offset), np.asarray(t_loop.fw_offset), atol=1e-5
    )


def test_blank_frame_passthrough(rng):
    from visiondepth3d_tpu.ops import sharpen

    frames, depths = _clip(rng, t=3)
    # no floating window -> no side masks; blank output is sharpen(source)
    # exactly (the reference sharpens blank frames too, render_3d.py:1406)
    p = StereoParams(enable_floating_window=False)
    t0 = init_trackers(64, 96)
    blanks = jnp.asarray([False, True, False])
    _, outs = jax.jit(render_chunk)(p, t0, frames, depths, blanks)
    expected = np.asarray(sharpen(frames[1], p.sharpness_factor))
    np.testing.assert_allclose(np.asarray(outs.left[1]), expected, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outs.left[1]), np.asarray(outs.right[1]), atol=1e-7
    )
    # non-blank frames must actually be warped/graded (different from source)
    assert np.abs(np.asarray(outs.left[0]) - np.asarray(frames[0])).max() > 1e-3


def test_parity_quantize_mode_runs(rng):
    frames, depths = _clip(rng, t=2)
    p = StereoParams(parity_quantize=True)
    t0 = init_trackers(64, 96)
    _, outs = jax.jit(render_chunk)(p, t0, frames, depths)
    # quantized outputs then sharpened: still in range
    assert np.all(np.asarray(outs.left) >= 0) and np.all(np.asarray(outs.left) <= 1)


def test_dof_enabled_path(rng):
    frames, depths = _clip(rng, t=2)
    p = StereoParams(dof_strength=2.0)
    t0 = init_trackers(64, 96)
    _, outs = jax.jit(render_chunk)(p, t0, frames, depths)
    assert outs.left.shape == (2, 64, 96, 3)


def test_feature_flag_combinations_compile(rng):
    frames, depths = _clip(rng, t=1)
    t0 = init_trackers(64, 96)
    for kwargs in [
        dict(use_subject_tracking=False),
        dict(enable_floating_window=False),
        dict(enable_edge_masking=False),
        dict(enable_feathering=False),
        dict(enable_healing=True),
        dict(enable_dynamic_parallax=False),
        dict(quantile_mode="exact"),
    ]:
        p = StereoParams(**kwargs)
        _, outs = jax.jit(render_chunk)(p, t0, frames, depths)
        arr = np.asarray(outs.left)
        assert np.isfinite(arr).all()


def test_format_packing(rng):
    left = jnp.asarray(rng.random((64, 96, 3), dtype=np.float32))
    right = jnp.asarray(rng.random((64, 96, 3), dtype=np.float32))
    assert format_3d_output(left, right, "Full-SBS").shape == (64, 192, 3)
    assert format_3d_output(left, right, "Half-SBS").shape == (64, 192, 3)
    assert format_3d_output(left, right, "VR").shape == (1600, 2880, 3)
    assert format_3d_output(left, right, "Red-Cyan Anaglyph").shape == (64, 96, 3)
    assert format_3d_output(left, right, "Passive Interlaced").shape == (64, 96, 3)
    l2, r2 = pack_per_eye(left, right, "Half-SBS", 48, 64)
    assert l2.shape == (64, 48, 3) and r2.shape == (64, 48, 3)
    l3, r3 = pack_per_eye(left, right, "Full-SBS", 128, 64)
    assert l3.shape == (64, 128, 3)


def test_bf16_image_mode_close_to_f32():
    """image_dtype="bfloat16" is an opt-in perf mode: depth statistics stay
    f32 and the packed u8 output stays within a few steps of the f32 render
    almost everywhere (worst case sits on feather/heal mask thresholds)."""
    import numpy as np
    import jax.numpy as jnp
    from visiondepth3d_tpu.state import init_trackers
    from visiondepth3d_tpu.stereo import StereoParams
    from visiondepth3d_tpu.stereo.step import render_chunk

    H, W, T = 64, 128, 3
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.random((T, H, W, 3)), jnp.float32)
    xx = np.broadcast_to(np.linspace(0.1, 0.9, W, dtype=np.float32), (H, W))
    depths = jnp.asarray(np.broadcast_to(xx, (T, H, W)).copy())

    base = StereoParams(enable_healing=True).with_shift_bound(W).replace(
        warp_backend="xla"
    )
    _, o32 = render_chunk(base, init_trackers(H, W), frames, depths)
    _, o16 = render_chunk(
        base.replace(image_dtype="bfloat16"), init_trackers(H, W), frames, depths
    )
    u32 = np.clip(np.asarray(o32.left, np.float32) * 255 + 0.5, 0, 255).astype(int)
    u16 = np.clip(np.asarray(o16.left, np.float32) * 255 + 0.5, 0, 255).astype(int)
    diff = np.abs(u32 - u16)
    assert diff.mean() < 1.0
    assert (diff > 2).mean() < 0.02
