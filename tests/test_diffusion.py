"""Diffusion depth stack: schedulers (closed-form checks), VAE/UNet shapes,
Marigold + DepthCrafter tiny pipelines end-to-end (random weights)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from visiondepth3d_tpu.depth.diffusion import (
    DDIMSchedule,
    EulerSchedule,
    UNET2D_TINY,
    UNET_ST_TINY,
    UNet2DCondition,
    UNetSpatioTemporal,
    VAE_TINY,
    AutoencoderKL,
    svd_precondition,
    tiny_depthcrafter,
    tiny_marigold,
)


def test_ddim_timesteps_and_perfect_model():
    sch = DDIMSchedule(num_inference_steps=4, prediction_type="epsilon")
    assert len(sch.timesteps) == 4
    assert sch.timesteps[0] == 999
    # if the model predicts the exact noise, DDIM must recover x0 at the end
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    t0 = int(sch.timesteps[0])
    sample = sch.add_noise(x0, noise, t0)
    for i, t in enumerate(sch.timesteps):
        a_t = sch.alpha_bar(int(t))
        # reconstruct the exact epsilon for the current sample
        eps = (sample - (a_t**0.5) * x0) / ((1 - a_t) ** 0.5)
        sample = sch.step(eps, i, sample)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_euler_perfect_denoiser_converges():
    sch = EulerSchedule(num_inference_steps=3)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, 2, 4, 4, 4), dtype=np.float32))
    noise = jnp.asarray(rng.standard_normal(x0.shape).astype(np.float32))
    sample = noise * float(sch.sigmas[0])
    for i in range(3):
        # a perfect denoiser returns x0 at every step
        sample = sch.step(x0, i, sample)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)


def test_svd_preconditioning_identities():
    for sigma in (0.1, 1.0, 10.0):
        c_skip, c_out, c_in = svd_precondition(sigma)
        assert abs(c_skip - 1 / (sigma**2 + 1)) < 1e-12
        assert c_in > 0 and c_out < 0


def test_vae_roundtrip_shapes(rng):
    vae = AutoencoderKL(VAE_TINY)
    x = jnp.asarray(rng.random((1, 32, 48, 3), dtype=np.float32))
    params = vae.init(jax.random.PRNGKey(0), x)["params"]
    z = vae.apply({"params": params}, x, method=AutoencoderKL.encode_mode)
    assert z.shape == (1, 16, 24, 4)  # stride 2 for the 2-block tiny config
    y = vae.apply({"params": params}, z, method=AutoencoderKL.decode)
    assert y.shape == x.shape


def test_unet2d_shapes(rng):
    unet = UNet2DCondition(UNET2D_TINY)
    x = jnp.asarray(rng.random((2, 16, 16, 8), dtype=np.float32))
    ctx = jnp.asarray(rng.random((2, 7, UNET2D_TINY.cross_attention_dim),
                                 dtype=np.float32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.asarray(10.0), ctx)["params"]
    out = unet.apply({"params": params}, x, jnp.asarray(500.0), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_st_shapes_and_per_frame_timesteps(rng):
    unet = UNetSpatioTemporal(UNET_ST_TINY)
    x = jnp.asarray(rng.random((1, 3, 16, 16, 8), dtype=np.float32))
    ctx = jnp.asarray(rng.random((1, 1, UNET_ST_TINY.cross_attention_dim),
                                 dtype=np.float32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.asarray(0.0), ctx)["params"]
    out = unet.apply({"params": params}, x, jnp.asarray(1.5), ctx)
    assert out.shape == (1, 3, 16, 16, 4)
    # per-frame timesteps (core/unet.py custom forward parity)
    ts = jnp.asarray([[0.5, 1.0, 2.0]])
    out2 = unet.apply({"params": params}, x, ts, ctx)
    assert out2.shape == out.shape
    assert np.abs(np.asarray(out2 - out)).max() > 1e-6


def test_marigold_tiny_end_to_end(rng):
    pipe = tiny_marigold(steps=2)
    rgb = rng.random((1, 16, 16, 3), dtype=np.float32)
    depth = np.asarray(pipe(rgb))
    assert depth.shape == (1, 16, 16)
    assert depth.min() >= 0 and depth.max() <= 1
    # ensembling path
    pipe.ensemble_size = 3
    d3 = np.asarray(pipe(rgb))
    assert d3.shape == (1, 16, 16)


def test_depthcrafter_sliding_window(rng):
    pipe = tiny_depthcrafter(steps=2, window=4, overlap=2)
    frames = rng.random((10, 16, 16, 3), dtype=np.float32)
    depth = pipe(frames)
    assert depth.shape == (10, 16, 16)
    assert depth.min() >= 0.0 and depth.max() <= 1.0
    assert np.isfinite(depth).all()
    # windows: starts at 0, 2, 4, 6 (stride = window - overlap = 2)
    assert pipe._windows(10) == [0, 2, 4, 6]
    assert pipe._windows(4) == [0]
    assert pipe._windows(5) == [0, 1]


def test_depthcrafter_parallel_windows(rng):
    import jax
    from visiondepth3d_tpu.parallel import make_mesh

    pipe = tiny_depthcrafter(steps=2, window=4, overlap=2)
    frames = rng.random((10, 16, 16, 3), dtype=np.float32)  # 4 windows
    mesh = make_mesh(dp=4, sp=1, tp=2)
    with mesh:
        d_par = pipe.run_parallel(frames, mesh=mesh)
    assert d_par.shape == (10, 16, 16)
    assert np.isfinite(d_par).all()
    assert d_par.min() >= 0.0 and d_par.max() <= 1.0


def test_depthcrafter_parallel_seam_quality(rng):
    """The window-parallel mode replaces serial overlap re-seeding with
    shared per-frame noise (depthcrafter.py:denoise_windows_parallel). That
    changes semantics, so bound the damage: temporal jumps at window seams
    must stay comparable to the serial mode's on the same clip — no visible
    stitching discontinuity."""
    pipe = tiny_depthcrafter(steps=2, window=4, overlap=2)
    frames = rng.random((10, 16, 16, 3), dtype=np.float32)
    d_ser = pipe(frames)
    d_par = pipe.run_parallel(frames)

    def jumps(d):
        return np.abs(np.diff(d, axis=0)).mean(axis=(1, 2))  # [T-1]

    js, jp = jumps(d_ser), jumps(d_par)
    # window starts at 2, 4, 6 -> seam transitions are diffs 1-2, 3-4, 5-6;
    # conservatively take every diff index touching a window boundary
    seam_idx = [1, 2, 3, 4, 5, 6]
    assert jp[seam_idx].max() <= 2.0 * max(js.max(), 1e-3), (
        f"parallel seam jumps {jp[seam_idx]} vs serial max {js.max()}"
    )
    # and the parallel mode must not smooth everything into mush either
    assert jp.mean() >= 0.1 * js.mean()


def test_marigold_run_ensemble_matches_serial():
    """run_ensemble (batched members, one launch) must agree with the
    serial __call__ ensemble: same per-member noise -> same median."""
    import jax
    import jax.numpy as jnp

    from visiondepth3d_tpu.depth.diffusion.marigold import tiny_marigold

    pipe = tiny_marigold(steps=2)
    pipe.ensemble_size = 3
    rng = np.random.default_rng(7)
    rgb = rng.random((2, 16, 16, 3), dtype=np.float32)

    ens = np.asarray(pipe.run_ensemble(rgb, seed=5))
    assert ens.shape == (2, 16, 16)
    assert np.isfinite(ens).all()

    # serial reference with the SAME noise tensors
    stride = 2 ** (len(pipe.vae_cfg.block_out_channels) - 1)
    noise = jax.random.normal(
        jax.random.PRNGKey(5),
        (3, 2, 16 // stride, 16 // stride, pipe.vae_cfg.latent_channels),
        jnp.float32)
    outs = [np.asarray(pipe._run(pipe.unet_params, pipe.vae_params,
                                 jnp.asarray(rgb), noise[e]))
            for e in range(3)]
    ref = np.median(np.stack(outs), axis=0)
    np.testing.assert_allclose(ens, ref, atol=2e-5)


def _bf16_tree(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def test_unets_stay_bf16_end_to_end(rng):
    """bf16 params + bf16 inputs must produce a bf16 output.

    Regression: the f32 sinusoidal time embedding used to promote every
    resnet (and everything downstream) to f32, silently running the whole
    UNet at f32 MXU throughput (the reference runs the Marigold/DepthCrafter
    pipes fp16, render_depth.py:771, depth_crafter_ppl.py:175)."""
    unet = UNet2DCondition(UNET2D_TINY)
    x = jnp.asarray(rng.random((1, 16, 16, 8), dtype=np.float32))
    ctx = jnp.asarray(rng.random((1, 7, UNET2D_TINY.cross_attention_dim),
                                 dtype=np.float32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.asarray(10.0), ctx)["params"]
    out = unet.apply({"params": _bf16_tree(params)},
                     x.astype(jnp.bfloat16), jnp.asarray(500.0),
                     ctx.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16

    st = UNetSpatioTemporal(UNET_ST_TINY)
    xs = jnp.asarray(rng.random((1, 2, 16, 16, 8), dtype=np.float32))
    cs = jnp.asarray(rng.random((1, 1, UNET_ST_TINY.cross_attention_dim),
                                dtype=np.float32))
    sp = st.init(jax.random.PRNGKey(1), xs, jnp.asarray(0.0), cs)["params"]
    outs = st.apply({"params": _bf16_tree(sp)}, xs.astype(jnp.bfloat16),
                    jnp.asarray(1.5), cs.astype(jnp.bfloat16))
    assert outs.dtype == jnp.bfloat16


def test_bf16_pipelines_cast_inputs(rng):
    """bf16-weight pipelines must accept f32 host inputs and stay finite
    (the pipeline casts activations to the weight dtype internally)."""
    pipe = tiny_marigold(steps=2)
    pipe_bf16 = dataclasses.replace(
        pipe, unet_params=_bf16_tree(pipe.unet_params),
        vae_params=_bf16_tree(pipe.vae_params), ensemble_size=2)
    assert pipe_bf16.compute_dtype == jnp.bfloat16
    rgb = rng.random((1, 16, 16, 3), dtype=np.float32)
    d = np.asarray(pipe_bf16.run_ensemble(rgb, seed=1))
    assert d.shape == (1, 16, 16) and np.isfinite(d).all()

    dc = tiny_depthcrafter(steps=2, window=4, overlap=2)
    dc_bf16 = dataclasses.replace(
        dc, unet_params=_bf16_tree(dc.unet_params),
        vae_params=_bf16_tree(dc.vae_params),
        clip_params=_bf16_tree(dc.clip_params))
    assert dc_bf16.compute_dtype == jnp.bfloat16
    frames = rng.random((6, 16, 16, 3), dtype=np.float32)
    out = dc_bf16(frames)
    assert out.shape == (6, 16, 16) and np.isfinite(out).all()
    outp = dc_bf16.run_parallel(frames)
    assert outp.shape == (6, 16, 16) and np.isfinite(outp).all()


def test_depthcrafter_reference_degenerate_geometry(rng):
    """The reference GUI ships window 24 / overlap 25
    (render_depth.py:1788-1789) — a NEGATIVE stride its own pipeline
    cannot execute past one window (zero windows for 25..32-frame
    batches, unbounded loop beyond). Our pipeline must accept the config,
    clamp to a terminating stride, and cover every frame."""
    pipe = tiny_depthcrafter(steps=1, window=4, overlap=5)  # overlap>window
    assert pipe.overlap == 3  # clamped to window-1 (stride 1)
    frames = rng.random((7, 16, 16, 3), dtype="float32")
    d = pipe(frames)
    assert d.shape == (7, 16, 16)
    import numpy as np

    assert np.isfinite(d).all()
    # full coverage: every start in 0..3 plus the tail window
    assert pipe._windows(7) == [0, 1, 2, 3]

    # <=window batches: single window, reference-equivalent semantics
    d_short = pipe(rng.random((4, 16, 16, 3), dtype="float32"))
    assert d_short.shape == (4, 16, 16)
    assert pipe._windows(4) == [0]


def test_geglu_ff_is_sd_width():
    """SD transformer FF: GEGLU projects to 2*(4c) and gates to 4c
    (diffusers FeedForward mult=4, activation geglu). A narrower FF still
    RUNS with converted checkpoints (flax adopts the loaded kernel
    shapes) but silently changes the random-init architecture and every
    FLOP-identical benchmark claim — pin the init shapes."""
    import jax
    import jax.numpy as jnp

    from visiondepth3d_tpu.depth.diffusion.unet2d import TransformerBlock
    from visiondepth3d_tpu.depth.diffusion.unet_st import TransformerLayer

    c = 32
    p = TransformerBlock(2, 16).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, c)), jnp.zeros((1, 4, c))
    )["params"]
    assert p["ff_geglu"]["proj"]["kernel"].shape == (c, 8 * c)
    assert p["ff_out"]["kernel"].shape == (4 * c, c)

    pt = TransformerLayer(2, 16).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, c)), None)["params"]
    assert pt["ff_geglu"]["proj"]["kernel"].shape == (c, 8 * c)
    assert pt["ff_out"]["kernel"].shape == (4 * c, c)
