"""Merged frame-tools pipeline: upscale + interpolate + encode.

The reference's FrameTools flow (start_merged_pipeline,
merged_pipeline.py:287-387): frames -> Real-ESRGAN upscale (optional
pre-downscale, tiling, blend modes) -> RIFE in-betweens -> FFmpeg writer at
fps x multiplier. Here both models live in ONE jitted graph per chunk, and
spatial tiling generalizes to the Hann-blended tiler (ops/tiling.py).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..io.video import open_video, open_writer
from ..ops.resize import resize_area, resize_bilinear
from .esrgan import RRDBNet, blend_images
from .rife import IFNet


@dataclasses.dataclass
class EnhanceConfig:
    use_esrgan: bool = True
    esrgan_scale: int = 4
    esrgan_nf: int = 64
    esrgan_nb: int = 23
    esrgan_gc: int = 32
    esrgan_n_up: int = 2  # nearest-up2 conv stages in the tail
    esrgan_unshuffle: bool = True  # Real-ESRGAN input pixel-unshuffle style
    pre_downscale: float = 1.0  # 0.25..1.0 input shrink before upscale
    keep_original_size: bool = True  # reference resizes back to source size
    blend_mode: str = "OFF"  # OFF/LOW/MEDIUM/HIGH
    use_rife: bool = True
    fps_multiplier: int = 2
    rife_scales: tuple = (4, 2, 1)
    codec: str = "libx264"
    chunk_size: int = 4
    # Real renders need converted checkpoints (convert_rrdbnet /
    # convert_rife); random weights produce garbage output, so they must be
    # opted into explicitly (tests, shape checks, benchmarks).
    allow_random_weights: bool = False
    # "bfloat16": run the RRDBNet/IFNet conv stacks in bf16 (params cast in
    # the graph, u8 output contract unchanged) — the u8 source means bf16
    # costs <1 u8 step while the MXU convs double their throughput
    dtype: str = "float32"


# Above this many trunk pixels per chunk the monolithic x4 tail exceeds
# HBM (32.7 GB measured at 1080p x4, benchmarks/esrgan_split.py).
_STAGE_THRESHOLD_PX = 1 << 21


def _tile_len(size: int) -> int | None:
    """A divisor of ``size`` usable as a staged-tail tile edge (leaves
    room for the 2-px halo), preferring ~480; None when size has no
    usable divisor (prime-ish dims — staged tiling needs even cover)."""
    cands = [d for d in range(16, size // 2 + 1)
             if size % d == 0 and d + 4 <= size]
    if not cands:
        return None
    return min(cands, key=lambda d: abs(d - 480))


def _apply_esrgan(cfg: EnhanceConfig, esrgan, params, x):
    """Monolithic apply for small frames; staged (trunk whole-frame, x4
    tail tiled — enhance/esrgan.py:apply_rrdbnet_staged, exact parity)
    when the upscale tail's activations would not fit HBM."""
    t, h, w = x.shape[0], x.shape[1], x.shape[2]
    # trunk resolution divisor: input unshuffle factor (1 for KAIR style)
    unshuffle = (4 // cfg.esrgan_scale) if cfg.esrgan_unshuffle else 1
    th, tw = h // unshuffle, w // unshuffle
    tile_h, tile_w = _tile_len(th), _tile_len(tw)
    if (t * th * tw <= _STAGE_THRESHOLD_PX or tile_h is None
            or tile_w is None or cfg.esrgan_n_up != 2):
        return esrgan.apply({"params": params}, x)
    from .esrgan import apply_rrdbnet_staged

    return apply_rrdbnet_staged(esrgan, params, x,
                                tail_tile_hw=(tile_h, tile_w))


def make_enhance_fn(cfg: EnhanceConfig, esrgan_params, rife_params,
                    in_hw: tuple[int, int], mesh=None):
    """Build the jitted chunk function: [T, H, W, 3] u8 -> [T', H', W', 3] u8.

    With ``mesh`` (axes containing "dp"), the chunk's frame axis is sharded
    over the dp devices — ESRGAN is frame-independent and RIFE's pair
    slices (x[:-1], x[1:]) cost one boundary-frame collective-permute, so
    GSPMD partitions the whole graph with no other communication. The
    reference has no multi-GPU analog (SURVEY.md §2.8); this generalizes
    its prefetch-queue concurrency (merged_pipeline.py:85-104) to devices.
    """
    esrgan = RRDBNet(cfg.esrgan_nf, cfg.esrgan_nb, cfg.esrgan_gc,
                     scale=cfg.esrgan_scale, n_up=cfg.esrgan_n_up,
                     unshuffle=cfg.esrgan_unshuffle)
    # load_rife_weights returns (params, IFNetConfig) — the config carries
    # the checkpoint's true geometry (variant-detected scales/res blocks)
    # and overrides cfg.rife_scales
    if isinstance(rife_params, tuple):
        rife_params, rife_cfg = rife_params
        rife = rife_cfg.build()
    else:
        rife = IFNet(scales=cfg.rife_scales)
    h, w = in_hw
    # device-resident once: closed-over host params would re-transfer on
    # every chunk call (see DepthPredictor.__post_init__)
    esrgan_params = jax.device_put(esrgan_params)
    rife_params = jax.device_put(rife_params)

    cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    @jax.jit
    def fn(frames_u8):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            frames_u8 = jax.lax.with_sharding_constraint(
                frames_u8, NamedSharding(mesh, P("dp")))
            # keep the partitionable XLA conv everywhere in this trace:
            # the Pallas conv kernel is device-local (no GSPMD rule)
            from ..ops import pallas_conv

            prev_force, pallas_conv.FORCE_XLA = pallas_conv.FORCE_XLA, True
        try:
            return _enhance_body(frames_u8)
        finally:
            if mesh is not None:
                pallas_conv.FORCE_XLA = prev_force

    def _enhance_body(frames_u8):
        if cfg.dtype == "bfloat16":
            ep_c = jax.tree.map(lambda p: p.astype(cdt), esrgan_params)
            rp_c = jax.tree.map(lambda p: p.astype(cdt), rife_params)
        else:
            ep_c, rp_c = esrgan_params, rife_params
        x = frames_u8.astype(cdt) / jnp.asarray(255.0, cdt)
        if cfg.use_esrgan:
            if cfg.pre_downscale < 1.0:
                dh, dw = int(h * cfg.pre_downscale), int(w * cfg.pre_downscale)
                x_in = resize_area(x, (dh, dw))
            else:
                x_in = x
            up = _apply_esrgan(cfg, esrgan, ep_c, x_in)
            up = jnp.clip(up, 0.0, 1.0)
            if cfg.keep_original_size:
                up = resize_area(up, (h, w))
                base = x
            else:
                base = resize_bilinear(x, up.shape[1:3])
            x = jnp.clip(blend_images(base, up, cfg.blend_mode), 0.0, 1.0)

        if cfg.use_rife and cfg.fps_multiplier > 1:
            img0, img1 = x[:-1], x[1:]
            frames_out = [x[:-1]]
            for k in range(1, cfg.fps_multiplier):
                mid = rife.apply(
                    {"params": rp_c}, img0, img1, k / cfg.fps_multiplier
                )
                frames_out.append(mid)
            # interleave: [T-1, mult, H, W, 3] -> [(T-1)*mult, ...] then append
            # the final original frame
            stacked = jnp.stack(frames_out, axis=1)
            t1 = stacked.reshape((-1,) + x.shape[1:])
            x = jnp.concatenate([t1, x[-1:]], axis=0)

        x = x.astype(jnp.float32)
        return jnp.clip(x * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

    return fn


def init_enhance_params(cfg: EnhanceConfig, in_hw=(64, 64), seed=0):
    """Random-init both models (until converted checkpoints are supplied)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    esrgan = RRDBNet(cfg.esrgan_nf, cfg.esrgan_nb, cfg.esrgan_gc,
                     scale=cfg.esrgan_scale, n_up=cfg.esrgan_n_up,
                     unshuffle=cfg.esrgan_unshuffle)
    ep = esrgan.init(k1, jnp.zeros((1, 16, 16, 3)))["params"] if cfg.use_esrgan else {}
    rife = IFNet(scales=cfg.rife_scales)
    rp = (
        rife.init(k2, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))["params"]
        if cfg.use_rife
        else {}
    )
    return ep, rp


def run_merged_pipeline(
    input_path,
    output_path,
    cfg: EnhanceConfig | None = None,
    esrgan_params=None,
    rife_params=None,
    progress_cb: Callable | None = None,
    mesh_axes: dict[str, int] | None = None,
    cancel_check: Callable | None = None,
) -> int:
    """Video -> enhanced video. Overlapping chunks keep RIFE pair context:
    each chunk shares its first frame with the previous chunk's last.

    ``cancel_check`` is polled between chunks (the reference's
    cancel-safe flush, merged_pipeline.py:287-387): True stops cleanly
    with the frames written so far.

    ``mesh_axes={"dp": N}`` shards each chunk's frame axis over N devices
    (`vd3d tools --mesh dp=N`); output is bit-identical to single-device
    (frames are computed by the same program, just on different chips).
    Pick chunk_size + 1 >= dp, ideally a multiple, for even utilization.
    """
    cfg = cfg or EnhanceConfig()
    missing = (cfg.use_esrgan and esrgan_params is None) or (
        cfg.use_rife and rife_params is None
    )
    if missing and not cfg.allow_random_weights:
        raise ValueError(
            "enhance models need converted checkpoints (convert_rrdbnet / "
            "convert_rife); pass allow_random_weights=True only for "
            "shape/compile testing — random weights produce garbage frames"
        )
    rd = open_video(input_path)
    if esrgan_params is None or rife_params is None:
        ep, rp = init_enhance_params(cfg)
        esrgan_params = esrgan_params or ep
        rife_params = rife_params or rp
    mesh = None
    if mesh_axes and int(mesh_axes.get("dp", 1)) > 1:
        from ..parallel.mesh import make_mesh

        dp = int(mesh_axes["dp"])
        if dp > len(jax.devices()):
            raise ValueError(
                f"mesh dp={dp} needs {dp} devices, have {len(jax.devices())}")
        mesh = make_mesh(dp=dp, sp=1, tp=1, devices=jax.devices()[:dp])
    fn = make_enhance_fn(cfg, esrgan_params, rife_params,
                         (rd.height, rd.width), mesh=mesh)

    out_fps = rd.fps * (cfg.fps_multiplier if cfg.use_rife else 1)
    # Output geometry must match what the jitted fn emits: with
    # keep_original_size=False the ESRGAN branch produces
    # int(dim * pre_downscale) * scale frames (reference resizes back to
    # source size only when asked, merged_pipeline.py:240-267).
    if cfg.use_esrgan and not cfg.keep_original_size:
        out_w = int(rd.width * cfg.pre_downscale) * cfg.esrgan_scale
        out_h = int(rd.height * cfg.pre_downscale) * cfg.esrgan_scale
    else:
        out_w, out_h = rd.width, rd.height
    wr = open_writer(output_path, out_w, out_h, out_fps, cfg.codec)

    n_out = 0
    t0 = time.time()
    carry = None  # last source frame of the previous chunk (pair context)
    tail = None  # its enhanced version, written at EOF
    mult = cfg.fps_multiplier if cfg.use_rife else 1
    try:
        eof = False
        while not eof:
            if cancel_check and cancel_check():
                break  # chunk-boundary cancel poll
            batch = [] if carry is None else [carry]
            while len(batch) < cfg.chunk_size + 1:
                f = rd.read()
                if f is None:
                    eof = True
                    break
                batch.append(f)
            if len(batch) < 2:
                break
            n_in = len(batch)
            while len(batch) < cfg.chunk_size + 1:
                batch.append(batch[-1])
            out = np.asarray(fn(jnp.asarray(np.stack(batch))))
            valid = (n_in - 1) * mult  # the duplicated final frame is
            # re-emitted as the next chunk's first
            for i in range(valid):
                wr.write(out[i])
            n_out += valid
            carry = batch[n_in - 1]
            tail = out[valid] if valid < len(out) else out[-1]
            if progress_cb:
                progress_cb(n_out, n_out / max(time.time() - t0, 1e-6))
        if tail is not None:
            wr.write(tail)
            n_out += 1
    finally:
        rd.close()
        wr.close()
    return n_out
