"""Multi-head attention dispatch: Pallas TPU flash kernel for long sequences.

Plain ``jax.nn.dot_product_attention`` materializes the [B, H, N, N] logits
in HBM (f32 after the softmax upcast). For the 518px ViT inference size the
sequence is 1370 tokens — ~45 MB of logits per head-batch per layer — and
the depth model becomes HBM-bound on attention traffic. The Pallas TPU
flash-attention kernel streams K/V tiles through VMEM and never materializes
the logits, which is the standard TPU-native answer (same role as the
reference's SDPA/xFormers path on CUDA, render_depth.py's torch backends).

Sequences are padded to the kernel's 512-token block multiple and masked via
``SegmentIds`` (pad tokens get segment 0, real tokens segment 1, so no
cross-attention between them); pad rows are sliced off the output.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# The Pallas flash kernel loses to the bf16-softmax path at the depth
# model's shape on v5e. B=8 (r1): default blocks 3592 us, tuned 1160 at
# N_pad=1536 vs bf16-softmax ~1040 at the true 1370. B=16 (r2): tuned
# flash (block_q=512, block_k=512) 2023 us unmasked at 1536, but with the
# pad + SegmentIds masking the production path needs it is 2249 us vs
# 2304 for bf16-softmax — inside noise. Off by default; flip on for
# shapes that are already block-aligned (no pad, no mask).
USE_FLASH = False

# The newer splash kernel pads only to the 128-lane multiple (1370 -> 1408,
# not 1536) and precompiles the pad mask into its block grid
# (benchmarks/attn_probe2.py measures it at the depth model's shape).
USE_SPLASH = False

# Custom single-pass VMEM kernel (ops/pallas_attention.py): whole K/V
# resident per (batch, head), logits never touch HBM. Measured
# (attn_probe3.py, bq=whole-seq): 84.8 us/frame/layer vs 86.5 bf16-softmax
# at the DA shape [32,1370,6,64] — a tie; 168 vs 141 at the BEiT shape
# [32,1025,16,64] — a loss. Attention at these shapes is floored by f32
# VPU exp (~2.2 ms per 32-frame layer), which every exact implementation
# pays; removing the logits HBM traffic buys nothing once XLA overlaps it.
# r5 re-measurement (benchmarks/vit_attn_retune.py): in ISOLATION the
# kernel now wins 19% at [32, 1370, 6, 64] (93.0 vs 114.5 us/frame/layer
# bf16-softmax; tuned flash 109.4) — but flipping it on e2e measured the
# headline at 184.0 fps vs 187.2 with bf16-softmax (bench.py, same day):
# inside the fused chunk graph XLA overlaps the logits traffic the kernel
# saves, and the isolated win does not transfer. Same conclusion as r2,
# now re-verified against the improved kernel. Stays opt-in.
USE_VMEM_KERNEL = False
_VMEM_MAX_HEADS = 8  # few-head gate when the kernel is opted in

_FLASH_MIN_SEQ = 512  # below this, logits fit in VMEM and XLA fusion wins
_BLOCK = 512  # the kernel's default major block; pad seq to a multiple

# Above this, flash is mandatory regardless of flags: materialized logits
# stop being a bandwidth tax and become a memory wall. The SD2/SVD UNets
# at product geometry attend over 96x96=9216 latent tokens — [B, H, N, N]
# is 1.7 GB/layer f32 at B=1 and does not fit at DepthCrafter's B=24
# window. 9216 is a 512-multiple, so the kernel runs pad-free.
_FLASH_ALWAYS_SEQ = 4096

_splash_cache: dict = {}


def _splash_bnhd(q, k, v):  # [B, N, H, D] -> [B, N, H, D]
    """Splash-attention with 128-multiple padding and a NumpyMask over the
    valid region; kernels are cached per (N, H) shape."""
    import numpy as np

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as _sak,
        splash_attention_mask as _sam,
    )

    b, n, h, d = q.shape
    n_pad = int(math.ceil(n / 128) * 128)
    key = (n, n_pad, h)
    kernel = _splash_cache.get(key)
    if kernel is None:
        valid = np.zeros((n_pad, n_pad), dtype=bool)
        valid[:n, :n] = True
        mask = _sam.MultiHeadMask([_sam.NumpyMask(valid)] * h)
        kernel = _sak.make_splash_mha(mask, head_shards=1, q_seq_shards=1)
        _splash_cache[key] = kernel
    scale = 1.0 / math.sqrt(d)
    pad = [(0, 0), (0, n_pad - n), (0, 0), (0, 0)]
    qp = jnp.pad(q * jnp.asarray(scale, q.dtype), pad)
    kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
    t = lambda x: jnp.swapaxes(x, 1, 2)  # BNHD <-> BHND
    out = jax.vmap(kernel)(t(qp), t(kp), t(vp))
    return t(out)[:, :n]


def _pad_len(n: int) -> int:
    return int(math.ceil(n / _BLOCK) * _BLOCK)


# NOTE: deliberately NOT jitted — a nested jit around a pallas_call breaks
# the axon relay's compile service (same workaround as ops/pallas_warp.py)
def _flash_nhd(q, k, v):  # [B, H, N, D] each
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    np_ = _pad_len(n)
    pad = [(0, 0), (0, 0), (0, np_ - n), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    # The kernel's DEFAULT BlockSizes are 128^3 — at the diffusion UNet's
    # level-0 shape ([5, 5, 9216, 64]) that is a 72x72 grid of 128x64x128
    # matmul pairs per (b, h): MXU underfill + grid overhead, measured
    # 65 ms/layer. 1024-blocks measure 9.95 ms (6.5x); 512 when 1024
    # doesn't divide; >=2304 overflows VMEM (benchmarks/attn9216_probe.py).
    blk = 1024 if np_ % 1024 == 0 else 512
    bs = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1)
    if np_ == n:
        # unpadded: SegmentIds would be an all-ones mask (pure overhead)
        out = flash_attention(qp, kp, vp, sm_scale=1.0 / math.sqrt(d),
                              block_sizes=bs)
    else:
        ids = (jnp.arange(np_) < n).astype(jnp.int32)[None, :]  # [1, Np]
        ids = jnp.broadcast_to(ids, (b, np_))
        out = flash_attention(
            qp, kp, vp,
            segment_ids=SegmentIds(q=ids, kv=ids),
            sm_scale=1.0 / math.sqrt(d),
            block_sizes=bs,
        )
    return out[:, :, :n, :]


def _bf16_softmax_attention(q, k, v):  # [B, N, H, D] bf16
    """Attention with the [B, H, N, N] tensors STORED in bf16.

    ``jax.nn.dot_product_attention``'s XLA path materializes the logits and
    softmax in f32 — at N=1370 that is ~1.6 GB of HBM traffic per 8-frame
    batch per layer and the ViT becomes bandwidth-bound. Keeping the two
    big intermediates in bf16 halves that. Row max and the normalizer sum
    are still computed in f32 (the sum over 1370 bf16 terms would lose ~3
    bits accumulated naively); per-element exp in bf16 adds error of the
    same order as the bf16 matmuls the caller already opted into.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * jnp.bfloat16(scale)
    m = jnp.max(logits.astype(jnp.float32), axis=-1, keepdims=True)
    e = jnp.exp(logits - m.astype(jnp.bfloat16))
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    p = (e / s).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def multi_head_attention(q, k, v):
    """Scaled dot-product attention over [B, N, H, D] tensors (BNHD in/out).

    TPU + long sequence + bf16 -> traffic-reduced paths; otherwise XLA's
    fused default.
    """
    n = q.shape[1]
    self_attn = k.shape[1] == n  # the flash path masks q/kv symmetrically
    if n >= _FLASH_MIN_SEQ and self_attn and jax.default_backend() == "tpu":
        if n >= _FLASH_ALWAYS_SEQ:
            t = lambda x: jnp.swapaxes(x, 1, 2)  # BNHD -> BHND
            return t(_flash_nhd(t(q), t(k), t(v)))
        if USE_VMEM_KERNEL and q.shape[2] <= _VMEM_MAX_HEADS:
            from .pallas_attention import MAX_RESIDENT_SEQ, vmem_attention

            if n <= MAX_RESIDENT_SEQ:
                return vmem_attention(q, k, v)
        if USE_SPLASH:
            return _splash_bnhd(q, k, v)
        if USE_FLASH:
            t = lambda x: jnp.swapaxes(x, 1, 2)  # BNHD -> BHND
            return t(_flash_nhd(t(q), t(k), t(v)))
        if q.dtype == jnp.bfloat16:
            return _bf16_softmax_attention(q, k, v)
    # jax.nn.dot_product_attention requires q/k/v to share a dtype; mixed
    # inputs (e.g. f32 hidden states vs bf16 cross-attn context) promote
    if not (q.dtype == k.dtype == v.dtype):
        dt = jnp.result_type(q.dtype, k.dtype, v.dtype)
        q, k, v = q.astype(dt), k.astype(dt), v.astype(dt)
    return jax.nn.dot_product_attention(q, k, v)
