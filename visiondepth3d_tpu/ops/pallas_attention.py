"""Pallas TPU kernel: single-pass fused attention for ViT-sized sequences.

The model-zoo ViTs run self-attention at N ~ 1000-1400 tokens (DA-V2 @518:
N=1370; BEiT-L @512: N=1025), head_dim 64. XLA's path (and the bf16-softmax
variant in ops/attention.py) materializes the [B, H, N, N] logits in HBM —
~720 MB of traffic per layer for the 32-frame production batch — so
attention runs HBM-bound at ~3x its matmul roofline. The upstream flash /
splash kernels fix that in principle but carry online-softmax machinery and
block-masking generality that measure SLOWER than bf16-softmax at these
shapes on v5e (benchmarks/RESULTS.md, attn_probe2).

This kernel exploits what flash cannot assume: at ViT scale one (batch,
head)'s ENTIRE K and V fit in VMEM (N=1536, D=64, bf16 -> 384 KB). So no
online softmax, no K/V streaming: the grid walks q-row blocks innermost
with K/V block indices fixed per (b, h) — Pallas skips the re-fetch when a
block index repeats — and each program computes plain
softmax(q K^T) V on rows it owns, logits living only in VMEM.

Numerics: logits and softmax statistics in f32 (tighter than the
bf16-softmax path it replaces), probabilities cast to the input dtype for
the P @ V matmul (same contract as _bf16_softmax_attention). Pad columns
are masked to -1e30 before the row max, so outputs match the unpadded
reference exactly (pad q rows compute garbage and are sliced off).

Reference role: the torch SDPA/xFormers attention the reference's depth
backends use on CUDA (render_depth.py model zoo).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Hard ceiling for "K/V resident in VMEM": N_pad * D * 2 dtypes * 2 bytes
# plus the [bq, N_pad] f32 logits must fit the ~16 MB VMEM budget with
# double buffering. 4096 x 128 bf16 K+V = 2 MB; logits 256x4096 f32 = 4 MB.
MAX_RESIDENT_SEQ = 4096


def _attn_kernel(n_real: int, scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [Np, D]
    v = v_ref[0, 0]  # [Np, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, Np] f32, VMEM-only
    if n_real != k.shape[0]:
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < n_real, s, -1e30)
    # softmax in f32: the [bq, Np] exp is the kernel's VPU floor (the two
    # matmuls are ~4x cheaper), but v5e has no native bf16 exp — computing
    # it "in bf16" measured SLOWER than f32 (extra casts around an f32 EUP
    # op, benchmarks/attn_probe3.py), so f32 keeps both speed and accuracy.
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=1, keepdims=True)
    p = (e / den).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _pick_bq(n_pad: int) -> int:
    """q rows per program. Bigger is faster (fewer grid steps re-touching
    the resident K/V and better matmul shapes): whole-sequence blocks won
    the sweep at ViT scale (benchmarks/attn_probe3.py: bq=1408 > 704 > 352
    > 128). Above ~1536 the [bq, Np] logits + exp intermediates no longer
    fit VMEM; fall back to the largest 128-multiple divisor that keeps
    bq * n_pad * 8 bytes within budget."""
    if n_pad <= 1536:
        return n_pad
    budget = 12 * 1024 * 1024
    best = 128
    for bq in range(128, n_pad + 1, 128):
        if n_pad % bq == 0 and bq * n_pad * 8 <= budget:
            best = bq
    return best


def vmem_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int | None = None,
) -> jnp.ndarray:
    """Fused single-pass attention (BNHD in/out). Requires N <=
    MAX_RESIDENT_SEQ. Callers are jitted; not jitted here (nested-jit
    around pallas_call trips the axon relay, see ops/pallas_warp.py)."""
    b, n, h, d = q.shape
    assert n <= MAX_RESIDENT_SEQ, n
    n_pad = int(math.ceil(n / 128) * 128)
    bq = block_q or _pick_bq(n_pad)
    assert n_pad % bq == 0, (n_pad, bq)  # a non-divisor drops q rows
    scale = 1.0 / math.sqrt(d)

    def prep(x):  # [B, N, H, D] -> [B, H, Np, D]; transpose fuses upstream
        x = jnp.swapaxes(x, 1, 2)
        if n_pad != n:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, n_pad - n), (0, 0)])
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)

    q_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, n_pad, d), lambda b_, h_, i: (b_, h_, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n, scale),
        grid=(b, h, n_pad // bq),  # q-blocks innermost: K/V stay resident
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
    )(qp, kp, vp)
    return jnp.swapaxes(out[:, :, :n], 1, 2)
