"""Pallas TPU kernel: 3x3 SAME convolution for small channel counts.

XLA's TPU lowering of NHWC 3x3 convs at the 32-64 channels that dominate
this framework's conv inventory (ESRGAN RRDB trunk, RIFE IFNet, the DPT
fusion/head stack, VAE resnets) runs at ~6% MXU regardless of batch or
spatial size (benchmarks/esrgan_split2.py, conv_probe.py) — the implicit
GEMM pads channels to the 128 lane width and then underfills the MXU.
This kernel expresses the conv as what it is on TPU: nine shifted
[rows*W, C] x [C, O] MXU matmuls accumulated in f32 in VMEM, with bias
and activation fused into the same pass.

Layout: grid (B, H/bh); each program owns a [bh, W, C] row block plus two
single-row context granules (row bh*i - 1 and row bh*i + bh, clamped —
outer dims have no sublane tiling constraint, so 1-row blocks are legal).
Vertical SAME zero padding is reproduced by masking the context rows that
fall outside the image; horizontal padding by static shift-and-zero-pad
along W (sublanes). All nine taps run on VMEM-resident data: one HBM read
of x (+2 duplicate boundary rows per block) and one write of the output.

Numerics: matmuls accumulate in f32 (preferred_element_type) and the nine
taps are summed in f32 — the same contract as XLA's conv — then bias,
activation, and the cast to the input dtype. Exact-parity tested against
flax nn.Conv in tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Escape hatch for GSPMD-sharded callers: pallas_call has no partitioning
# rule, so tracing this kernel on an array carrying a mesh sharding
# constraint would force XLA to all-gather the operand onto every device.
# Pipelines that shard the conv batch axis (enhance --mesh) flip this ON
# for the duration of their trace (see make_enhance_fn) so Conv3x3 keeps
# the partitionable XLA conv.
FORCE_XLA = False


def _conv3_kernel(bh: int, h: int, act: str | None, slope: float,
                  top_ref, mid_ref, bot_ref, w_ref, b_ref, o_ref):
    i = pl.program_id(1)
    mid = mid_ref[0]  # [bh, W, C]
    w = w_ref[:]  # [9, C, O], ky-major
    dt = mid.dtype
    bh_, wpx, c = mid.shape

    # ky=0 rows (input row y-1) and ky=2 rows (y+1); context granules are
    # clamped duplicates at the image edges, so mask rows outside [0, h)
    # back to the zero padding SAME convolution implies.
    rows_u = jnp.concatenate([top_ref[0], mid[: bh_ - 1]], axis=0)
    rows_d = jnp.concatenate([mid[1:], bot_ref[0]], axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (bh_, 1, 1), 0) + i * bh
    rows_u = jnp.where(ridx - 1 >= 0, rows_u, jnp.zeros_like(rows_u))
    rows_d = jnp.where(ridx + 1 < h, rows_d, jnp.zeros_like(rows_d))

    def shift(s, kx):  # out[x] needs in[x + kx - 1]
        if kx == 0:
            return jnp.pad(s[:, :-1], [(0, 0), (1, 0), (0, 0)])
        if kx == 2:
            return jnp.pad(s[:, 1:], [(0, 0), (0, 1), (0, 0)])
        return s

    o = w.shape[-1]
    acc = jnp.zeros((bh_ * wpx, o), jnp.float32)
    if w.ndim == 2:  # cat9: ONE matmul at K=9C (w is [9C, O])
        cat = jnp.concatenate([rows_u, mid, rows_d], axis=-1)  # [bh, W, 3C]
        cat9 = jnp.concatenate(
            [shift(cat, 0), cat, shift(cat, 2)], axis=-1)  # [bh, W, 9C]
        acc = jax.lax.dot_general(
            cat9.reshape(bh_ * wpx, 9 * c), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif w.shape[0] == 3:  # cat3 variant: w is [3(kx), 3C, O]
        cat = jnp.concatenate([rows_u, mid, rows_d], axis=-1)  # [bh, W, 3C]
        for kx in (0, 1, 2):
            m = shift(cat, kx).reshape(bh_ * wpx, 3 * c)
            acc = acc + jax.lax.dot_general(
                m, w[kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        for ky, slab in ((0, rows_u), (1, mid), (2, rows_d)):
            for kx in (0, 1, 2):
                m = shift(slab, kx).reshape(bh_ * wpx, c)
                acc = acc + jax.lax.dot_general(
                    m, w[ky * 3 + kx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    acc = acc + b_ref[0].astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "lrelu":
        acc = jnp.where(acc >= 0.0, acc, acc * slope)
    o_ref[0] = acc.reshape(bh_, wpx, o).astype(dt)


def pick_conv_block_rows(h: int, w: int, c: int, o: int, itemsize: int = 2,
                         budget: int = 9 * 1024 * 1024) -> int:
    """Largest row block dividing ``h`` whose working set (mid block + f32
    accumulator + out, double-buffered grid operands) fits the budget."""
    for bh in (32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if h % bh:
            continue
        grid_ops = 2 * bh * w * (c + o) * itemsize  # mid + out, x2 buffered
        temps = bh * w * (4 * o + 3 * c * itemsize)  # f32 acc + live slabs
        if grid_ops + temps <= budget:
            return bh
    return 1


def conv3x3_pallas(
    x: jnp.ndarray,  # [B, H, W, C]
    kernel: jnp.ndarray,  # [3, 3, C, O] (flax nn.Conv layout)
    bias: jnp.ndarray | None = None,  # [O]
    act: str | None = None,  # None | "relu" | "lrelu"
    slope: float = 0.2,
    block_rows: int | None = None,
    variant: str = "cat3",  # "cat3": 3 matmuls at K=3C; "mm9": 9 at K=C
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv == nn.Conv(O, (3,3), padding=((1,1),(1,1))).

    Not jitted here (callers are; nested jit around pallas_call trips the
    axon relay — see ops/pallas_warp.py)."""
    b, h, w, c = x.shape
    o = kernel.shape[-1]
    bh = block_rows or pick_conv_block_rows(h, w, c, o, x.dtype.itemsize)
    assert h % bh == 0, (h, bh)
    w9 = kernel.reshape(9, c, o).astype(x.dtype)
    if variant in ("cat3", "cat9"):
        # [3(kx), 3C, O], the K axis ky-major to match the in-kernel concat
        w9 = jnp.stack([
            jnp.concatenate([w9[ky * 3 + kx] for ky in range(3)], axis=0)
            for kx in range(3)
        ])
        if variant == "cat9":  # [9C, O], kx-major outer, ky inner
            w9 = w9.reshape(9 * c, o)
    b1 = (bias if bias is not None else jnp.zeros((o,), x.dtype))
    b1 = b1.reshape(1, o).astype(x.dtype)

    def row(i_off):
        # single-row context granule: outer-dim blocks may have size 1
        def idx(b_, i, off=i_off):
            r = i * bh + off
            return (b_, jnp.clip(r, 0, h - 1), 0, 0)
        return pl.BlockSpec((1, 1, w, c), idx, memory_space=pltpu.VMEM)

    mid_spec = pl.BlockSpec((1, bh, w, c), lambda b_, i: (b_, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bh, w, o), lambda b_, i: (b_, i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda b_, i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_conv3_kernel, bh, h, act, slope),
        grid=(b, h // bh),
        in_specs=[row(-1), mid_spec, row(bh), full(w9.shape),
                  full((1, o))],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), x.dtype),
        # the default 16 MB scoped-VMEM budget rejects useful block sizes
        # (the unrolled tap temps count against it); v5e has 128 MiB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, w9, b1)
