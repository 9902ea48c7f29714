"""Level-0 diffusion attention probe (VERDICT r4 #2, follow-up to
unet_block_split.py).

unet_block_split attribution: attn_L0 (9216 tokens, [E5, N9216, H5, D64])
costs ~68 ms/layer x5 layers = ~84% of the 406 ms Marigold UNet step. The
flash path uses jax's pallas flash_attention with DEFAULT BlockSizes —
128^3 tiles, i.e. 72x72 grid of 128x64x128 matmuls per (b, h): MXU
underfill + grid overhead. This probe times:

  A. current: flash + SegmentIds + default blocks (the shipped path)
  B. flash, NO segment ids (N is already a 512-multiple -> mask is
     all-ones; the ids machinery is pure overhead)
  C. B + tuned BlockSizes over divisors of 9216
  D. bf16-softmax two-pass chunked over q (XLA, no flash) for reference

Run: nohup python benchmarks/attn9216_probe.py > /tmp/attn9216.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, N, D = 5, 5, 9216, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    sm = 1.0 / math.sqrt(D)

    def timed(label, fn, inner=8, iters=2):
        """Loop INSIDE one jit (fori_loop, carry-chained q) and fetch one
        scalar per launch — per-iteration host fetches through the relay
        would otherwise dominate (~100 ms+ latency each)."""

        @jax.jit
        def run(acc0, q0, k, v):
            def body(_, carry):
                qq, acc = carry
                out = fn(qq, k, v)
                acc = acc + jnp.sum(out[0, 0, 0].astype(jnp.float32))
                qq = qq + (acc % 2).astype(qq.dtype) * jnp.bfloat16(1e-6)
                return (qq, acc)

            qq, acc = jax.lax.fori_loop(0, inner, body, (q0, acc0))
            return acc

        acc = run(jnp.float32(0), q, k, v)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, q, k, v)
        _ = float(acc)
        dt = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"variant": label, "ms": round(dt, 2)}), flush=True)
        return dt

    gold = None

    def check(fn):
        """Compare a strided slice only — fetching the full [5,5,9216,64]
        output is ~59 MB per variant through the ~30 MB/s relay."""
        nonlocal gold

        @jax.jit
        def probe(q, k, v):
            return fn(q, k, v)[0, :, ::256, :].astype(jnp.float32)

        out = np.asarray(probe(q, k, v))
        if gold is None:
            gold = out
        else:
            err = np.abs(out - gold).max()
            assert err < 0.02, f"divergence {err}"

    # A: shipped path (segment ids, default blocks)
    def flash_segids(q, k, v):
        ids = jnp.broadcast_to(jnp.ones((1, N), jnp.int32), (B, N))
        return flash_attention(q, k, v, segment_ids=SegmentIds(q=ids, kv=ids),
                               sm_scale=sm)

    check(flash_segids)
    timed("A_flash_segids_default", flash_segids)

    # B: no segment ids
    def flash_plain(q, k, v):
        return flash_attention(q, k, v, sm_scale=sm)

    check(flash_plain)
    timed("B_flash_plain_default", flash_plain)

    # C: tuned blocks
    for bq, bkm, bk in [(512, 512, 512), (512, 1024, 512),
                        (1024, 1024, 1024), (512, 2304, 768),
                        (2304, 2304, 2304), (1024, 4608, 1536)]:
        bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk,
                        block_b=1)

        def flash_tuned(q, k, v, bs=bs):
            return flash_attention(q, k, v, sm_scale=sm, block_sizes=bs)

        try:
            check(flash_tuned)
            timed(f"C_flash_bq{bq}_bkm{bkm}_bk{bk}", flash_tuned)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            print(json.dumps({"variant": f"C_{bq}_{bkm}_{bk}",
                              "error": str(e)[:120]}), flush=True)

    # D: two-pass bf16-softmax over q-chunks (XLA large matmuls)
    def chunked(q, k, v, cq=1024):
        def one(qc):  # [B, H, cq, D]
            logits = jnp.einsum("bhqd,bhkd->bhqk", qc, k,
                                preferred_element_type=jnp.float32) * sm
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp((logits - m)).astype(jnp.bfloat16)
            num = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            den = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            return (num.astype(jnp.float32) / den).astype(jnp.bfloat16)

        qs = q.reshape(B, H, N // cq, cq, D).transpose(2, 0, 1, 3, 4)
        outs = jax.lax.map(one, qs)  # [nc, B, H, cq, D]
        return outs.transpose(1, 2, 0, 3, 4).reshape(B, H, N, D)

    check(chunked)
    timed("D_bf16softmax_qchunk1024", chunked)


if __name__ == "__main__":
    main()
