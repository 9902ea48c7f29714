"""Does tuned-block flash now beat bf16-softmax at the ViT's real shape?

Round-2 probes picked bf16-softmax for the DA-V2 backbone ([32, 1370, 6,
64]): flash with DEFAULT 128³ blocks measured 3592 us vs bf16-softmax
1304 at a similar shape, and tuned flash (1160) was only sampled at a
padded [8, 6, 1536, 64]. Round 5 shipped tuned BlockSizes for the
diffusion shapes; this probe re-tests the HEADLINE shape with them:

  bf16sm       — current production path (unpadded 1370)
  flash_512    — padded to 1536, 512³ blocks, SegmentIds mask
  flash_512_np — padded to 1536, NO segment ids (the 166 pad keys attend
                 as garbage -> NOT shippable, just bounds the ids cost)
  vmem_kernel  — ops/pallas_attention.py opt-in, for reference

If flash_512 wins, ops/attention's dispatch thresholds change and the
headline depth stage gets ~0.1-0.2 ms/frame back.

Run: nohup python benchmarks/vit_attn_retune.py > /tmp/vit_attn.out 2>&1 &
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

B, N, H, D = 32, 1370, 6, 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vd3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from visiondepth3d_tpu.ops import attention as att

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    def timed(label, fn, inner=8, iters=3):
        @jax.jit
        def run(acc0, qq):
            def body(_, acc):
                xin = qq + acc.astype(qq.dtype) * 1e-30
                y = fn(xin)
                return acc + jnp.sum(
                    y.reshape(-1)[:64].astype(jnp.float32)) * 1e-30

            return lax.fori_loop(0, inner, body, acc0)

        acc = run(jnp.float32(0), q)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = run(acc, q)
        _ = float(acc)
        ms = (time.perf_counter() - t0) / (iters * inner) * 1000
        print(json.dumps({"variant": label, "ms": round(ms, 3),
                          "us_per_frame": round(ms / B * 1000, 1)}),
              flush=True)
        return ms

    timed("bf16sm_unpadded",
          lambda qq: att._bf16_softmax_attention(qq, qq, qq))

    def flash_seg(qq):  # BNHD -> BHND -> flash -> back
        t = lambda x: jnp.swapaxes(x, 1, 2)
        return t(att._flash_nhd(t(qq), t(qq), t(qq)))

    timed("flash_512_segids_padded", flash_seg)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )
    import math

    bs = BlockSizes(block_q=512, block_k_major=512, block_k=512, block_b=1)

    def flash_nopad_ids(qq):
        t = jnp.swapaxes(qq, 1, 2)
        pad = [(0, 0), (0, 0), (0, 1536 - N), (0, 0)]
        tp_ = jnp.pad(t, pad)
        out = flash_attention(tp_, tp_, tp_, sm_scale=1.0 / math.sqrt(D),
                              block_sizes=bs)
        return jnp.swapaxes(out[:, :, :N, :], 1, 2)

    timed("flash_512_noids_padded_UNSOUND", flash_nopad_ids)

    from visiondepth3d_tpu.ops.pallas_attention import vmem_attention

    try:
        timed("vmem_kernel", lambda qq: vmem_attention(qq, qq, qq))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": "vmem_kernel",
                          "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
