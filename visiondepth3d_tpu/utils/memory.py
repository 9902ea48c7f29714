"""HBM-aware batch sizing (the reference's VRAM heuristic, TPU edition).

The reference sizes inference batches from free CUDA VRAM:
``min(4 * (VRAM_GB - 1), 32)`` (render_depth.py:1206-1213). TPU version
queries the device memory stats when available (v5e = 16 GB HBM) and sizes
by an actual per-frame activation estimate instead of a rule of thumb.
"""

from __future__ import annotations


def device_hbm_bytes(default_gb: float = 16.0) -> float:
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return default_gb * 1e9


def dynamic_batch_size(
    frame_hw: tuple[int, int],
    inference_size: int = 518,
    model_params_bytes: float = 100e6,
    max_batch: int = 32,
    budget_fraction: float = 0.6,
) -> int:
    """Frames per inference batch sized to the HBM budget.

    Activation estimate per frame: the ViT token activations dominate —
    ~40 floats of activations per pixel of the snapped inference grid, plus
    the full-res frame and depth buffers.
    """
    hbm = device_hbm_bytes()
    budget = hbm * budget_fraction - 3.0 * model_params_bytes
    h, w = frame_hw
    per_frame = (
        inference_size * inference_size * 40 * 4  # backbone activations
        + h * w * 3 * 4 * 2  # frame + packed output
        + h * w * 4 * 3  # depth + tracker/aux buffers
    )
    n = int(budget // max(per_frame, 1))
    return max(1, min(n, max_batch))
