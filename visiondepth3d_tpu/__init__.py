"""VisionDepth3D-TPU: a TPU-native 2D->3D video conversion framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of the
VisionDepth3D reference suite (monocular depth estimation + DIBR stereo
composition + frame tools), built for TPU meshes:

- ``ops``      pure jnp + Pallas kernels for the per-frame stereo math
               (pop shaping, subject lock, disparity warp, feathering,
               healing, DOF, color grade, output packing).
- ``state``    the cross-frame EMA trackers as functional pytrees.
- ``stereo``   the fused per-frame DIBR step and batched ``lax.scan`` driver.
- ``depth``    Flax monocular depth model zoo + weight converters.
- ``enhance``  RIFE frame interpolation and Real-ESRGAN upscaling.
- ``io``       host-side media I/O (FFmpeg pipes when available, native
               Y4M/raw fallbacks), double-buffered device feeding.
- ``parallel`` mesh construction, frame-DP / spatial-SP / tensor-TP
               shardings and halo exchange.
- ``pipeline`` end-to-end graphs: depth-only, stereo-only, merged.
- ``config``   the canonical parameter schema + JSON presets.
- ``cli``      command-line front-ends.

Unlike the reference (single-GPU Tkinter app with per-frame Python->CUDA
round-trips; see SURVEY.md), every per-frame stage here lives in one
jit-compiled on-device graph, and video batches stream through a device mesh.
"""

__version__ = "0.1.0"
