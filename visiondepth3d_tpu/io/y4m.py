"""Native Y4M (YUV4MPEG2) video reader/writer via the C++ media library.

The raw-video interchange path of the framework: FFmpeg (when present)
speaks y4m over pipes; without FFmpeg, .y4m files are read/written directly.
The C++ side does YUV420<->RGB conversion and background prefetch
(double-buffering decode against TPU compute), replacing the reference's
cv2.VideoCapture + Queue prefetch thread (merged_pipeline.py:85-104).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _LIB_DIR / "libvd3d_media.so"
_lib = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["/bin/sh", str(_LIB_DIR / "build.sh")], check=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    if not hasattr(lib, "vd3d_y4m_open_raw"):  # stale build: rebuild once
        del lib
        subprocess.run(["/bin/sh", str(_LIB_DIR / "build.sh")], check=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vd3d_y4m_open.restype = ctypes.c_void_p
    lib.vd3d_y4m_open.argtypes = [ctypes.c_char_p]
    lib.vd3d_y4m_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 4
    lib.vd3d_y4m_read.restype = ctypes.c_int
    lib.vd3d_y4m_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.vd3d_y4m_close.argtypes = [ctypes.c_void_p]
    lib.vd3d_y4m_writer_open.restype = ctypes.c_void_p
    lib.vd3d_y4m_writer_open.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
    lib.vd3d_y4m_writer_open2.restype = ctypes.c_void_p
    lib.vd3d_y4m_writer_open2.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 5
    lib.vd3d_y4m_write.restype = ctypes.c_int
    lib.vd3d_y4m_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.vd3d_y4m_write_planes.restype = ctypes.c_int
    lib.vd3d_y4m_write_planes.argtypes = [ctypes.c_void_p] + [
        ctypes.c_char_p
    ] * 3
    lib.vd3d_y4m_writer_close.argtypes = [ctypes.c_void_p]
    lib.vd3d_y4m_count.restype = ctypes.c_long
    lib.vd3d_y4m_count.argtypes = [ctypes.c_void_p]
    lib.vd3d_y4m_open_raw.restype = ctypes.c_void_p
    lib.vd3d_y4m_open_raw.argtypes = [ctypes.c_char_p]
    lib.vd3d_y4m_seek.restype = ctypes.c_int
    lib.vd3d_y4m_seek.argtypes = [ctypes.c_void_p, ctypes.c_long]
    _lib = lib
    return lib


class Y4MReader:
    """Iterates uint8 RGB [H, W, 3] frames with native background prefetch."""

    def __init__(self, path: str | os.PathLike):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.vd3d_y4m_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open y4m: {path}")
        w, h, fn, fd = (ctypes.c_int() for _ in range(4))
        lib.vd3d_y4m_info(self._h, w, h, fn, fd)
        self.width, self.height = w.value, h.value
        self.fps = fn.value / max(fd.value, 1)
        self.fps_num, self.fps_den = fn.value, fd.value
        self._buf = ctypes.create_string_buffer(self.width * self.height * 3)

    def read(self) -> np.ndarray | None:
        if self._h is None:
            return None
        ok = self._lib.vd3d_y4m_read(self._h, self._buf)
        if not ok:
            return None
        return np.frombuffer(self._buf, dtype=np.uint8).reshape(
            self.height, self.width, 3
        ).copy()

    def __iter__(self):
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def count(self) -> int | None:
        """Total frame count, O(1) from the file size (fixed-size FRAME
        records — what this muxer and ffmpeg emit). None when the stream
        has per-frame parameters or isn't a regular file."""
        n = self._lib.vd3d_y4m_count(self._h)
        return None if n < 0 else int(n)

    def seek(self, frame_idx: int) -> bool:
        """Reposition to an absolute frame index (segment-parallel reads).
        Returns False when the stream isn't seekable at fixed records."""
        return bool(self._lib.vd3d_y4m_seek(self._h, int(frame_idx)))

    def close(self):
        if self._h is not None:
            self._lib.vd3d_y4m_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Y4MPlaneReader:
    """Raw-plane reader: yields (Y [H,W], U [H/2,W/2], V [H/2,W/2]) uint8.

    The input analog of ``Y4MWriter.write_yuv420``: the host does a pure
    fread (no colorspace math) and the DEVICE converts
    (ops/convert.py:yuv420_to_rgb_u8, bit-exact vs the C++ path) — half
    the host->device bytes of RGB and near-zero host decode CPU."""

    def __init__(self, path: str | os.PathLike):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.vd3d_y4m_open_raw(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open y4m: {path}")
        w, h, fn, fd = (ctypes.c_int() for _ in range(4))
        lib.vd3d_y4m_info(self._h, w, h, fn, fd)
        self.width, self.height = w.value, h.value
        self.fps = fn.value / max(fd.value, 1)
        self._cw = (self.width + 1) // 2
        self._ch = (self.height + 1) // 2
        self._ysz = self.width * self.height
        self._csz = self._cw * self._ch
        self._buf = ctypes.create_string_buffer(self._ysz + 2 * self._csz)

    def read(self):
        if self._h is None:
            return None
        ok = self._lib.vd3d_y4m_read(self._h, self._buf)
        if not ok:
            return None
        raw = np.frombuffer(self._buf, dtype=np.uint8)
        y = raw[: self._ysz].reshape(self.height, self.width).copy()
        u = raw[self._ysz : self._ysz + self._csz].reshape(
            self._ch, self._cw).copy()
        v = raw[self._ysz + self._csz :].reshape(self._ch, self._cw).copy()
        return y, u, v

    def seek(self, frame_idx: int) -> bool:
        return bool(self._lib.vd3d_y4m_seek(self._h, int(frame_idx)))

    def count(self) -> int | None:
        n = self._lib.vd3d_y4m_count(self._h)
        return None if n < 0 else int(n)

    def close(self):
        if self._h is not None:
            self._lib.vd3d_y4m_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Y4MWriter:
    """Writes uint8 RGB [H, W, 3] frames to a .y4m file (C420jpeg)."""

    def __init__(self, path: str | os.PathLike, width: int, height: int,
                 fps: float, append: bool = False):
        lib = _load_lib()
        self._lib = lib
        fps_num, fps_den = _fps_to_ratio(fps)
        self._h = lib.vd3d_y4m_writer_open2(
            str(path).encode(), width, height, fps_num, fps_den, int(append)
        )
        if not self._h:
            raise IOError(f"cannot open y4m for writing: {path}")
        self.width, self.height = width, height

    def write(self, frame_rgb_u8: np.ndarray):
        frame = np.ascontiguousarray(frame_rgb_u8, dtype=np.uint8)
        assert frame.shape == (self.height, self.width, 3), frame.shape
        ok = self._lib.vd3d_y4m_write(self._h, frame.ctypes.data_as(ctypes.c_char_p))
        if not ok:
            raise IOError("y4m write failed")

    def write_yuv420(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """Plane passthrough: Y [H, W], U/V [H/2, W/2] uint8 — produced on
        device by ops.convert.rgb_u8_to_yuv420; the host only fwrites."""
        y = np.ascontiguousarray(y, dtype=np.uint8)
        u = np.ascontiguousarray(u, dtype=np.uint8)
        v = np.ascontiguousarray(v, dtype=np.uint8)
        assert y.shape == (self.height, self.width), y.shape
        ch, cw = (self.height + 1) // 2, (self.width + 1) // 2
        assert u.shape == (ch, cw) and v.shape == (ch, cw), (u.shape, v.shape)
        ok = self._lib.vd3d_y4m_write_planes(
            self._h,
            y.ctypes.data_as(ctypes.c_char_p),
            u.ctypes.data_as(ctypes.c_char_p),
            v.ctypes.data_as(ctypes.c_char_p),
        )
        if not ok:
            raise IOError("y4m plane write failed")

    def close(self):
        if self._h is not None:
            self._lib.vd3d_y4m_writer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _fps_to_ratio(fps: float) -> tuple[int, int]:
    for num, den in ((24000, 1001), (30000, 1001), (60000, 1001)):
        if abs(fps - num / den) < 1e-3:
            return num, den
    if abs(fps - round(fps)) < 1e-6:
        return int(round(fps)), 1
    return int(round(fps * 1000)), 1000
