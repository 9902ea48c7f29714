"""Progress/FPS/ETA reporting, crash logging, and profiling hooks.

Reference analogs: rolling 10-sample FPS + ETA strings in every loop
(render_3d.py:1438-1461, render_depth.py:1955-1969), crash excepthooks
appending to vd3d_crash.log (render_depth.py:2077-2090), CUDA-event stage
timing in DepthCrafter (depth_crafter_ppl.py:155-192). TPU versions:
jax.profiler traces + wall-clock stage timers (device work is async; timers
bracket block_until_ready'd stages).
"""

from __future__ import annotations

import contextlib
import sys
import threading
import time
import traceback
from collections import deque
from pathlib import Path

CRASH_LOG = Path("vd3d_crash.log")


class FpsMeter:
    """Rolling-window FPS + ETA (10-sample window like the reference)."""

    def __init__(self, total: int | None = None, window: int = 10):
        self.total = total
        self.samples: deque[float] = deque(maxlen=window)
        self.done = 0
        self.started = time.time()
        self._prev = self.started

    def tick(self, n: int = 1) -> None:
        now = time.time()
        dt = now - self._prev
        if dt > 0:
            self.samples.append(n / dt)
        self._prev = now
        self.done += n

    @property
    def fps(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def eta_seconds(self) -> float | None:
        if not self.total or self.fps <= 0:
            return None
        return max(self.total - self.done, 0) / self.fps

    def status(self) -> str:
        elapsed = time.strftime("%H:%M:%S", time.gmtime(time.time() - self.started))
        pct = f"{100.0 * self.done / self.total:.2f}%" if self.total else f"{self.done}"
        eta = self.eta_seconds
        eta_s = time.strftime("%H:%M:%S", time.gmtime(eta)) if eta is not None else "--"
        return f"{pct} | FPS: {self.fps:.2f} | Elapsed: {elapsed} | ETA: {eta_s}"


def install_crash_logging(path: Path | str = CRASH_LOG) -> None:
    """sys/threading excepthooks appending full tracebacks to a log file."""
    path = Path(path)

    def _log(exc_type, exc, tb):
        with path.open("a") as f:
            f.write(f"\n=== {time.strftime('%Y-%m-%d %H:%M:%S')} ===\n")
            traceback.print_exception(exc_type, exc, tb, file=f)
        traceback.print_exception(exc_type, exc, tb)

    sys.excepthook = _log

    def _thread_hook(args):
        _log(args.exc_type, args.exc_value, args.exc_traceback)

    threading.excepthook = _thread_hook


@contextlib.contextmanager
def stage_timer(name: str, sink: dict | None = None, sync=None):
    """Wall-clock stage timer; pass sync=array/pytree to block on device work."""
    import jax

    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.setdefault(name, []).append(dt)
    else:
        print(f"[stage] {name}: {dt * 1000:.1f} ms")


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/vd3d_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class RenderControl:
    """Cooperative suspend/resume/cancel handle, polled between chunks
    (the threading.Event trio of the reference, render_3d.py:33-34)."""

    def __init__(self):
        self._suspend = threading.Event()
        self._cancel = threading.Event()

    def suspend(self):
        self._suspend.set()

    def resume(self):
        self._suspend.clear()

    def cancel(self):
        self._cancel.set()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()

    def checkpoint(self, poll_s: float = 0.2) -> bool:
        """Block while suspended; return True if cancelled."""
        while self._suspend.is_set() and not self._cancel.is_set():
            time.sleep(poll_s)
        return self._cancel.is_set()


def make_control_check(path, poll_s: float = 0.5):
    """Cooperative suspend/resume/cancel via a control file (the
    reference's suspend_flag/cancel_flag Events polled in-loop,
    render_3d.py:1195-1220, headless form).

    Returns a ``cancel_check`` callable for the render loops: it reads
    ``path`` between chunks; content 'cancel' returns True (stop),
    'pause' blocks (polling every ``poll_s``) until the content changes —
    suspension IS the callback not returning, which the pipelines
    document — anything else (or a missing file) returns False.
    """
    import time as _time

    def _state() -> str:
        try:
            with open(path) as f:
                return f.read().strip().lower()
        except OSError:
            return ""

    def check() -> bool:
        while True:
            s = _state()
            if s == "cancel":
                return True
            if s != "pause":
                return False
            _time.sleep(poll_s)

    return check
