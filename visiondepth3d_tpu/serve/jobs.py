"""Job manager for the web control surface (`vd3d serve`).

The reference runs every long operation on a daemon thread spawned from
the Tk main loop, coordinated by module-level suspend/cancel Events and
marshalled back to the UI via ``widget.after`` (VisionDepth3D.py:65-69,
1661-1662; core/render_depth.py:37-39). The headless analog: one worker
thread drains a FIFO of jobs (the reference's batch queue polls
``is_render_done`` the same way, VisionDepth3D.py:2439-2470), each job
carries its own pause/cancel events, and the HTTP layer (app.py) reads
job snapshots instead of Tk variables.

Jobs are serialized through ONE worker on purpose: the reference is a
one-GPU/one-render-thread app, and a single TPU chip has the same
property — two concurrent renders would just thrash HBM.
"""

from __future__ import annotations

import dataclasses
import itertools
import threading
import time
import traceback
from typing import Any, Callable


@dataclasses.dataclass
class Job:
    id: int
    kind: str
    params: dict
    status: str = "queued"  # queued|running|paused|done|error|cancelled
    progress: dict = dataclasses.field(default_factory=dict)
    output: str | None = None
    error: str | None = None
    created: float = dataclasses.field(default_factory=time.time)
    started: float | None = None
    finished: float | None = None
    # control events (pause set = suspended; the reference's suspend_flag)
    pause_ev: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False)
    cancel_ev: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False)

    def cancel_check(self, poll_s: float = 0.2) -> Callable[[], bool]:
        """A pipelines-compatible ``cancel_check``: returns True to stop,
        blocks while paused (suspension IS the callback not returning —
        same contract as utils.observability.make_control_check)."""

        def check() -> bool:
            while True:
                if self.cancel_ev.is_set():
                    return True
                if not self.pause_ev.is_set():
                    return False
                if self.status == "running":
                    self.status = "paused"
                time.sleep(poll_s)

        return check

    def snapshot(self) -> dict:
        return {
            "id": self.id, "kind": self.kind, "status": self.status,
            "params": {k: v for k, v in self.params.items()},
            "progress": dict(self.progress), "output": self.output,
            "error": self.error, "created": self.created,
            "started": self.started, "finished": self.finished,
        }


class JobManager:
    """FIFO of long operations, one worker thread (see module docstring).

    ``runners`` maps job.kind -> callable(job) -> output path (or None).
    A runner reports progress by mutating ``job.progress`` and honors
    ``job.cancel_check()``; raising marks the job failed.
    """

    def __init__(self, runners: dict[str, Callable[[Job], Any]]):
        self._runners = runners
        self._jobs: list[Job] = []
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- API used by the HTTP layer ------------------------------------
    def submit(self, kind: str, params: dict) -> Job:
        if kind not in self._runners:
            raise ValueError(f"unknown job kind: {kind!r}")
        job = Job(next(self._ids), kind, params)
        with self._lock:
            self._jobs.append(job)
        self._wake.set()
        return job

    def get(self, job_id: int) -> Job | None:
        with self._lock:
            for j in self._jobs:
                if j.id == job_id:
                    return j
        return None

    def control(self, job_id: int, action: str) -> bool:
        job = self.get(job_id)
        if job is None:
            return False
        if action == "pause":
            job.pause_ev.set()
        elif action == "resume":
            job.pause_ev.clear()
            if job.status == "paused":
                job.status = "running"
        elif action == "cancel":
            job.cancel_ev.set()
            job.pause_ev.clear()  # unblock a paused job so it can exit
            if job.status == "queued":
                job.status = "cancelled"
                job.finished = time.time()
        else:
            raise ValueError(f"unknown action: {action!r}")
        return True

    def snapshot(self) -> list[dict]:
        with self._lock:
            return [j.snapshot() for j in self._jobs]

    def shutdown(self) -> None:
        self._stop = True
        self._wake.set()

    # -- worker ---------------------------------------------------------
    def _next_queued(self) -> Job | None:
        with self._lock:
            for j in self._jobs:
                if j.status == "queued":
                    return j
        return None

    def _run(self) -> None:
        while not self._stop:
            job = self._next_queued()
            if job is None:
                self._wake.wait(timeout=0.2)
                self._wake.clear()
                continue
            job.status = "running"
            job.started = time.time()
            try:
                out = self._runners[job.kind](job)
                if job.cancel_ev.is_set():
                    job.status = "cancelled"
                else:
                    job.status = "done"
                    if out is not None:
                        job.output = str(out)
            except Exception as e:  # surfaced in the UI, like the
                job.status = "error"  # reference's crash log excepthook
                job.error = f"{type(e).__name__}: {e}"
                job.progress["traceback"] = traceback.format_exc(limit=8)
            finally:
                job.finished = time.time()
