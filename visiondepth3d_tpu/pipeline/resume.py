"""Checkpoint / resume for chunked renders.

The reference has no mid-render resume (SURVEY.md §5); the only cross-frame
state in the stereo stage is the EMA tracker pytree, so checkpointing is
just (frame_index, trackers) -> npz sidecar. A resumed render seeks to the
frame index, restores the trackers and continues bit-identically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax

from ..state.trackers import StereoTrackers


def checkpoint_path(output_path) -> Path:
    return Path(str(output_path) + ".resume.npz")


def save_checkpoint(output_path, frame_index: int, trackers: StereoTrackers) -> None:
    leaves, treedef = jax.tree.flatten(trackers)
    np.savez(
        checkpoint_path(output_path),
        frame_index=np.int64(frame_index),
        n_leaves=np.int64(len(leaves)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_checkpoint(output_path, template: StereoTrackers):
    """Returns (frame_index, trackers) or None if no checkpoint exists."""
    p = checkpoint_path(output_path)
    if not p.exists():
        return None
    data = np.load(p)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree.flatten(template)
    trackers = jax.tree.unflatten(treedef, leaves)
    return int(data["frame_index"]), trackers


def clear_checkpoint(output_path) -> None:
    checkpoint_path(output_path).unlink(missing_ok=True)


def truncate_y4m_to(path, n_frames: int) -> None:
    """Truncate a .y4m file to exactly n_frames.

    The written file may be ahead of the last checkpoint (the encoder flush
    lags the compute by one chunk); resume truncates to the checkpointed
    frame count so the appended continuation never duplicates frames.
    """
    p = Path(path)
    with p.open("rb") as f:
        header = f.readline()
        import re

        m_w = re.search(rb"W(\d+)", header)
        m_h = re.search(rb"H(\d+)", header)
        w, h = int(m_w.group(1)), int(m_h.group(1))
    frame_bytes = 6 + w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2))
    import os

    os.truncate(p, len(header) + n_frames * frame_bytes)
