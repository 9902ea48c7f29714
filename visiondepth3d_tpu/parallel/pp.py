"""Device-side stage pipeline parallelism (stage-PP).

The reference's only pipelining is a host-side prefetch queue
(merged_pipeline.py:85-104); round 1 added host-side encode/compute
overlap. This module adds the device-side analog required by SURVEY §2.8
("PP across pipeline stages"): the mesh is split into two slices — depth
inference runs on slice A while the stereo composition of the PREVIOUS
chunk runs on slice B. JAX's asynchronous dispatch software-pipelines the
two stages: at steady state both slices are busy every step, and the
inter-stage hand-off is a device-to-device transfer (ICI on a pod).

Shape contract:
  depth_fn(frames)            -> depths          (runs on slice A)
  stage_b_fn(carry, frames, depths) -> (carry, out)   (runs on slice B)

Batches are sharded over each slice's "dp" axis; the carry (EMA tracker
pytree) stays resident on slice B.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TwoStagePipeline:
    def __init__(self, devices, split: int, depth_fn, stage_b_fn,
                 batch_spec: P = P("dp")):
        """devices: flat device list; split: how many go to stage A.

        depth_fn / stage_b_fn are plain (un-jitted) callables; they are
        jitted here with shardings pinned to their slice so XLA compiles
        one program per stage and the runtime can execute them
        concurrently on disjoint devices.
        """
        if not 0 < split < len(devices):
            raise ValueError(f"split {split} of {len(devices)} devices")
        self.mesh_a = Mesh(np.asarray(devices[:split]), ("dp",))
        self.mesh_b = Mesh(np.asarray(devices[split:]), ("dp",))
        self.sh_a = NamedSharding(self.mesh_a, batch_spec)
        self.sh_b = NamedSharding(self.mesh_b, batch_spec)
        self._depth = jax.jit(depth_fn, out_shardings=self.sh_a)
        self._stage_b = jax.jit(stage_b_fn)

    def run(self, chunks, carry):
        """Software-pipelined drive: yields stage-B outputs per chunk.

        chunks: iterable of frame batches (host or device arrays). The
        depth of chunk i+1 is enqueued on slice A before stage B of chunk
        i is consumed — with async dispatch both execute concurrently.
        """
        pending = None
        for frames in chunks:
            fa = jax.device_put(frames, self.sh_a)
            d = self._depth(fa)
            if pending is not None:
                fb, db = pending
                carry, out = self._stage_b(carry, fb, db)
                yield out
            # inter-stage hand-off: slice A -> slice B (ICI transfer),
            # asynchronous — overlaps with the next depth dispatch
            pending = (
                jax.device_put(frames, self.sh_b),
                jax.device_put(d, self.sh_b),
            )
        if pending is not None:
            fb, db = pending
            carry, out = self._stage_b(carry, fb, db)
            yield out
