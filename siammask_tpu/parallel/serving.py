"""Multi-chip batched tracking/segmentation serving.

The reference serves one video per GPU process and tracks multiple objects
sequentially inside it (`tools/test.py:481-504` — a python loop over
`siamese_track` calls). The TPU-native serving layout runs N independent
object streams in lockstep as ONE program: streams are a vmapped batch axis
(`Tracker.step_batched` / `_scan_multi_jit`), and this module shards that
axis over a device mesh — parameters and the incoming frame replicate,
per-stream `TrackState` and per-stream outputs shard on ``data``.

The vmapped step is embarrassingly parallel over streams, so the partitioned
hot loop contains NO collectives: ICI carries only the initial state scatter
and the output fetch. Scaling is therefore linear in chips for batched
serving (each chip runs the measured 52.8%-MFU 16-stream layout locally);
validated for semantics on a virtual device mesh in
tests/test_serving_sharded.py — outputs match the unsharded batched tracker
exactly and the compiled scan contains no all-reduce/all-gather.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from siammask_tpu.parallel.mesh import data_parallel_mesh


class ShardedStreamServer:
    """Serve O object streams sharded over ``mesh``'s ``data`` axis.

    O must be a multiple of the mesh size (pad with dummy streams to round
    up — streams are independent, so dummies cost only their own compute).
    One compiled program per (O, frame geometry); XLA caches across calls.
    """

    def __init__(self, tracker, mesh: Mesh | None = None):
        self.tracker = tracker
        self.mesh = mesh if mesh is not None else data_parallel_mesh()
        self._repl = NamedSharding(self.mesh, P())
        self._stream = NamedSharding(self.mesh, P("data"))       # state leaves
        self._out = NamedSharding(self.mesh, P(None, "data"))    # (T, O, ...)

        step = jax.vmap(tracker._step_impl_multi, in_axes=(None, 0, None))

        def scan(variables, states, frames):
            def body(st, frame):
                return step(variables, st, frame)

            return jax.lax.scan(body, states, frames)

        self._scan = jax.jit(
            scan,
            in_shardings=(self._repl, self._stream, self._repl),
            out_shardings=(self._stream, self._out))

        def one(variables, states, frame):
            return step(variables, states, frame)

        self._step = jax.jit(
            one,
            in_shardings=(self._repl, self._stream, self._repl),
            out_shardings=(self._stream, self._stream))

    def init_batched(self, variables, frame, target_pos, target_sz):
        """Init O streams on one frame and scatter the state over the mesh."""
        if len(target_pos) % self.mesh.size != 0:
            raise ValueError(
                f"streams ({len(target_pos)}) must be a multiple of the mesh "
                f"size ({self.mesh.size}); pad with dummy streams")
        states = self.tracker.init_batched(variables, frame, target_pos,
                                           target_sz)
        return jax.device_put(states, self._stream)

    def step(self, variables, states, frame):
        """One frame for all streams; state stays sharded on device."""
        return self._step(variables, states, frame)

    def track_video(self, variables, states, frames):
        """Whole-video scan for all streams: (final_states, outputs) with
        outputs stacked (T, O, ...) and sharded on the stream axis."""
        return self._scan(variables, states, frames)
