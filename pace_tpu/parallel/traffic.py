"""Record/replay of halo-exchange traffic — single-tile re-runs.

TPU-native analogue of the reference's CachingCommWriter/Reader
(ai2cm/pace util/pace/util/caching_comm.py:89-235), which records MPI
recv traffic so one rank of an N-rank run can be re-run alone for
debugging.  Here the "traffic" is the set of halo strips a tile receives
from its neighbors at each halo-update call: in record mode an eager
full-cube run stores every call's incoming strips; in replay mode a
single tile's state is stepped alone, with each halo update satisfied
verbatim from the recording instead of gathering from (absent)
neighbors.

Usage::

    rec = HaloTrafficRecorder.recording()
    with rec:
        out = step_fn(full_state)       # eager (not jitted) full run
    rec.save("traffic.npz")

    rep = HaloTrafficRecorder.load("traffic.npz").replaying(tile=3)
    with rep:
        out3 = step_fn(tile3_state)     # (1, N, N, ...) arrays

Record/replay runs execute eagerly: recording converts live results to
numpy (which a jit trace would reject), exactly like the reference's
comm callbacks staying outside DaCe orchestration
(dsl/dace/wrapped_halo_exchange.py).
"""

from __future__ import annotations

import io
from typing import List, Optional

import numpy as np


class HaloTrafficRecorder:
    """See module docstring.  `calls` holds one entry per halo-update
    array: ("strips", kind, [per-CopyOp strip arrays]) when the spec has
    a structured decomposition, else ("full", kind, full result)."""

    def __init__(self, mode: Optional[str] = None,
                 calls: Optional[List] = None, tile: Optional[int] = None):
        self.mode = mode
        self.calls = calls if calls is not None else []
        self.cursor = 0
        self.tile = tile

    # -- construction ------------------------------------------------------
    @classmethod
    def recording(cls) -> "HaloTrafficRecorder":
        return cls(mode="record")

    def replaying(self, tile: Optional[int] = None) -> "HaloTrafficRecorder":
        """Return a replay view (tile=None replays the full cube)."""
        return HaloTrafficRecorder(mode="replay", calls=self.calls, tile=tile)

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        arrays = {}
        meta = []
        for ci, (tag, kind, payload) in enumerate(self.calls):
            if tag == "strips":
                meta.append((tag, kind, len(payload)))
                for si, strip in enumerate(payload):
                    arrays[f"c{ci}_s{si}"] = strip
            else:
                meta.append((tag, kind, 1))
                arrays[f"c{ci}_s0"] = payload
        buf = io.BytesIO()
        np.savez_compressed(buf, meta=np.array(meta, dtype=object),
                            **arrays)
        with open(path, "wb") as f:
            f.write(buf.getvalue())

    @classmethod
    def load(cls, path: str) -> "HaloTrafficRecorder":
        with np.load(path, allow_pickle=True) as data:
            meta = data["meta"]
            calls = []
            for ci, (tag, kind, count) in enumerate(meta):
                if tag == "strips":
                    payload = [data[f"c{ci}_s{si}"]
                               for si in range(int(count))]
                else:
                    payload = data[f"c{ci}_s0"]
                calls.append((tag, kind, payload))
        return cls(mode=None, calls=calls)

    # -- activation --------------------------------------------------------
    def __enter__(self):
        from pace_tpu.parallel import halo

        if self.mode is None:
            raise ValueError(
                "activate a loaded recorder via .replaying(tile=...)")
        if halo._RECORDER is not None:
            raise RuntimeError("a HaloTrafficRecorder is already active")
        halo._RECORDER = self
        self.cursor = 0
        return self

    def __exit__(self, *exc):
        from pace_tpu.parallel import halo

        halo._RECORDER = None
        return False

    # -- record ------------------------------------------------------------
    def on_result(self, result, spec):
        """Called by the halo module with each update's eager result."""
        arr = np.asarray(result)
        if spec is not None and spec.structured:
            strips = [
                arr[op.dst_tile,
                    op.dst_i[0]:op.dst_i[1], op.dst_j[0]:op.dst_j[1]]
                for op in spec.structured
            ]
            self.calls.append(("strips", spec.kind, strips))
        else:
            kind = spec.kind if spec is not None else "full"
            self.calls.append(("full", kind, arr))
        return result

    # -- replay ------------------------------------------------------------
    def substitute(self, q, spec):
        """Next recorded call's strips written into q (verbatim, like the
        reference replaying recorded recv buffers)."""
        import jax.numpy as jnp
        from jax import lax

        if self.cursor >= len(self.calls):
            raise RuntimeError("replay exhausted: more halo updates than "
                               "were recorded")
        tag, kind, payload = self.calls[self.cursor]
        self.cursor += 1
        want = spec.kind if spec is not None else "full"
        if kind != want:
            raise RuntimeError(
                f"replay mismatch at call {self.cursor - 1}: recorded "
                f"{kind!r}, run requested {want!r}")
        single = q.shape[0] == 1 and self.tile is not None
        if tag == "full":
            full = jnp.asarray(payload, q.dtype)
            return full[self.tile:self.tile + 1] if single else full
        out = q
        zeros = (0,) * (q.ndim - 3)
        for op, strip in zip(spec.structured, payload):
            if single and op.dst_tile != self.tile:
                continue
            dst_t = 0 if single else op.dst_tile
            out = lax.dynamic_update_slice(
                out, jnp.asarray(strip, q.dtype)[None],
                (dst_t, op.dst_i[0], op.dst_j[0]) + zeros,
            )
        return out
