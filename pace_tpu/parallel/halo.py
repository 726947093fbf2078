"""Halo updates on global (6, N, N, ...) cubed-sphere arrays.

Functional, jit-safe replacements for the reference's
HaloUpdater.start()/wait() machinery (ai2cm/pace util/pace/util/
halo_updater.py:29): a halo update is a pure gather with precomputed index
maps from `CubedSphereTopology`.  Vector updates fuse the tile-edge rotation
(component swap + sign flip) into the gather, replacing the reference's raw
CUDA pack kernels (util/pace/util/cuda_kernels.py).

All functions accept arrays with any number of trailing dimensions after
(tile, i, j).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pace_tpu.parallel import copyops
from pace_tpu.parallel.copyops import apply_copy_ops as _apply_copy_ops
from pace_tpu.parallel.topology import CubedSphereTopology, HaloSpec

# Halo-update lowering is selected by PACE_HALO (see parallel/copyops.py):
# "ppermute" (CopyOp decomposition, SPMD-friendly, default) or "gather"
# (whole-array gathers).  The mode is read from copyops.HALO_MODE at call
# time so tests can flip it.  (A third "packed" strip-gather lowering was
# removed after measuring 2.2 ms/step slower than ppermute at C48 f32 on a
# v5e, 2026-08-19 flag matrix — VERDICT r3 #10.)

# Active halo-traffic recorder (parallel/traffic.py HaloTrafficRecorder —
# the CachingComm record/replay analogue).  None in production; set via
# the recorder's context manager for eager debug runs.
_RECORDER = None


def _expand(idx, ndim_extra):
    """Reshape a (6, N, N) index array so it broadcasts over trailing dims."""
    return idx.reshape(idx.shape + (1,) * ndim_extra)


def halo_update_scalar(q: jnp.ndarray, spec: HaloSpec) -> jnp.ndarray:
    """Fill edge halos of a scalar field. Corner wedges keep prior values."""
    if _RECORDER is not None and _RECORDER.mode == "replay":
        return _RECORDER.substitute(q, spec)
    if copyops.structured_enabled() and spec.structured is not None:
        out = _apply_copy_ops((q,), q, spec.structured)
        if _RECORDER is not None:
            _RECORDER.on_result(out, spec)
        return out
    out = q[spec.src_tile, spec.src_i, spec.src_j]
    if _RECORDER is not None:
        _RECORDER.on_result(out, spec)
    return out


def halo_update_scalars(
    topo: CubedSphereTopology, fields: Sequence[jnp.ndarray],
    stagger: str = "center",
) -> list:
    """Grouped scalar halo update (analogue of the reference's grouped
    HaloUpdater with multiple quantities, halo_updater.py:96).

    Under the structured CopyOp lowering, all fields ride ONE copy
    program by concatenating along the trailing (k) axis — the ops only
    touch the (tile, i, j) axes, so this is bit-exact and amortizes the
    per-band kernel overhead across the group (the halo updates are
    launch-bound at C48: ~1.1 ms per lone field vs ~1.4 ms for a
    3-field group, measured on a v5e)."""
    spec = topo.scalar_spec(stagger)
    if (
        len(fields) > 1
        and copyops.structured_enabled()
        and spec.structured is not None
        and _RECORDER is None
        and all(
            f.ndim == fields[0].ndim == 4 and f.dtype == fields[0].dtype
            for f in fields
        )
    ):
        splits = np.cumsum([f.shape[-1] for f in fields])[:-1]
        cat = jnp.concatenate(list(fields), axis=-1)
        out = _apply_copy_ops((cat,), cat, spec.structured)
        return list(jnp.split(out, splits, axis=-1))
    return [halo_update_scalar(f, spec) for f in fields]


def halo_update_vector(
    topo: CubedSphereTopology,
    u: jnp.ndarray,
    v: jnp.ndarray,
    u_stagger: str,
    v_stagger: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fill edge halos of a vector pair, rotating components across tile
    edges.  For D-grid winds use (u_stagger="y_iface", v_stagger="x_iface");
    C-grid ("x_iface", "y_iface"); A-grid ("center", "center")."""
    u_spec, v_spec = topo.vector_spec(u_stagger, v_stagger)
    return (
        _vector_gather(u, v, u_spec),
        _vector_gather(u, v, v_spec),
    )


def _vector_gather(u, v, spec: HaloSpec, apply_sign: bool = True):
    ndim_extra = u.ndim - 3
    if _RECORDER is not None and _RECORDER.mode == "replay":
        own = u if spec.kind.startswith(("vector0", "ifsync0")) else v
        return _RECORDER.substitute(own, spec)
    if copyops.structured_enabled() and spec.structured is not None:
        own = u if spec.kind.startswith(("vector0", "ifsync0")) else v
        out = _apply_copy_ops((u, v), own, spec.structured, apply_sign)
        if _RECORDER is not None:
            _RECORDER.on_result(out, spec)
        return out
    from_u = u[spec.src_tile, spec.src_i, spec.src_j]
    from_v = v[spec.src_tile, spec.src_i, spec.src_j]
    comp = _expand(spec.src_comp, ndim_extra)
    out = jnp.where(comp == 0, from_u, from_v)
    if apply_sign:
        out = _expand(spec.sign, ndim_extra).astype(u.dtype) * out
    if _RECORDER is not None:
        _RECORDER.on_result(out, spec)
    return out


def halo_update_staggered_pair(
    topo: CubedSphereTopology,
    a_u: jnp.ndarray,
    a_v: jnp.ndarray,
    u_stagger: str,
    v_stagger: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Halo update for a pair of scalar fields living on complementary
    staggered points (e.g. grid spacings dx on y-interfaces and dy on
    x-interfaces).  Across rotating tile edges the two arrays exchange roles
    exactly like vector components, but no sign flip is applied (the data is
    unoriented)."""
    u_spec, v_spec = topo.vector_spec(u_stagger, v_stagger)
    return (
        _vector_gather(a_u, a_v, u_spec, apply_sign=False),
        _vector_gather(a_u, a_v, v_spec, apply_sign=False),
    )


def synchronize_vector_interfaces(
    topo: CubedSphereTopology,
    u: jnp.ndarray,
    v: jnp.ndarray,
    u_stagger: str,
    v_stagger: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Make edge-shared interface points of a vector pair agree across tiles.

    Points on a tile's west/south compute-domain boundary are overwritten
    with the value from the neighboring tile that also holds them
    (reference: communicator.py:472-519 `synchronize_vector_interfaces`).
    """
    u_map, v_map = topo.interface_sync_map(u_stagger, v_stagger)
    return (
        _vector_gather(u, v, u_map),
        _vector_gather(u, v, v_map),
    )
