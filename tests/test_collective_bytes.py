"""SPMD collective-traffic pin for the halo exchange (VERDICT r1
next-round #3 "Done" criterion): under a real (tile, x, y) mesh, the
PACE_HALO=ppermute lowering must move ~halo-surface bytes in neighbor
collective-permutes — not tile-volume-sized generic collectives like the
whole-array gather (measured: 17.8 MB all-reduce vs 1.02 MB
collective-permute for a C48/79 scalar halo on a (2,2,2) mesh).

The reference architecture being matched: neighbor-wise exchange in
ai2cm/pace util/pace/util/halo_updater.py:217-300.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pace_tpu.parallel import copyops
from pace_tpu.parallel import halo as halo_mod
from pace_tpu.parallel.topology import get_topology

_COLLECTIVE_RE = re.compile(
    r"= (\w+)\[([\d,]*)\][^\n]*?"
    r"(collective-permute|all-gather|all-to-all|all-reduce)\("
)

_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def _collective_bytes(txt):
    """Per-kind summed tensor bytes of collective ops in optimized HLO."""
    out = {}
    for m in _COLLECTIVE_RE.finditer(txt):
        dtype, shape, kind = m.group(1), m.group(2), m.group(3)
        elems = int(np.prod([int(s) for s in shape.split(",") if s] or [1]))
        out[kind] = out.get(kind, 0) + elems * _DTYPE_BYTES.get(dtype, 4)
    return out


def test_ppermute_halo_collective_bytes():
    n, h, nz = 48, 3, 79
    topo = get_topology(n, h)
    N = topo.N
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("tile", "x", "y"))
    sh = NamedSharding(mesh, P("tile", "x", "y"))
    spec = topo.scalar_spec("center")
    q = jax.device_put(jnp.zeros((6, N, N, nz), jnp.float32), sh)

    totals = {}
    old = copyops.HALO_MODE
    try:
        for mode in ("gather", "ppermute"):
            copyops.HALO_MODE = mode
            f = jax.jit(lambda x: halo_mod.halo_update_scalar(x, spec),
                        out_shardings=sh)
            txt = f.lower(q).compile().as_text()
            totals[mode] = _collective_bytes(txt)
    finally:
        copyops.HALO_MODE = old

    gather_total = sum(totals["gather"].values())
    pp_total = sum(totals["ppermute"].values())
    if gather_total == 0 and pp_total == 0:
        pytest.skip("no collectives found in HLO text (format change?)")

    surface = 6 * 4 * n * h * nz * 4  # bytes
    # the ppermute lowering must be halo-surface-sized...
    assert pp_total <= 3 * surface, (
        f"ppermute halo moves {pp_total / 1e6:.2f} MB of collectives; "
        f"expected <= 3x halo surface ({3 * surface / 1e6:.2f} MB)"
    )
    # ...and must be dominated by neighbor permutes, not generic
    # gathers/reduces
    generic = sum(v for k, v in totals["ppermute"].items()
                  if k != "collective-permute")
    assert generic <= pp_total / 2, (
        f"ppermute halo uses {generic / 1e6:.2f} MB of non-permute "
        f"collectives: {totals['ppermute']}"
    )
    # and far below the gather lowering
    assert pp_total * 4 <= gather_total, (totals, surface)
