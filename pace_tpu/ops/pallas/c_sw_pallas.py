"""Fused Pallas form of the C-grid shallow-water half step.

Runs the ops/c_sw.py math inside two row-chunked whole-tile kernels via
the tile_stencil harness (one kernel exceeds the ~16 MB scoped-VMEM
budget at C48):

  K1: d2a2c + corner divergence  (deep shift reach from the corner
      fills feeding the A->C cubics: halo 10)
  K2: transport + ke/vorticity + C-wind update (reach <= 6)

Every shifted intermediate lives in VMEM, so HBM traffic collapses to
one read of the inputs (x the row-overlap factor) plus one write of the
outputs.  Reference behavior: ai2cm/pace
fv3core/pace/fv3core/stencils/c_sw.py.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax

from pace_tpu.ops.pallas.tile_stencil import tile_stencil_call

HALO_K1 = 10
HALO_K2 = 6

_MET2 = (
    "cosa_s", "rsin2", "cosa_u", "rsin_u", "cosa_v", "rsin_v", "dxa",
    "dya", "rarea", "dx", "dy", "dxc", "dyc", "rarea_c", "fC", "sina_v",
    "sina_u", "rdxc", "rdyc",
)
_MET_K1 = ("cosa_s", "rsin2", "cosa_u", "rsin_u", "cosa_v", "rsin_v",
           "dxa", "dya", "dxc", "dyc", "rarea_c")
_MET_K2 = ("rarea", "dx", "dy", "dxc", "dyc", "rarea_c", "fC", "cosa_v",
           "sina_v", "cosa_u", "sina_u", "rdxc", "rdyc")


def enabled() -> bool:
    """Off by default: the fused c_sw kernels are numerically validated
    (tests/test_tile_stencil.py) but REJECTED on-chip — the 2026-08-19
    flag matrix run fails Mosaic compile with "result/input offset
    mismatch on non-concat dimension" (the wide multi-input blocks mix
    offsets Mosaic cannot reconcile).  Opt in with PACE_PALLAS_CSW=1
    only after splitting the bodies finer."""
    return os.environ.get("PACE_PALLAS_CSW") == "1"


def _pick_xb(N: int) -> int:
    """Largest row-chunk <= 12 that divides N (VMEM vs overlap-factor
    tradeoff for ~20 live (XB+2*halo, N, nz) blocks)."""
    for xb in range(12, 0, -1):
        if N % xb == 0:
            return xb
    return 1


def _mets(gm, keys):
    return [getattr(gm, k) for k in keys]


def c_sw_fused(delp, pt, u, v, w, gd, n, h, dt2, nord,
               interpret: bool = False):
    from pace_tpu.ops.c_sw import c_sw_metrics, c_sw_part1, c_sw_part2

    N, nz = delp.shape[1], delp.shape[-1]
    XB = _pick_xb(N)
    gm = c_sw_metrics(gd)

    def body1(ops, valid, u_b, v_b, *mb):
        m = SimpleNamespace(
            **dict(zip(_MET_K1, mb[:len(_MET_K1)])),
            sin_sg=mb[len(_MET_K1)], cos_sg=mb[len(_MET_K1) + 1],
        )
        return c_sw_part1(ops, u_b, v_b, m, n, h, nord)

    uc, vc, ua, va, ut, vt, divgd = tile_stencil_call(
        body1, [u, v] + _mets(gm, _MET_K1) + [gm.sin_sg, gm.cos_sg],
        [3] * 7, N=N, nz=nz, XB=XB, halo=HALO_K1, dtype=delp.dtype,
        interpret=interpret, name="c_sw_p1",
    )

    def body2(ops, valid, *blocks):
        fb = blocks[:11]
        mb = blocks[11:]
        m = SimpleNamespace(
            **dict(zip(_MET_K2, mb[:len(_MET_K2)])),
            sin_sg=mb[len(_MET_K2)], cos_sg=mb[len(_MET_K2) + 1],
        )
        return c_sw_part2(ops, *fb, m, n, h, dt2)

    (delpc, ptc, uc2, vc2, ut2, vt2, omga, delp_f, pt_f, w_f) = (
        tile_stencil_call(
            body2,
            [delp, pt, w, u, v, uc, vc, ua, va, ut, vt]
            + _mets(gm, _MET_K2) + [gm.sin_sg, gm.cos_sg],
            [3] * 10, N=N, nz=nz, XB=XB, halo=HALO_K2, dtype=delp.dtype,
            interpret=interpret, name="c_sw_p2",
        )
    )
    return (delpc, ptc, uc2, vc2, ua, va, ut2, vt2, divgd, omga, delp_f,
            pt_f, w_f)
