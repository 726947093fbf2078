"""North star 4: a defensible projected step time for C192 sharded over
a v5p-16-class slice (VERDICT r3 next-round #5).

No multi-chip hardware is reachable from this environment, so the
projection combines three measurable ingredients:

1. **Measured compute rate** — the C48/79 f32 production-configured step
   (k_split=2, n_split=6) measured on the real single v5e chip
   (scripts/flag_matrix.sh row "prod_k2n6", or PACE_C48_K2N6_MS env).
   The dycore's per-cell work is resolution-independent (same ops per
   cell per substep), so the measured ms/step calibrates
   bytes-and-flops-per-cell-per-substep at the achieved (not peak)
   HBM efficiency of this exact program on this exact hardware class.
2. **Per-device domain scaling** — under the global-(6,N,N,nz) GSPMD
   layout at layout (6, ly, lx), each device owns one
   (1, N/ly, N/lx) block.  Projected per-device compute time =
   measured_C48_step * (device cells at C192) / (C48 single-chip
   cells), with nz and the acoustic substep count held equal (both
   configs k2/n6).
3. **Measured collective traffic** — the optimized-HLO collective
   census (the machinery of tests/test_collective_bytes.py) of the
   REAL C192 step partitioned over a virtual (6,2,2) mesh; backend-
   independent, so CPU virtual devices give the exact per-step
   collective bytes GSPMD will issue on the pod.  Time = bytes /
   (ICI_GBps * efficiency), assumed NOT overlapped (conservative).

Prints one JSON line; also verifies the C192 graph partitions (the
compile is the same artifact the memory-feasibility test pins).

Usage:
  PACE_C48_K2N6_MS=<measured> python scripts/c192_projection.py
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LAYOUT = (6, 2, 2)
_NDEV = 24

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_NDEV}"
    ).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

_COLLECTIVE_RE = re.compile(
    r"= (\w+)\[([\d,]*)\][^\n]*?"
    r"(collective-permute|all-gather|all-to-all|all-reduce)\("
)
_DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}

# v5p per-chip ICI: ~4.8 TB/s aggregate over 6 links (3D torus); a
# conservative per-exchange effective rate for neighbor permutes:
ICI_EFF_GBPS = 100.0
V5E_HBM_GIB = 15.75
V5P_HBM_GIB = 95.0


def collective_bytes_c192():
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.state import DycoreState, FIELD_METADATA, Z, ZI
    from pace_tpu.utils.gridtools import GridSizing

    cache_dir = os.environ.get(
        "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n, nz = 192, 79
    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float32)
    config = DynamicalCoreConfig(do_sat_adj=False, k_split=2, n_split=6)
    core = DynamicalCore(config, sizing, gd, timestep=225.0)

    devices = np.array(jax.devices()[:_NDEV]).reshape(_LAYOUT)
    mesh = Mesh(devices, ("tile", "x", "y"))
    example = {}
    for name, (_, dims, _) in FIELD_METADATA.items():
        shape = [6, sizing.N, sizing.N]
        if dims[-1] == Z:
            shape.append(nz)
        elif dims[-1] == ZI:
            shape.append(nz + 1)
        example[name] = jax.ShapeDtypeStruct(
            tuple(shape), jnp.float32,
            sharding=NamedSharding(mesh, P("tile", "x", "y")),
        )
    state = DycoreState(**example)
    lowered = jax.jit(core.step_dynamics, donate_argnums=0).lower(state)
    compiled = lowered.compile()
    txt = compiled.as_text()
    per_kind = {}
    for m in _COLLECTIVE_RE.finditer(txt):
        dtype, shape, kind = m.group(1), m.group(2), m.group(3)
        elems = int(np.prod(
            [int(s) for s in shape.split(",") if s] or [1]))
        per_kind[kind] = per_kind.get(kind, 0) + elems * _DTYPE_BYTES.get(
            dtype, 4)
    ma = compiled.memory_analysis()
    gib = 1024.0 ** 3
    peak_gib = (
        ma.temp_size_in_bytes + ma.output_size_in_bytes
        + ma.argument_size_in_bytes - ma.alias_size_in_bytes) / gib
    return per_kind, peak_gib, sizing.N


def main():
    c48_ms = float(os.environ.get("PACE_C48_K2N6_MS", "0"))
    if c48_ms <= 0:
        sys.exit("set PACE_C48_K2N6_MS to the measured C48 k2/n6 ms/step "
                 "(scripts/flag_matrix.sh row prod_k2n6)")

    per_kind, peak_gib, n192 = collective_bytes_c192()

    # device cells: C48 single chip holds all 6 tiles of a padded 56^2;
    # C192 at (6,2,2) holds one tile's 100x100 half-block
    from pace_tpu.utils.gridtools import GridSizing
    n48 = GridSizing(48, 79).N
    c48_cells = 6 * n48 * n48
    c192_dev_cells = (n192 // 2) * (n192 // 2)
    compute_ms = c48_ms * c192_dev_cells / c48_cells

    coll_bytes = sum(per_kind.values())
    # census text sums over ALL devices' instructions once (SPMD: one
    # program, per-device tensors) -> bytes are already per-device
    coll_ms = coll_bytes / (ICI_EFF_GBPS * 1e9) * 1e3

    total_ms = compute_ms + coll_ms
    out = {
        "metric": "c192_projected_step_ms",
        "layout": list(_LAYOUT),
        "calibration_c48_k2n6_ms": c48_ms,
        "compute_ms": round(compute_ms, 2),
        "collective_bytes_per_dev": coll_bytes,
        "collective_ms_unoverlapped": round(coll_ms, 3),
        "projected_step_ms": round(total_ms, 2),
        "per_kind_bytes": per_kind,
        "peak_gib_per_device": round(peak_gib, 2),
        "fits_v5e": peak_gib < V5E_HBM_GIB,
        "fits_v5p": peak_gib < V5P_HBM_GIB,
        "ici_eff_gbps_assumed": ICI_EFF_GBPS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
