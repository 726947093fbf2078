"""Rank copy/transpose ops in the optimized TPU HLO of the full C48 step.

The two round-3 relayout-storm fixes (chans fence, CopyOp halo default)
were found by exactly this count; this script makes the method repeatable.
Usage: python scripts/hlo_copies.py [N [top]]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _wait_for_backend

_wait_for_backend()

import jax
import jax.numpy as jnp

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.utils.gridtools import GridSizing

n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
nz = 79

sizing = GridSizing(n, nz)
gd = generate_grid_data(n, nz, dtype=jnp.float32)
config = DynamicalCoreConfig(
    do_sat_adj=False,
    k_split=int(os.environ.get("PACE_BENCH_KSPLIT", "1")),
    n_split=int(os.environ.get("PACE_BENCH_NSPLIT", "2")),
)
core = DynamicalCore(config, sizing, gd, timestep=450.0)
state = init_baroclinic_state(sizing, dtype=jnp.float32)

step = jax.jit(lambda s: core.step_dynamics(s), donate_argnums=0)
txt = step.lower(state).compile().as_text()

DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1,
               "bf16": 2, "s8": 1, "u8": 1, "f16": 2, "s64": 8}


def shape_bytes(shape: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape)
    if not m:
        return 0
    bt = DTYPE_BYTES.get(m.group(1), 4)
    dims = m.group(2)
    total = bt
    for d in dims.split(","):
        if d:
            total *= int(d)
    return total


rows = []
tot = {"copy": 0, "transpose": 0, "all": 0}
for line in txt.splitlines():
    ls = line.strip()
    if " = " not in ls:
        continue
    lhs, rhs = ls.split(" = ", 1)
    # op name: first lowercase identifier followed by '(' that comes
    # right after the type string (shapes/layouts may themselves contain
    # parens, e.g. {1,0:T(8,128)S(1)}, so anchor on ']' or '}' before it)
    m = re.search(r"[}\])]\s+([a-z][\w-]*)\(", rhs)
    if not m:
        m = re.match(r"\s*([a-z][\w-]*)\(", rhs)
    if not m:
        continue
    op = m.group(1)
    nbytes = sum(shape_bytes(s) for s in
                 re.findall(r"\w+\[[\d,]*\]", rhs[:m.start() + 1]))
    tot["all"] += nbytes
    if op in ("copy", "transpose"):
        tot[op] += nbytes
        rows.append((nbytes, op, ls[:160]))

rows.sort(reverse=True)
print(f"total copy bytes:      {tot['copy'] / 1e9:.3f} GB")
print(f"total transpose bytes: {tot['transpose'] / 1e9:.3f} GB")
print(f"total output bytes (all ops): {tot['all'] / 1e9:.3f} GB")
print(f"\ntop {top} copy/transpose ops:")
for nbytes, op, ls in rows[:top]:
    print(f"{nbytes / 1e6:10.1f} MB  {op:9s}  {ls[:150]}")

# ---- output bytes grouped by source location (fusion-target ranking) ----
# Only ops at the top level of the entry/while/cond computations are
# counted: a fusion CALL's output is one HBM write, while ops inside
# %fused_computation bodies stay in registers/VMEM and would massively
# over-attribute bytes to whatever line the fused elementwise op cites.
by_src = {}
in_fusion_body = False
for line in txt.splitlines():
    ls = line.strip()
    if ls.endswith("{") and "(" in ls and " = " not in ls:
        # computation header, e.g. `%fused_computation.7 (p0: ...) -> ... {`
        in_fusion_body = ls.lstrip("%").startswith(("fused", "region"))
        continue
    if ls == "}":
        in_fusion_body = False
        continue
    if in_fusion_body:
        continue
    if " = " not in ls or "source_file=" not in ls:
        continue
    m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', ls)
    if not m:
        m2 = re.search(r'source_file="([^"]+)"', ls)
        key = m2.group(1) if m2 else "?"
    else:
        key = f"{m.group(1)}:{m.group(2)}"
    key = key.replace("/root/repo/", "")
    rhs = ls.split(" = ", 1)[1]
    om = re.search(r"[}\])]\s+([a-z][\w-]*)\(", rhs) or \
        re.match(r"\s*([a-z][\w-]*)\(", rhs)
    if not om:
        continue
    nbytes = sum(shape_bytes(s) for s in
                 re.findall(r"\w+\[[\d,]*\]", rhs[:om.start() + 1]))
    by_src[key] = by_src.get(key, 0) + nbytes

print(f"\ntop {top} source locations by HLO output bytes:")
for key, nbytes in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]:
    print(f"{nbytes / 1e9:8.2f} GB  {key}")
