"""Savepoint ("translate") test harness for Fortran-serialized data.

Reads the reference's savepoint NetCDF format — per-test
``<Savepoint>-In.nc`` / ``<Savepoint>-Out.nc`` files with
``(rank, savepoint, ...)`` dimensions plus a ``Grid-Info.nc`` — runs a
registered operator on the assembled global cube arrays, and compares
the outputs against the Fortran reference with the relative/near-zero
error metric and per-test threshold overrides.

TPU-native counterpart of ai2cm/pace's translate framework
(stencils/pace/stencils/testing/translate.py:53 TranslateFortranData2Py,
savepoint.py:32 SavepointCase, conftest.py:157-180 file discovery,
test_translate.py threshold handling).  Key differences by design:

- storage is the global (6, N, N, nz) cube layout, so a translate case
  assembles all ranks of a tile-decomposed savepoint into one array and
  runs the whole-cube op once (per-rank slices come back out for the
  comparison) instead of running one rank at a time;
- NetCDF3 via scipy (no xarray/netCDF4 in the image; same on-disk
  format).

Threshold overrides follow the reference YAML schema
(fv3core/tests/savepoint/translate/overrides/baroclinic.yaml):

    TestName:
      - backend: all
        max_error: 1e-12
        near_zero: 1e-15
        ignore_near_zero_errors: [qcld, q_con]
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pace_tpu.utils import testing
from pace_tpu.utils.netcdf import read_dataset_with_dims, write_dataset


def _select_axes(arr: np.ndarray, dims: Tuple[str, ...], rank: int,
                 i_call: int) -> np.ndarray:
    """Index away leading 'rank' and 'savepoint' axes when present."""
    out = arr
    # index in reverse order so positions stay valid
    positions = []
    for name, idx in (("rank", rank), ("savepoint", i_call)):
        if name in dims:
            positions.append((dims.index(name), idx))
    for pos, idx in sorted(positions, reverse=True):
        out = np.take(out, idx, axis=pos)
    return out


class SavepointDataset:
    """One savepoint's -In.nc/-Out.nc pair.

    ``inputs(rank, i_call)`` / ``outputs(rank, i_call)`` return dicts of
    numpy arrays (scalars unwrapped), the analogue of the reference's
    ``SavepointCase.ds_in/ds_out`` (savepoint.py:49-63)."""

    def __init__(self, data_dir: str, name: str):
        self.name = name
        self.data_dir = data_dir
        self._in = read_dataset_with_dims(
            os.path.join(data_dir, f"{name}-In.nc"))
        out_path = os.path.join(data_dir, f"{name}-Out.nc")
        self._out = (
            read_dataset_with_dims(out_path)
            if os.path.exists(out_path) else None
        )

    @property
    def n_ranks(self) -> int:
        arrays, dims = self._in
        for name, d in dims.items():
            if "rank" in d:
                return arrays[name].shape[d.index("rank")]
        return 1

    @property
    def n_calls(self) -> int:
        arrays, dims = self._in
        for name, d in dims.items():
            if "savepoint" in d:
                return arrays[name].shape[d.index("savepoint")]
        return 1

    def _get(self, pair, rank: int, i_call: int) -> Dict[str, np.ndarray]:
        arrays, dims = pair
        out = {}
        for name, arr in arrays.items():
            sel = _select_axes(arr, dims[name], rank, i_call)
            out[name] = sel.item() if sel.ndim == 0 else sel
        return out

    def inputs(self, rank: int, i_call: int = 0) -> Dict[str, np.ndarray]:
        return self._get(self._in, rank, i_call)

    def outputs(self, rank: int, i_call: int = 0) -> Dict[str, np.ndarray]:
        if self._out is None:
            raise FileNotFoundError(f"{self.name}-Out.nc not present")
        return self._get(self._out, rank, i_call)


def discover_savepoints(data_dir: str) -> List[str]:
    """Savepoint names present in a data directory (conftest.py:178)."""
    names = []
    for fname in sorted(os.listdir(data_dir)):
        if fname.endswith("-In.nc"):
            names.append(fname[: -len("-In.nc")])
    return names


def load_threshold_overrides(path: Optional[str]) -> Dict[str, dict]:
    """Parse the reference's threshold-overrides YAML (test_translate.py
    ``--threshold_overrides_file``): name -> {max_error, near_zero,
    ignore_near_zero_errors}."""
    if path is None:
        return {}
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    out = {}
    for name, entries in raw.items():
        if isinstance(entries, dict):
            entries = [entries]
        for entry in entries:
            if entry.get("backend", "all") not in ("all", "tpu", "jax"):
                continue
            out[name] = {
                "max_error": float(entry.get("max_error", 1e-14)),
                "near_zero": float(entry.get("near_zero", 1e-18)),
                "ignore_near_zero_errors": entry.get(
                    "ignore_near_zero_errors", []),
            }
    return out


@dataclasses.dataclass
class VarSpec:
    """Layout of one savepoint variable.

    Fortran savepoint arrays are per-rank (i, j, k) blocks including
    halos; `istart/jstart` give the storage offset of the block's first
    point in our (tile, i, j, k) global cube (0 = first halo row for
    halo-inclusive fields, `halo` for compute-domain-only fields)."""

    serialname: Optional[str] = None   # name in the savepoint file
    istart: int = 0
    jstart: int = 0
    kstart: int = 0


class TranslateCase:
    """Base translate case: assemble global arrays from all ranks, run
    `compute`, slice per-rank outputs back, compare against -Out.

    Subclasses set `in_vars` / `out_vars` ({name: VarSpec}) and implement
    `compute(inputs) -> outputs` on global (6, N, N[, nz]) arrays.
    Mirrors TranslateFortranData2Py.compute/slice_output
    (translate.py:75-260) for the 1-rank-per-tile decomposition."""

    max_error = 1e-14
    near_zero = 1e-18
    ignore_near_zero_errors: Sequence[str] = ()

    def __init__(self, sizing, dtype=np.float64):
        self.sizing = sizing
        self.dtype = dtype
        self.in_vars: Dict[str, VarSpec] = {}
        self.out_vars: Dict[str, VarSpec] = {}

    # -- assembly ----------------------------------------------------------
    def _storage_shape(self):
        N = self.sizing.N
        return (6, N, N)

    def assemble(self, per_rank: List[Dict[str, np.ndarray]]):
        """Per-rank Fortran blocks -> global (6, N, N[, nz]) arrays.

        Supports the 6-rank (one tile per rank) decomposition; each
        rank's block lands at its VarSpec offsets on its tile."""
        if len(per_rank) != 6:
            raise NotImplementedError(
                "translate assembly supports the 6-rank (layout 1x1) "
                f"decomposition; got {len(per_rank)} ranks"
            )
        out = {}
        for name, spec in self.in_vars.items():
            sname = spec.serialname or name
            blocks = [r[sname] for r in per_rank]
            b0 = np.asarray(blocks[0])
            if b0.ndim == 0:
                out[name] = b0.item()
                continue
            shape = self._storage_shape() + tuple(b0.shape[2:])
            arr = np.zeros(shape, self.dtype)
            for t, b in enumerate(blocks):
                b = np.asarray(b)
                arr[
                    t,
                    spec.istart:spec.istart + b.shape[0],
                    spec.jstart:spec.jstart + b.shape[1],
                ] = b
            out[name] = arr
        return out

    def slice_output(self, name: str, global_arr: np.ndarray,
                     ref_block: np.ndarray, rank: int) -> np.ndarray:
        """Extract the (i, j[, k]) block matching the reference layout."""
        spec = self.out_vars[name]
        return np.asarray(global_arr)[
            rank,
            spec.istart:spec.istart + ref_block.shape[0],
            spec.jstart:spec.jstart + ref_block.shape[1],
        ]

    def compute(self, inputs: Dict) -> Dict:
        raise NotImplementedError

    # -- validation --------------------------------------------------------
    def validate(self, dataset: SavepointDataset, i_call: int = 0,
                 overrides: Optional[dict] = None) -> Dict[str, float]:
        """Run the case against one savepoint call; returns max metric
        error per output variable; raises AssertionError on failure."""
        cfg = overrides or {}
        max_error = cfg.get("max_error", self.max_error)
        near_zero = cfg.get("near_zero", self.near_zero)
        ignore_nz = set(cfg.get("ignore_near_zero_errors",
                                self.ignore_near_zero_errors))
        per_rank = [dataset.inputs(r, i_call) for r in range(6)]
        inputs = self.assemble(per_rank)
        outputs = self.compute(inputs)
        errors = {}
        failures = []
        for name in self.out_vars:
            sname = self.out_vars[name].serialname or name
            worst = 0.0
            for rank in range(6):
                ref = np.asarray(dataset.outputs(rank, i_call)[sname])
                got = self.slice_output(name, outputs[name], ref, rank)
                ok = testing.success_array(
                    got.astype(np.float64), ref.astype(np.float64),
                    max_error, name in ignore_nz, near_zero,
                )
                err = testing.compare_arr(
                    got.astype(np.float64), ref.astype(np.float64))
                worst = max(worst, float(np.max(err)) if err.size else 0.0)
                if not ok.all():
                    bad = int((~ok).sum())
                    failures.append(
                        f"{name} rank {rank}: {bad}/{ok.size} points "
                        f"exceed max_error={max_error} "
                        f"(worst metric {float(np.max(err[~ok])):.3e})"
                    )
            errors[name] = worst
        if failures:
            raise AssertionError(
                f"{dataset.name}: " + "; ".join(failures))
        return errors


def write_savepoint(
    data_dir: str,
    name: str,
    inputs_per_rank: List[Dict[str, np.ndarray]],
    outputs_per_rank: Optional[List[Dict[str, np.ndarray]]] = None,
) -> None:
    """Write a savepoint pair in the reference's on-disk format
    ((rank, savepoint, ...) dims).  Used to produce interop data from
    this model (and to self-test the reader)."""
    os.makedirs(data_dir, exist_ok=True)

    def _write(suffix, per_rank):
        names = per_rank[0].keys()
        variables, dims = {}, {}
        for vname in names:
            stacked = np.stack(
                [np.asarray(r[vname]) for r in per_rank])[:, None]
            variables[vname] = stacked
            dims[vname] = ("rank", "savepoint") + tuple(
                f"dim_{vname}_{k}" for k in range(stacked.ndim - 2))
        write_dataset(
            os.path.join(data_dir, f"{name}-{suffix}.nc"), variables, dims)

    _write("In", inputs_per_rank)
    if outputs_per_rank is not None:
        _write("Out", outputs_per_rank)
