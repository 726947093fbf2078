"""Registered translate cases: reference savepoint names -> pace_tpu ops.

Self-validation loop for every case in pace_tpu.utils.translate_cases
(VERDICT r2 next-round #4): build physically-plausible global inputs
from the golden C12 run, run the case's compute, decompose inputs and
outputs into the reference's per-rank Fortran block layout, write a
savepoint pair (-In.nc/-Out.nc), then read it back through the harness
and `validate` — proving the variable names/offsets/kaxis handling and
the multi-rank assembly, so real Serialbox data can be consumed as-is.

Reference counterparts: fv3core/tests/savepoint/translate/ (39 classes),
stencils/pace/stencils/testing/translate.py:53-260,
parallel_translate.py:14 (multi-rank layouts).
"""

import numpy as np
import pytest

import pace_tpu.utils.translate_cases_grid  # noqa: F401  (registers)
import pace_tpu.utils.translate_cases_physics  # noqa: F401  (registers)
from pace_tpu.utils.translate import SavepointDataset, write_savepoint
from pace_tpu.utils.translate_cases import CASES

H = 3


def _smooth(shape, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    a = rng.randn(*shape)
    # smooth along the horizontal axes so PPM limiters see sane fields
    for ax in (1, 2):
        if a.shape[ax] >= 3:
            a = (np.roll(a, 1, ax) + a + np.roll(a, -1, ax)) / 3.0
    return scale * a


def _gz_from_delz(phis, delz):
    """Interface heights consistent with layer thicknesses: gz[..., nz]
    = surface, gz decreasing in k index toward the surface."""
    zs = phis / 9.80665
    below = np.cumsum(delz[..., ::-1], -1)[..., ::-1]
    return np.concatenate([zs[..., None] - below, zs[..., None]], -1)


def _build_inputs(name, sizing, gd, state0, state1, case=None):
    """Global input arrays for each registered case."""
    n, nz = sizing.n, sizing.nz
    s0 = {f: np.asarray(getattr(state0, f), np.float64)
          for f in ("u", "v", "w", "delp", "pt", "delz", "qvapor",
                    "qliquid", "qice", "qrain", "qsnow", "qgraupel",
                    "qcld", "ps", "pe", "pk", "peln", "pkz", "phis",
                    "q_con", "omga", "ua", "va", "uc", "vc", "mfxd",
                    "mfyd", "cxd", "cyd", "diss_estd")}
    s1 = {f: np.asarray(getattr(state1, f), np.float64) for f in s0}
    shape3 = s0["pt"].shape
    zero3 = np.zeros(shape3)

    if name == "XPPM":
        return {
            "q": s1["pt"], "c": _smooth(shape3, 1, 0.2), "iord": 8,
        }
    if name == "FvTp2d":
        return {
            "q": s1["pt"],
            "crx": _smooth(shape3, 2, 0.2),
            "cry": _smooth(shape3, 3, 0.2),
            "x_area_flux": _smooth(shape3, 4, 1e7),
            "y_area_flux": _smooth(shape3, 5, 1e7),
            "x_mass_flux": _smooth(shape3, 6, 1e9),
            "y_mass_flux": _smooth(shape3, 7, 1e9),
            "hord": 6,
        }
    if name == "C_SW":
        return {
            "delp": s1["delp"], "pt": s1["pt"], "u": s1["u"],
            "v": s1["v"], "w": s1["w"], "uc": s1["uc"], "vc": s1["vc"],
            "ua": s1["ua"], "va": s1["va"], "ut": zero3, "vt": zero3,
            "omga": s1["omga"], "divgd": zero3, "dt2": 112.5,
        }
    if name == "D_SW":
        return {
            "uc": s1["uc"], "vc": s1["vc"], "w": s1["w"],
            "delpc": s1["delp"], "delp": s1["delp"], "u": s1["u"],
            "v": s1["v"], "mfx": zero3, "mfy": zero3, "cx": zero3,
            "cy": zero3, "heat_source": zero3, "diss_est": zero3,
            "q_con": s1["q_con"], "pt": s1["pt"], "ua": s1["ua"],
            "va": s1["va"], "divgd": zero3, "ut": zero3, "vt": zero3,
            "dt": 112.5,
        }
    if name == "Riem_Solver_C":
        gz = _gz_from_delz(s1["phis"], s1["delz"])
        return {
            "cappa": np.full(shape3, 0.28), "hs": s1["phis"],
            "w3": s1["w"], "ptc": s1["pt"], "q_con": s1["q_con"],
            "delpc": s1["delp"], "gz": gz * 1.0,
            "pef": np.zeros(gz.shape), "ws": np.zeros(s1["ps"].shape),
            "dt2": 112.5, "ptop": float(np.asarray(gd.vertical.ptop)),
        }
    if name == "Riem_Solver3":
        zh = _gz_from_delz(s1["phis"], s1["delz"])
        return {
            "cappa": np.full(shape3, 0.28),
            "zs": s1["phis"] / 9.80665, "w": s1["w"],
            "delz": s1["delz"], "q_con": s1["q_con"],
            "delp": s1["delp"], "pt": s1["pt"], "zh": zh,
            "pe": s1["pe"], "ppe": np.zeros(s1["pe"].shape),
            "pk3": s1["pk"], "pk": s1["pk"], "peln": s1["peln"],
            "ws": np.zeros(s1["ps"].shape), "dt": 112.5,
            "ptop": float(np.asarray(gd.vertical.ptop)), "last_call": 1,
        }
    if name == "UpdateDzD":
        zh = _gz_from_delz(s1["phis"], s1["delz"])
        return {
            "surface_height": s1["phis"] / 9.80665, "height": zh,
            "courant_number_x": _smooth(shape3, 8, 0.2),
            "courant_number_y": _smooth(shape3, 9, 0.2),
            "x_area_flux": _smooth(shape3, 10, 1e7),
            "y_area_flux": _smooth(shape3, 11, 1e7),
            "ws": np.zeros(s1["ps"].shape), "dt": 112.5,
        }
    if name == "NH_P_Grad":
        gz = _gz_from_delz(s1["phis"], s1["delz"]) * 9.80665
        return {
            "u": s1["u"], "v": s1["v"],
            "pp": _smooth(s1["pe"].shape, 12, 10.0),
            "gz": gz, "pk3": s1["pk"], "delp": s1["delp"],
            "dt": 112.5, "ptop": float(np.asarray(gd.vertical.ptop)),
            "akap": 2.0 / 7.0,
        }
    if name == "Tracer2D1L":
        return {
            "qvapor": s1["qvapor"], "qliquid": s1["qliquid"],
            "qice": s1["qice"], "qrain": s1["qrain"],
            "qsnow": s1["qsnow"], "qgraupel": s1["qgraupel"],
            "qcld": s1["qcld"], "dp1": s0["delp"],
            "mfxd": s1["mfxd"], "mfyd": s1["mfyd"],
            "cxd": s1["cxd"], "cyd": s1["cyd"],
        }
    if name == "Fillz":
        dp2 = s1["delp"][:, :, H, :]  # (6, Ni, nz) j-collapsed
        nq = 7
        qt = np.stack(
            [s1[t][:, :, H, :] for t in
             ("qvapor", "qliquid", "qice", "qrain", "qsnow",
              "qgraupel", "qcld")], -1,
        )
        qt[:, H + 2, 5, 0] = -1e-9  # inject a negative to actually fix
        return {"dp2": dp2, "q2tracers": qt, "nq": nq}
    if name == "Remapping":
        return {
            "qvapor": s1["qvapor"], "qliquid": s1["qliquid"],
            "qice": s1["qice"], "qrain": s1["qrain"],
            "qsnow": s1["qsnow"], "qgraupel": s1["qgraupel"],
            "qcld": s1["qcld"], "w": s1["w"], "u": s1["u"],
            "v": s1["v"], "delz": s1["delz"], "pt": s1["pt"],
            "delp": s1["delp"], "cappa": np.full(shape3, 0.28),
            "q_con": s1["q_con"], "pkz": s1["pkz"], "pk": s1["pk"],
            "peln": s1["peln"], "pe": s1["pe"], "hs": s1["phis"],
            "ps": s1["ps"], "wsd": np.zeros(s1["ps"].shape),
            "ptop": float(np.asarray(gd.vertical.ptop)),
            "akap": 2.0 / 7.0, "zvir": 0.608, "last_step": 1,
            "consv_te": 0.0, "mdt": 225.0,
        }
    if name == "FVDynamics":
        d = dict(s0)
        d["bdt"] = 225.0
        return d
    # round-4 cases carry their own input builders (translate_cases.py
    # make_inputs), colocated with the VarSpec declarations
    if case is not None and hasattr(case, "make_inputs"):
        return case.make_inputs(s0, s1, gd)
    raise KeyError(name)


def _roundtrip(case, inputs, data_dir):
    """decompose inputs -> compute from their assembled form ->
    decompose outputs -> write -> read -> validate.

    Two properties make the round trip exact by construction:
    - inputs are sanitized to finite values: halo cells of a live model
      state legitimately hold non-finite scratch (never read by the
      model), but serialized reference data is always finite, and the
      comparison metric (reference comparison.py:6) yields NaN for
      identical +/-inf pairs;
    - compute runs on the ASSEMBLED form of the decomposed blocks (the
      exact arrays validate() will reconstruct), so global halo cells
      the rank blocks don't cover (zero-filled on assembly) can't make
      the recompute diverge from the stored outputs."""
    inputs = {
        k: (np.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
            if np.ndim(v) else v)
        for k, v in inputs.items()
    }
    in_per_rank = []
    for rank in range(case.n_ranks):
        rin = {}
        for name, spec in case.in_vars.items():
            sname = spec.serialname or name
            if name not in inputs:
                assert spec.optional, name
                continue
            v = inputs[name]
            if np.ndim(v) == 0:
                rin[sname] = np.float64(v)
            else:
                rin[sname] = case.decompose(
                    name, v, rank, staggered=case.stagger.get(name,
                                                              (0, 0)))
        in_per_rank.append(rin)
    outputs = case.compute(case.assemble(in_per_rank))
    out_per_rank = []
    for rank in range(case.n_ranks):
        rout = {}
        for name, spec in case.out_vars.items():
            sname = spec.serialname or name
            rout[sname] = case.decompose(
                name, outputs[name], rank, spec_map=case.out_vars,
                staggered=case.stagger.get(name, (0, 0)))
        out_per_rank.append(rout)
    write_savepoint(data_dir, case.savepoint_name, in_per_rank,
                    out_per_rank)
    ds = SavepointDataset(data_dir, case.savepoint_name)
    assert ds.n_ranks == case.n_ranks
    return case.validate(ds)


# FVDynamics/Driver jit the whole (coupled) model — separate tests below
FAST_CASES = sorted(set(CASES) - {"FVDynamics", "Driver"})


@pytest.mark.parametrize("name", FAST_CASES)
def test_translate_case_roundtrip(name, c12_f64_run, tmp_path):
    sizing, gd, state0, states = c12_f64_run
    cls = CASES[name]
    case = cls(sizing, gd)
    inputs = _build_inputs(name, sizing, gd, state0, states[0], case=case)
    errors = _roundtrip(case, inputs, str(tmp_path))
    # outputs written from the same compute: round-trip must be exact
    for var, err in errors.items():
        assert err <= case.max_error, (var, err)


def test_translate_fvdynamics_roundtrip(c12_f64_run, tmp_path):
    """The whole-step savepoint (reference translate_fvdynamics.py);
    separate test because it jits the full dycore."""
    sizing, gd, state0, states = c12_f64_run
    case = CASES["FVDynamics"](sizing, gd)
    inputs = _build_inputs("FVDynamics", sizing, gd, state0, states[0])
    errors = _roundtrip(case, inputs, str(tmp_path))
    for var, err in errors.items():
        assert err <= case.max_error, (var, err)


def test_translate_driver_roundtrip(c12_f64_run, tmp_path):
    """The coupled one-step savepoint (reference physics
    translate_driver.py TranslateDriver, max_error 3e-5 — VERDICT r3
    next #9): dycore + DycoreToPhysics + Physics +
    UpdateAtmosphereState in one jit."""
    sizing, gd, state0, states = c12_f64_run
    case = CASES["Driver"](sizing, gd)
    inputs = _build_inputs("FVDynamics", sizing, gd, state0, states[0])
    errors = _roundtrip(case, inputs, str(tmp_path))
    for var, err in errors.items():
        assert err <= case.max_error, (var, err)


def test_54_rank_layout_assembly(c12_f64_run, tmp_path):
    """A 54-rank (3x3-per-tile) savepoint — the reference's typical C48
    archive layout (VERDICT r2 missing #2) — assembles and validates
    identically to the 6-rank one."""
    sizing, gd, state0, states = c12_f64_run
    case = CASES["XPPM"](sizing, gd, layout=(3, 3))
    assert case.n_ranks == 54
    inputs = _build_inputs("XPPM", sizing, gd, state0, states[0])
    errors = _roundtrip(case, inputs, str(tmp_path))
    assert errors["xflux"] == 0.0

    # the assembled global array must equal the original wherever blocks
    # covered it (every storage cell of the tile interior + halo collar)
    ds = SavepointDataset(str(tmp_path), "XPPM")
    per_rank = [ds.inputs(r) for r in range(54)]
    assembled = case.assemble(per_rank)
    nb = sizing.n + 2 * H
    # _roundtrip sanitizes non-finite halo scratch before decomposing
    q_expect = np.nan_to_num(
        np.asarray(inputs["q"]), nan=0.0, posinf=0.0, neginf=0.0)
    np.testing.assert_array_equal(
        assembled["q"][:, :nb, :nb], q_expect[:, :nb, :nb]
    )


def test_layout_must_divide():
    from pace_tpu.utils.gridtools import GridSizing

    with pytest.raises(ValueError, match="layout"):
        CASES["XPPM"](GridSizing(12, 79), None, layout=(5, 1))
