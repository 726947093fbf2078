"""Savepoint/translate harness end-to-end self-test (VERDICT r1 missing
#4): write a savepoint pair in the reference on-disk format from a real
operator run, read it back through the harness, and validate — so that
when Fortran-serialized data lands, the machinery is proven.

Reference counterparts: stencils/pace/stencils/testing/translate.py:53,
savepoint.py:32, test_translate.py.
"""

import numpy as np
import pytest

from pace_tpu.utils.gridtools import GridSizing
from pace_tpu.utils.translate import (
    SavepointDataset,
    TranslateCase,
    VarSpec,
    discover_savepoints,
    load_threshold_overrides,
    write_savepoint,
)

N_, NZ, H = 12, 3, 3


class TranslateHyperdiffusion(TranslateCase):
    """Translate case for the del2cubed hyperdiffusion operator
    (reference fv3core/pace/fv3core/stencils/del2cubed.py)."""

    def __init__(self, sizing, gd):
        super().__init__(sizing)
        self.gd = gd
        # Fortran block includes halos: starts at storage row 0
        self.in_vars = {"qdel": VarSpec(istart=0, jstart=0)}
        # outputs are compared on the compute domain only
        self.out_vars = {"qdel": VarSpec(istart=H, jstart=H)}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.del2cubed import hyperdiffusion

        cd = 0.2 * float(np.asarray(self.gd.damping.da_min))
        out = hyperdiffusion(
            jnp.asarray(inputs["qdel"]), self.gd, cd, N_, H, nmax=2
        )
        return {"qdel": np.asarray(out)}


@pytest.fixture(scope="module")
def case_and_data(tmp_path_factory):
    import jax.numpy as jnp

    from pace_tpu.grid.generation import generate_grid_data

    sizing = GridSizing(N_, NZ, H)
    # grid metrics only (the vertical eta table is irrelevant to the
    # horizontal operator; 79 is a supported table)
    gd = generate_grid_data(N_, 79, dtype=jnp.float64)
    case = TranslateHyperdiffusion(sizing, gd)

    # smooth input on the full storage; block = halo-inclusive region
    rng = np.random.RandomState(3)
    Nfull = sizing.N
    q = rng.randn(6, Nfull, Nfull, NZ)
    nb = N_ + 2 * H
    inputs = [{"qdel": q[t, :nb, :nb]} for t in range(6)]

    ref = case.compute({"qdel": q})["qdel"]
    outputs = [
        {"qdel": ref[t, H:H + N_, H:H + N_]} for t in range(6)
    ]

    data_dir = str(tmp_path_factory.mktemp("savepoints"))
    write_savepoint(data_dir, "Del2Cubed", inputs, outputs)
    return case, data_dir


def test_discovery_and_shapes(case_and_data):
    _, data_dir = case_and_data
    assert discover_savepoints(data_dir) == ["Del2Cubed"]
    ds = SavepointDataset(data_dir, "Del2Cubed")
    assert ds.n_ranks == 6
    assert ds.n_calls == 1
    blk = ds.inputs(2)["qdel"]
    assert blk.shape == (N_ + 2 * H, N_ + 2 * H, NZ)


def test_validate_passes(case_and_data):
    case, data_dir = case_and_data
    ds = SavepointDataset(data_dir, "Del2Cubed")
    errors = case.validate(ds)
    assert errors["qdel"] < 1e-14


def test_validate_catches_mismatch(case_and_data, tmp_path):
    """A perturbed reference output must fail the metric (the harness
    actually compares)."""
    case, data_dir = case_and_data
    ds = SavepointDataset(data_dir, "Del2Cubed")
    bad_out = [
        {
            "qdel": ds.outputs(r)["qdel"]
            * (1.0 + 1e-6 * (r == 3))  # rank-3 block off by 1e-6 relative
        }
        for r in range(6)
    ]
    bad_dir = str(tmp_path / "bad")
    write_savepoint(bad_dir, "Del2Cubed",
                    [ds.inputs(r) for r in range(6)], bad_out)
    bad = SavepointDataset(bad_dir, "Del2Cubed")
    with pytest.raises(AssertionError, match="rank 3"):
        case.validate(bad)


def test_threshold_overrides(case_and_data, tmp_path):
    """The reference YAML override schema loosens per-test thresholds
    (test_translate.py --threshold_overrides_file)."""
    case, data_dir = case_and_data
    yaml_path = tmp_path / "overrides.yaml"
    yaml_path.write_text(
        "Del2Cubed:\n"
        "  - backend: all\n"
        "    max_error: 1e-3\n"
        "    near_zero: 1e-10\n"
        "    ignore_near_zero_errors: [qdel]\n"
    )
    overrides = load_threshold_overrides(str(yaml_path))
    assert overrides["Del2Cubed"]["max_error"] == 1e-3

    ds = SavepointDataset(data_dir, "Del2Cubed")
    loose_out = [
        {"qdel": ds.outputs(r)["qdel"] * (1.0 + 1e-6)} for r in range(6)
    ]
    loose_dir = str(tmp_path / "loose")
    write_savepoint(loose_dir, "Del2Cubed",
                    [ds.inputs(r) for r in range(6)], loose_out)
    loose = SavepointDataset(loose_dir, "Del2Cubed")
    # fails at default tolerance, passes with the override
    with pytest.raises(AssertionError):
        case.validate(loose)
    case.validate(loose, overrides=overrides["Del2Cubed"])
