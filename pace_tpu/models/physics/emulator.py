"""ML microphysics emulator: a column MLP drop-in for the GFDL scheme.

BASELINE.md north star 5 calls for "a C384 multi-host pod run with an ML
microphysics emulator in the step loop" — the ai2cm ecosystem runs
fv3fit-trained keras/torch emulators inside the Fortran/pace physics
driver (the `Physics(active_packages=...)` hook,
physics/pace/physics/stencils/physics.py).  This is the TPU-native
analogue: a pure-jax per-column MLP whose forward pass is a handful of
large batched matmuls — exactly the MXU shape — emitting the same
tendency dict as `Microphysics.__call__`, so it is interchangeable in
the physics driver and in the coupled jitted step.

TPU-first design decisions:
- each layer is one (..., features) @ (features, hidden) matmul over
  the column features with the (tile, x, y) batch dims kept INTACT —
  flattening them into one batch axis would merge partitioned axes and
  force GSPMD to all-gather the global column batch per device;
- compute dtype is configurable — bfloat16 halves HBM traffic for the
  weights/activations and runs the MXU at full rate; the residual/
  conservation fixup is always applied in the state dtype;
- optional exact column-water conservation: the raw network output is
  projected onto the zero-column-moisture-tendency subspace (mass
  weighted by delp), so the emulator cannot create or destroy water no
  matter what its weights are — the invariant the GFDL scheme holds to
  round-off (tests/test_microphysics.py).

Weights load from an npz (`MLPEmulatorConfig.weights_path`); without a
file the network is deterministically He-initialized from `seed` with
zero-initialized output layer, making the untrained emulator an exact
no-op (zero tendencies) — safe to wire into a real run before training.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# column profile features fed to the network, in order
INPUT_FIELDS = (
    "pt", "qvapor", "qliquid", "qrain", "qice", "qsnow", "qgraupel",
    "qcld", "delp", "dz", "wmp",
)
# tendencies produced, in order (matches Microphysics' return dict)
OUTPUT_FIELDS = (
    "qv_dt", "ql_dt", "qr_dt", "qi_dt", "qs_dt", "qg_dt", "qa_dt",
    "pt_dt",
)
# water-species tendencies subject to the conservation projection
WATER_TENDENCIES = ("qv_dt", "ql_dt", "qr_dt", "qi_dt", "qs_dt", "qg_dt")

# fixed per-field normalization scales (typical magnitudes; the network
# sees O(1) inputs).  Trained weight files may override via the npz.
_INPUT_SCALE = {
    "pt": 300.0, "qvapor": 2e-2, "qliquid": 1e-3, "qrain": 1e-3,
    "qice": 1e-3, "qsnow": 1e-3, "qgraupel": 1e-3, "qcld": 1.0,
    "delp": 5e3, "dz": 1e3, "wmp": 1.0,
}
_OUTPUT_SCALE = {
    "qv_dt": 1e-6, "ql_dt": 1e-6, "qr_dt": 1e-6, "qi_dt": 1e-6,
    "qs_dt": 1e-6, "qg_dt": 1e-6, "qa_dt": 1e-4, "pt_dt": 1e-3,
}


@dataclasses.dataclass(frozen=True)
class MLPEmulatorConfig:
    """Configuration for the MLP microphysics emulator."""

    hidden_sizes: Tuple[int, ...] = (256, 256)
    weights_path: Optional[str] = None
    compute_dtype: str = "bfloat16"  # matmul dtype: bfloat16 | float32
    conserve_water: bool = True
    seed: int = 0


def _init_params(config: MLPEmulatorConfig, nz: int) -> dict:
    """Deterministic He init; output layer zeros (no-op tendencies)."""
    n_in = nz * len(INPUT_FIELDS)
    n_out = nz * len(OUTPUT_FIELDS)
    sizes = (n_in,) + tuple(config.hidden_sizes) + (n_out,)
    key = jax.random.PRNGKey(config.seed)
    params = {}
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        last = i == len(sizes) - 2
        w = (
            jnp.zeros((a, b), jnp.float32)
            if last
            else jax.random.normal(sub, (a, b), jnp.float32)
            * np.sqrt(2.0 / a)
        )
        params[f"w{i}"] = w
        params[f"b{i}"] = jnp.zeros((b,), jnp.float32)
    return params


def load_params(path: str) -> dict:
    with np.load(path) as f:
        return {k: jnp.asarray(f[k]) for k in f.files}


def save_params(params: dict, path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


class MicrophysicsEmulator:
    """Drop-in for `Microphysics`: same call signature (a
    MicrophysicsState), same tendency-dict return."""

    def __init__(self, config: MLPEmulatorConfig, nz: int):
        self.config = config
        self.nz = nz
        self.params = (
            load_params(config.weights_path)
            if config.weights_path
            else _init_params(config, nz)
        )
        self._n_layers = len(config.hidden_sizes) + 1

    def _forward(self, x):
        """x: (..., nz*F) normalized features -> (..., nz*T) normalized
        tendencies.  One matmul chain on the MXU; leading dims are kept
        intact (NOT flattened) so a (tile, x, y)-sharded input stays
        sharded — a (-1, features) reshape would merge partitioned axes
        and force GSPMD to all-gather the full global batch per device."""
        cdt = jnp.dtype(self.config.compute_dtype)
        h = x.astype(cdt)
        for i in range(self._n_layers):
            w = self.params[f"w{i}"].astype(cdt)
            b = self.params[f"b{i}"].astype(cdt)
            h = h @ w + b
            if i < self._n_layers - 1:
                h = jax.nn.gelu(h)
        return h

    def __call__(self, state) -> dict:
        nz = self.nz
        dtype = state.pt.dtype
        profiles = [
            getattr(state, name) / _INPUT_SCALE[name]
            for name in INPUT_FIELDS
        ]
        x = jnp.concatenate(profiles, axis=-1)  # (..., nz*F)
        y = self._forward(x).astype(dtype)      # (..., nz*T)
        tend = {
            name: y[..., i * nz:(i + 1) * nz] * _OUTPUT_SCALE[name]
            for i, name in enumerate(OUTPUT_FIELDS)
        }

        if self.config.conserve_water:
            # project onto zero net column-moisture tendency: remove the
            # delp-weighted column mean of the total-water tendency from
            # qv_dt (vapor is the reservoir; mirrors how the GFDL scheme
            # balances its source/sink pairs)
            delp = state.delp
            total = sum(tend[k] for k in WATER_TENDENCIES)
            col = jnp.sum(total * delp, -1, keepdims=True)
            mass = jnp.sum(delp, -1, keepdims=True)
            tend["qv_dt"] = tend["qv_dt"] - col / mass

        tend["udt"] = jnp.zeros_like(state.ua)
        tend["vdt"] = jnp.zeros_like(state.va)
        tend["wmp"] = state.wmp
        return tend
