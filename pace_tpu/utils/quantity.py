"""Quantity: a dims/units-aware array container, as a JAX pytree.

TPU-native analogue of the reference's `pace.util.Quantity`
(ai2cm/pace util/pace/util/quantity.py:259): carries dimension names, units,
and compute-domain origin/extent alongside the raw array.  Unlike the
reference it is a registered pytree so it can flow through `jax.jit` /
`shard_map` untouched; `.view` returns the compute-domain slice.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.utils import constants


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Quantity:
    data: jax.Array
    dims: Tuple[str, ...] = dataclasses.field(metadata=dict(static=True))
    units: str = dataclasses.field(metadata=dict(static=True))
    origin: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    extent: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))

    def __post_init__(self):
        if len(self.dims) != len(self.origin) or len(self.dims) != len(self.extent):
            raise ValueError(
                f"dims/origin/extent length mismatch: {self.dims} {self.origin} "
                f"{self.extent}"
            )

    @property
    def metadata(self):
        return dict(dims=self.dims, units=self.units, origin=self.origin,
                    extent=self.extent, dtype=self.data.dtype)

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def np(self):
        return jnp

    @property
    def view(self) -> jax.Array:
        """Compute-domain view of the data (read: slice; functional update via
        `.with_view`)."""
        slices = tuple(
            slice(o, o + e) for o, e in zip(self.origin, self.extent)
        )
        return self.data[slices]

    def with_data(self, data: jax.Array) -> "Quantity":
        return dataclasses.replace(self, data=data)

    def with_view(self, values: Any) -> "Quantity":
        slices = tuple(
            slice(o, o + e) for o, e in zip(self.origin, self.extent)
        )
        return self.with_data(self.data.at[slices].set(values))

    def transpose(self, target_dims: Tuple[str, ...]) -> "Quantity":
        perm = tuple(self.dims.index(d) for d in target_dims)
        return Quantity(
            data=jnp.transpose(self.data, perm),
            dims=tuple(self.dims[p] for p in perm),
            units=self.units,
            origin=tuple(self.origin[p] for p in perm),
            extent=tuple(self.extent[p] for p in perm),
        )

    def __repr__(self):
        return (
            f"Quantity(dims={self.dims}, units={self.units!r}, "
            f"origin={self.origin}, extent={self.extent}, shape={self.data.shape})"
        )


def _dim_sizes(sizing, dims):
    """Map dim names -> (array size, origin, extent) for the global layout."""
    out_shape, origin, extent = [], [], []
    for d in dims:
        if d == constants.TILE_DIM:
            out_shape.append(constants.N_TILES); origin.append(0); extent.append(6)
        elif d == constants.X_DIM:
            out_shape.append(sizing.N); origin.append(sizing.halo); extent.append(sizing.n)
        elif d == constants.X_INTERFACE_DIM:
            out_shape.append(sizing.N); origin.append(sizing.halo); extent.append(sizing.n + 1)
        elif d == constants.Y_DIM:
            out_shape.append(sizing.N); origin.append(sizing.halo); extent.append(sizing.n)
        elif d == constants.Y_INTERFACE_DIM:
            out_shape.append(sizing.N); origin.append(sizing.halo); extent.append(sizing.n + 1)
        elif d == constants.Z_DIM:
            out_shape.append(sizing.nz); origin.append(0); extent.append(sizing.nz)
        elif d == constants.Z_INTERFACE_DIM:
            out_shape.append(sizing.nz + 1); origin.append(0); extent.append(sizing.nz + 1)
        else:
            raise ValueError(f"unknown dimension name {d!r}")
    return tuple(out_shape), tuple(origin), tuple(extent)


@dataclasses.dataclass(frozen=True)
class QuantityFactory:
    """Allocates Quantities with the global (tile, x, y, z) layout.

    Analogue of ai2cm/pace util/pace/util/initialization/allocator.py:31.
    """

    sizing: Any  # GridSizing
    dtype: Any = jnp.float32

    def empty(self, dims, units, dtype=None):
        return self.zeros(dims, units, dtype)

    def zeros(self, dims, units, dtype=None):
        shape, origin, extent = _dim_sizes(self.sizing, dims)
        return Quantity(
            data=jnp.zeros(shape, dtype or self.dtype),
            dims=tuple(dims), units=units, origin=origin, extent=extent,
        )

    def ones(self, dims, units, dtype=None):
        shape, origin, extent = _dim_sizes(self.sizing, dims)
        return Quantity(
            data=jnp.ones(shape, dtype or self.dtype),
            dims=tuple(dims), units=units, origin=origin, extent=extent,
        )

    def from_array(self, array, dims, units):
        """Wrap a compute-domain-sized array, padding halos with zeros."""
        shape, origin, extent = _dim_sizes(self.sizing, dims)
        array = np.asarray(array)
        if tuple(array.shape) == tuple(shape):
            data = jnp.asarray(array, self.dtype)
        elif tuple(array.shape) == tuple(extent):
            full = np.zeros(shape, dtype=np.asarray(array).dtype)
            slices = tuple(slice(o, o + e) for o, e in zip(origin, extent))
            full[slices] = array
            data = jnp.asarray(full, self.dtype)
        else:
            raise ValueError(
                f"array shape {array.shape} matches neither storage {shape} "
                f"nor compute extent {extent} for dims {dims}"
            )
        return Quantity(data=data, dims=tuple(dims), units=units,
                        origin=origin, extent=extent)
