"""Pair-debug: run a step function under two shardings and compare.

TPU-native replacement for the reference's pair_debug mode
(ai2cm/pace driver/pace/driver/driver.py:389-395 + dsl stencil.py:242-265),
which runs two model copies on a split MPI communicator and sendrecv-
compares every stencil argument.  Here the two "copies" are the same
jitted function executed under different shardings (e.g. replicated vs a
(tile, x, y) mesh); outputs are compared NaN-aware over a chosen window.

This is also the practical detector for partitioner miscompilations
(docs/KNOWN_ISSUES.md): per-op semantics can be identical while the
compiled partitioned module diverges.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np


class PairDebugMismatch(AssertionError):
    pass


def _leaves_with_names(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    names = [str(i) for i in range(len(leaves))]
    if hasattr(tree, "__dataclass_fields__"):
        names = list(tree.__dataclass_fields__)
    return names, leaves


def compare_under_shardings(
    fn: Callable,
    args,
    shard_a: Callable,
    shard_b: Callable,
    atol: float = 0.0,
    rtol: float = 0.0,
    window: Optional[Callable] = None,
) -> dict:
    """Run jit(fn) on shard_a(args) and shard_b(args), compare outputs.

    shard_a/shard_b: pytree -> pytree placement functions (e.g. identity
    and a NamedSharding device_put).  window: optional array -> array
    restricting comparison (e.g. compute-domain subset).  Returns a dict
    of per-leaf max abs differences; raises PairDebugMismatch if any leaf
    exceeds atol + rtol*|reference|.
    """
    out_a = jax.jit(fn)(*jax.tree_util.tree_map(lambda x: x, shard_a(args)))
    out_b = jax.jit(fn)(*shard_b(args))
    names_a, leaves_a = _leaves_with_names(out_a)
    _, leaves_b = _leaves_with_names(out_b)
    report = {}
    failures = []
    for name, a, b in zip(names_a, leaves_a, leaves_b):
        a = np.asarray(jax.device_get(a))
        b = np.asarray(jax.device_get(b))
        if window is not None and a.ndim >= 3:
            a, b = window(a), window(b)
        both_nan = np.isnan(a) & np.isnan(b)
        err = np.where(both_nan, 0.0, np.abs(a - b))
        err = np.nan_to_num(err, nan=np.inf)
        max_err = float(err.max()) if err.size else 0.0
        report[name] = max_err
        tol = atol + rtol * float(np.nan_to_num(np.abs(a), nan=0.0).max())
        if max_err > tol:
            failures.append(f"{name}: max err {max_err:.3e} > {tol:.3e}")
    if failures:
        raise PairDebugMismatch("; ".join(failures))
    return report


def replicated(args):
    """Identity placement (single-device / fully replicated)."""
    return args


def mesh_placement(mesh, spec3, spec1=None):
    """Returns a placement function sharding >=3D leaves with spec3."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec1 = spec1 if spec1 is not None else P()

    def place(args):
        def put(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 3:
                return jax.device_put(leaf, NamedSharding(mesh, spec3))
            return leaf

        return jax.tree_util.tree_map(put, args)

    return place
