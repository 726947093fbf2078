"""Hand-tiled Pallas TPU kernels for the hot dycore operators.

TPUs stream every HBM read (no cache between HBM and the core), so the
whole-array jnp stencils — which read each field at up to a dozen shifted
offsets — pay one full HBM pass per offset per consumer fusion.  These
kernels hold a block in VMEM and make all shifted reads on-chip, cutting
the transport's measured HBM traffic by tens of times.  Each kernel runs the
IDENTICAL math as its jnp op (the ops inject shift/update helpers), so the
jnp path remains the reference implementation and the CPU/multi-chip path.
"""
