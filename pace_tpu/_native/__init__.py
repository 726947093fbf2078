"""Native (C++) runtime components, loaded via ctypes.

`fastpack` is the state-serialization backend (threaded .npy writer); the
Python npz path is the fallback when the shared library has not been
built.  Build with `python -m pace_tpu._native.build`.
"""

from pace_tpu._native.fastpack import (  # noqa: F401
    fastpack_available,
    read_npy,
    write_npy,
    write_state_npys,
)
