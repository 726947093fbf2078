"""Fast saturation adjustment (SatAdjust3d) — placeholder.

The full port of ai2cm/pace fv3core/pace/fv3core/stencils/
saturation_adjustment.py is implemented in this module; until then,
configurations must run with do_sat_adj=False.
"""

from __future__ import annotations


def saturation_adjustment(*args, **kwargs):
    raise NotImplementedError(
        "saturation adjustment not yet ported; set do_sat_adj=False"
    )
