"""Concrete translate cases: reference savepoint names -> pace_tpu ops.

Each case mirrors one class of the reference savepoint suite
(/root/reference/fv3core/tests/savepoint/translate/ — 39 dycore classes;
the top savepoints by coverage are registered here), declaring the same
serialized variable names, layout offsets, and in/out sets, with
`compute` running this framework's whole-cube op.

Offsets use the harness storage convention (translate.py VarSpec):
istart/jstart = 0 for halo-inclusive blocks (reference `isd`), = halo
for compute-domain blocks (reference `grid.is_`).  `kaxis=1` marks the
reference's (i, k, j)-ordered variables (pe/peln).

No serialized Fortran data ships in this repo, so each case is
self-validated: tests/test_translate_harness.py writes savepoints from
golden C12 model states through `TranslateCase.decompose` (the exact
reference on-disk layout, any rank layout), then round-trips them
through `assemble` -> `compute` -> `validate`.  When real Serialbox
netCDFs land, the same cases consume them directly.
"""

from __future__ import annotations

from typing import Dict, Type

import numpy as np

from pace_tpu.models.fv3.config import DynamicalCoreConfig, get_column_namelist
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils.translate import TranslateCase, VarSpec

# registry: savepoint name -> case class (reference conftest collection)
CASES: Dict[str, Type["BaseOpCase"]] = {}


def register(name):
    def deco(cls):
        cls.savepoint_name = name
        CASES[name] = cls
        return cls

    return deco


class BaseOpCase(TranslateCase):
    """TranslateCase bound to this framework's grid/config objects."""

    savepoint_name = ""

    def __init__(self, sizing, grid_data, config: DynamicalCoreConfig = None,
                 dtype=np.float64, layout=(1, 1)):
        super().__init__(sizing, dtype=dtype, layout=layout)
        self.gd = grid_data
        self.config = config or DynamicalCoreConfig(do_sat_adj=False)
        self.n = sizing.n
        self.h = sizing.halo

    # staggered write extents per variable for savepoint generation
    # (decompose): name -> (extra_i, extra_j)
    stagger: Dict[str, tuple] = {}


# ---------------------------------------------------------------------------
# per-operator cases
# ---------------------------------------------------------------------------


@register("XPPM")
class TranslateXPPM(BaseOpCase):
    """reference translate_xppm.py TranslateXPPM: q (serial 'qx'),
    c (serial 'cx', compute-i), param iord -> xflux."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "q": VarSpec(serialname="qx"),
            "c": VarSpec(serialname="cx", istart=h),
            "iord": VarSpec(),
        }
        self.out_vars = {"xflux": VarSpec(istart=h, jstart=h)}
        self.stagger = {"c": (1, 0), "xflux": (1, 0)}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.xppm import x_flux

        dxa = jnp.asarray(self.gd.horizontal.dxa)[..., None]
        flux = x_flux(
            jnp.asarray(inputs["q"]), jnp.asarray(inputs["c"]), dxa,
            self.n, self.h, int(inputs["iord"]),
        )
        return {"xflux": np.asarray(flux)}


@register("FvTp2d")
class TranslateFvTp2d(BaseOpCase):
    """reference translate_fvtp2d.py TranslateFvTp2d: q/crx/cry/xfx/yfx/
    mfx/mfy + hord -> q passthrough and the mass fluxes fx/fy."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "q": VarSpec(),
            "crx": VarSpec(istart=h),
            "cry": VarSpec(jstart=h),
            "x_area_flux": VarSpec(serialname="xfx", istart=h),
            "y_area_flux": VarSpec(serialname="yfx", jstart=h),
            "x_mass_flux": VarSpec(serialname="mfx", istart=h, jstart=h),
            "y_mass_flux": VarSpec(serialname="mfy", istart=h, jstart=h),
            "hord": VarSpec(),
        }
        self.out_vars = {
            "q": VarSpec(),
            "q_x_flux": VarSpec(serialname="fx", istart=h, jstart=h),
            "q_y_flux": VarSpec(serialname="fy", istart=h, jstart=h),
        }
        self.stagger = {
            "crx": (1, 0), "x_area_flux": (1, 0), "x_mass_flux": (1, 0),
            "cry": (0, 1), "y_area_flux": (0, 1), "y_mass_flux": (0, 1),
            "q_x_flux": (1, 0), "q_y_flux": (0, 1),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.fvtp2d import fv_tp_2d

        fx, fy = fv_tp_2d(
            jnp.asarray(inputs["q"]), jnp.asarray(inputs["crx"]),
            jnp.asarray(inputs["cry"]),
            jnp.asarray(inputs["x_area_flux"]),
            jnp.asarray(inputs["y_area_flux"]),
            self.gd, self.n, self.h, int(inputs["hord"]),
            x_mass_flux=jnp.asarray(inputs["x_mass_flux"]),
            y_mass_flux=jnp.asarray(inputs["y_mass_flux"]),
        )
        return {
            "q": inputs["q"],
            "q_x_flux": np.asarray(fx),
            "q_y_flux": np.asarray(fy),
        }


@register("C_SW")
class TranslateC_SW(BaseOpCase):
    """reference translate_c_sw.py TranslateC_SW: every variable is
    serialized with a 'd' suffix (delpd, ptd, ...); outputs add
    delpcd/ptcd.  max_error 2e-10 matches the reference setting."""

    max_error = 2e-10

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            name: VarSpec(serialname=name + "d")
            for name in ("delp", "pt", "u", "v", "w", "uc", "vc",
                         "ua", "va", "ut", "vt", "divgd")
        }
        self.in_vars["omga"] = VarSpec(serialname="omgad")
        self.in_vars["dt2"] = VarSpec()
        self.out_vars = {
            name: VarSpec(serialname=name + "d")
            for name in ("delp", "pt", "uc", "vc", "ua", "va", "ut",
                         "vt", "divgd", "w")
        }
        self.out_vars["delpc"] = VarSpec(serialname="delpcd")
        self.out_vars["ptc"] = VarSpec(serialname="ptcd")
        self.stagger = {
            "u": (0, 1), "vc": (0, 1), "v": (1, 0), "uc": (1, 0),
            "divgd": (1, 1),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.c_sw import c_sw

        (delpc, ptc, uc, vc, ua, va, ut, vt, divgd, omga, delp_f, pt_f,
         w_f) = c_sw(
            jnp.asarray(inputs["delp"]), jnp.asarray(inputs["pt"]),
            jnp.asarray(inputs["u"]), jnp.asarray(inputs["v"]),
            jnp.asarray(inputs["w"]), jnp.asarray(inputs["omga"]),
            self.gd, self.n, self.h, float(inputs["dt2"]),
            self.config.nord,
        )
        return {
            "delp": np.asarray(delp_f), "pt": np.asarray(pt_f),
            "w": np.asarray(w_f), "uc": np.asarray(uc),
            "vc": np.asarray(vc), "ua": np.asarray(ua),
            "va": np.asarray(va), "ut": np.asarray(ut),
            "vt": np.asarray(vt), "divgd": np.asarray(divgd),
            "delpc": np.asarray(delpc), "ptc": np.asarray(ptc),
        }


@register("D_SW")
class TranslateD_SW(BaseOpCase):
    """reference translate_d_sw.py TranslateD_SW ('d'-suffixed serial
    names, dt parameter; max_error 3.2e-10).  xfx/crx/yfx/cry are
    derived from uc/vc inside this framework's d_sw (fx_adv), matching
    the reference __call__."""

    max_error = 3.2e-10

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            name: VarSpec(serialname=name + "d")
            for name in ("uc", "vc", "w", "delpc", "delp", "u", "v",
                         "heat_source", "diss_est", "q_con", "pt",
                         "ua", "va", "divgd")
        }
        for name in ("mfx", "cx"):
            self.in_vars[name] = VarSpec(serialname=name + "d",
                                         istart=h, jstart=h)
        for name in ("mfy", "cy"):
            self.in_vars[name] = VarSpec(serialname=name + "d",
                                         istart=h, jstart=h)
        # framework-internal storages (zero-initialized when absent from
        # the savepoint — the reference does not serialize them for D_SW)
        self.in_vars["ut"] = VarSpec(serialname="utd", optional=True)
        self.in_vars["vt"] = VarSpec(serialname="vtd", optional=True)
        # serialized by the reference but unused by this implementation
        # (zh rides its own UpdateDzD savepoint)
        self.in_vars["zh"] = VarSpec(serialname="zhd", optional=True)
        self.in_vars["dt"] = VarSpec()
        out_names = ("uc", "vc", "w", "delpc", "delp", "u", "v",
                     "heat_source", "diss_est", "q_con", "pt", "divgd")
        self.out_vars = {
            name: VarSpec(serialname=name + "d") for name in out_names
        }
        for name in ("mfx", "cx", "mfy", "cy", "crx", "xfx"):
            self.out_vars[name] = VarSpec(serialname=name + "d",
                                          istart=h, jstart=h)
        self.out_vars["crx"] = VarSpec(serialname="crxd", istart=h)
        self.out_vars["xfx"] = VarSpec(serialname="xfxd", istart=h)
        self.out_vars["cry"] = VarSpec(serialname="cryd", jstart=h)
        self.out_vars["yfx"] = VarSpec(serialname="yfxd", jstart=h)
        self.stagger = {
            "u": (0, 1), "vc": (0, 1), "v": (1, 0), "uc": (1, 0),
            "divgd": (1, 1), "mfx": (1, 0), "cx": (1, 0),
            "mfy": (0, 1), "cy": (0, 1), "crx": (1, 0), "xfx": (1, 0),
            "cry": (0, 1), "yfx": (0, 1),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.d_sw import d_sw

        col = get_column_namelist(self.config, self.sizing.nz)
        zeros = jnp.zeros_like(jnp.asarray(inputs["pt"]))
        inputs.setdefault("ut", zeros)
        inputs.setdefault("vt", zeros)
        args = {k: jnp.asarray(inputs[k]) for k in
                ("delp", "pt", "u", "v", "w", "uc", "vc", "ua", "va",
                 "divgd", "q_con", "heat_source", "diss_est", "ut", "vt")}
        out = d_sw(
            args["delp"], args["pt"], args["u"], args["v"], args["w"],
            args["uc"], args["vc"], args["ua"], args["va"],
            args["divgd"], jnp.asarray(inputs["mfx"]),
            jnp.asarray(inputs["mfy"]), jnp.asarray(inputs["cx"]),
            jnp.asarray(inputs["cy"]), args["q_con"],
            args["heat_source"], args["diss_est"], args["ut"],
            args["vt"], self.gd, col, self.config, self.n, self.h,
            float(inputs["dt"]),
        )
        result = {k: np.asarray(v) for k, v in out.items()
                  if k in self.out_vars}
        result["delpc"] = np.asarray(out["delpc"])
        # C-grid winds are inout storages in the reference savepoint,
        # unchanged by the D-grid step
        result["uc"] = inputs["uc"]
        result["vc"] = inputs["vc"]
        return result


@register("Riem_Solver_C")
class TranslateRiemSolverC(BaseOpCase):
    """reference translate_riem_solver_c.py: cappa/hs/w3/ptc/q_con/
    delpc/gz/pef/ws + dt2/ptop -> pef, gz.  max_error 5e-14."""

    max_error = 5e-14

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            name: VarSpec() for name in
            ("cappa", "hs", "w3", "ptc", "q_con", "delpc", "gz", "pef",
             "ws")
        }
        self.in_vars["dt2"] = VarSpec()
        self.in_vars["ptop"] = VarSpec()
        self.out_vars = {"pef": VarSpec(), "gz": VarSpec()}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.riemann import riem_solver_c

        gz, pef = riem_solver_c(
            float(inputs["dt2"]), jnp.asarray(inputs["cappa"]),
            float(inputs["ptop"]), jnp.asarray(inputs["hs"]),
            jnp.asarray(inputs["ws"]), jnp.asarray(inputs["ptc"]),
            jnp.asarray(inputs["q_con"]), jnp.asarray(inputs["delpc"]),
            jnp.asarray(inputs["gz"]), jnp.asarray(inputs["w3"]),
            self.config.p_fac,
        )
        return {"gz": np.asarray(gz), "pef": np.asarray(pef)}


@register("Riem_Solver3")
class TranslateRiemSolver3(BaseOpCase):
    """reference translate_riem_solver3.py: the full D-grid vertical
    solver; pe/peln are serialized (i, k, j) (kaxis=1)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            name: VarSpec() for name in
            ("cappa", "zs", "w", "delz", "q_con", "delp", "pt", "zh",
             "ppe", "pk3", "pk")
        }
        self.in_vars["pe"] = VarSpec(istart=h - 1, jstart=h - 1, kaxis=1)
        self.in_vars["peln"] = VarSpec(istart=h, jstart=h, kaxis=1)
        self.in_vars["ws"] = VarSpec(serialname="wsd", istart=h, jstart=h)
        for p in ("dt", "ptop", "last_call"):
            self.in_vars[p] = VarSpec()
        self.out_vars = {
            "zh": VarSpec(), "w": VarSpec(),
            "pe": VarSpec(istart=h - 1, jstart=h - 1, kaxis=1),
            "peln": VarSpec(istart=h, jstart=h, kaxis=1),
            "ppe": VarSpec(), "delz": VarSpec(),
            "pk": VarSpec(istart=h, jstart=h),
            "pk3": VarSpec(),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.riemann import riem_solver3

        delz, zh, pe, ppe, pk3, pk, peln, w = riem_solver3(
            float(inputs["dt"]), jnp.asarray(inputs["cappa"]),
            float(inputs["ptop"]), jnp.asarray(inputs["zs"]),
            jnp.asarray(inputs["ws"]), jnp.asarray(inputs["delz"]),
            jnp.asarray(inputs["q_con"]), jnp.asarray(inputs["delp"]),
            jnp.asarray(inputs["pt"]), jnp.asarray(inputs["zh"]),
            jnp.asarray(inputs["pe"]), jnp.asarray(inputs["pk3"]),
            jnp.asarray(inputs["pk"]), jnp.asarray(inputs["peln"]),
            jnp.asarray(inputs["w"]), self.config.p_fac,
            self.config.beta, self.config.use_logp,
            bool(inputs["last_call"]),
        )
        return {
            "delz": np.asarray(delz), "zh": np.asarray(zh),
            "pe": np.asarray(pe), "ppe": np.asarray(ppe),
            "pk3": np.asarray(pk3), "pk": np.asarray(pk),
            "peln": np.asarray(peln), "w": np.asarray(w),
        }


@register("UpdateDzD")
class TranslateUpdateDzD(BaseOpCase):
    """reference translate_updatedzd.py: zs/zh/crx/cry/xfx/yfx/wsd + dt
    -> zh, ws.  near_zero 1e-30 and zh/wsd near-zero tolerance match the
    reference settings."""

    near_zero = 1e-30
    ignore_near_zero_errors = ("height", "ws")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "surface_height": VarSpec(serialname="zs"),
            "height": VarSpec(serialname="zh"),
            "courant_number_x": VarSpec(serialname="crx", istart=h),
            "courant_number_y": VarSpec(serialname="cry", jstart=h),
            "x_area_flux": VarSpec(serialname="xfx", istart=h),
            "y_area_flux": VarSpec(serialname="yfx", jstart=h),
            "ws": VarSpec(serialname="wsd", istart=h, jstart=h),
            "dt": VarSpec(),
        }
        self.out_vars = {
            "height": VarSpec(serialname="zh"),
            "ws": VarSpec(serialname="wsd", istart=h, jstart=h),
        }
        self.stagger = {
            "courant_number_x": (1, 0), "x_area_flux": (1, 0),
            "courant_number_y": (0, 1), "y_area_flux": (0, 1),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.updatedzd import update_dz_d

        col = get_column_namelist(self.config, self.sizing.nz)
        ak = np.asarray(self.gd.vertical.ak, np.float64)
        bk = np.asarray(self.gd.vertical.bk, np.float64)
        ph = ak + bk * 1.0e5
        dp0 = ph[1:] - ph[:-1]
        height, ws = update_dz_d(
            jnp.asarray(inputs["surface_height"]),
            jnp.asarray(inputs["height"]),
            jnp.asarray(inputs["courant_number_x"]),
            jnp.asarray(inputs["courant_number_y"]),
            jnp.asarray(inputs["x_area_flux"]),
            jnp.asarray(inputs["y_area_flux"]),
            self.gd, col, self.config, self.n, self.h,
            float(inputs["dt"]), dp0,
        )
        return {"height": np.asarray(height), "ws": np.asarray(ws)}


@register("NH_P_Grad")
class TranslateNHPGrad(BaseOpCase):
    """reference translate_nh_p_grad.py: u/v/pp/gz/pk3/delp + dt/ptop/
    akap -> updated winds and interface fields.  max_error 5e-10."""

    max_error = 5e-10

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            name: VarSpec() for name in
            ("u", "v", "pp", "gz", "pk3", "delp")
        }
        for p in ("dt", "ptop", "akap"):
            self.in_vars[p] = VarSpec()
        self.out_vars = {
            "u": VarSpec(), "v": VarSpec(), "pp": VarSpec(),
            "gz": VarSpec(), "pk3": VarSpec(), "delp": VarSpec(),
        }
        self.stagger = {"u": (0, 1), "v": (1, 0)}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.nh_p_grad import nh_p_grad

        u, v = nh_p_grad(
            jnp.asarray(inputs["u"]), jnp.asarray(inputs["v"]),
            jnp.asarray(inputs["pp"]), jnp.asarray(inputs["gz"]),
            jnp.asarray(inputs["pk3"]), jnp.asarray(inputs["delp"]),
            self.gd, self.n, self.h, float(inputs["dt"]),
            float(inputs["ptop"]), float(inputs["akap"]),
        )
        return {
            "u": np.asarray(u), "v": np.asarray(v), "pp": inputs["pp"],
            "gz": inputs["gz"], "pk3": inputs["pk3"],
            "delp": inputs["delp"],
        }


@register("Tracer2D1L")
class TranslateTracer2D1L(BaseOpCase):
    """reference translate_tracer2d1l.py: per-tracer fields (the
    reference serializes a tracers bundle; here each advected tracer is
    its own variable, as the checkpointer savepoints do) + dp1/mfxd/
    mfyd/cxd/cyd -> advected tracers and updated fluxes."""

    TRACERS = ("qvapor", "qliquid", "qice", "qrain", "qsnow", "qgraupel",
               "qcld")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {name: VarSpec() for name in self.TRACERS}
        self.in_vars["dp1"] = VarSpec()
        self.in_vars["mfxd"] = VarSpec(istart=h, jstart=h)
        self.in_vars["mfyd"] = VarSpec(istart=h, jstart=h)
        self.in_vars["cxd"] = VarSpec(istart=h)
        self.in_vars["cyd"] = VarSpec(jstart=h)
        self.out_vars = {name: VarSpec() for name in self.TRACERS}
        self.out_vars["mfxd"] = VarSpec(istart=h, jstart=h)
        self.out_vars["mfyd"] = VarSpec(istart=h, jstart=h)
        self.stagger = {
            "mfxd": (1, 0), "cxd": (1, 0), "mfyd": (0, 1), "cyd": (0, 1),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.tracer_advection import tracer_advection

        topo = get_topology(self.n, self.h)
        tracers = {name: jnp.asarray(inputs[name])
                   for name in self.TRACERS}
        out = tracer_advection(
            tracers, jnp.asarray(inputs["dp1"]),
            jnp.asarray(inputs["mfxd"]), jnp.asarray(inputs["mfyd"]),
            jnp.asarray(inputs["cxd"]), jnp.asarray(inputs["cyd"]),
            self.gd, topo, self.n, self.h, self.config.hord_tr,
        )
        result = {name: np.asarray(out[name]) for name in self.TRACERS}
        result["mfxd"] = np.asarray(inputs["mfxd"])
        result["mfyd"] = np.asarray(inputs["mfyd"])
        return result


@register("FillZ")
class TranslateFillZ(BaseOpCase):
    """reference translate_fillz.py TranslateFillz: j-collapsed (i, k)
    blocks (dp2) and (i, k, nq) tracers; max_error 1e-13, near-zero
    errors ignored for the tracers."""

    max_error = 1e-13
    ignore_near_zero_errors = ("q2tracers",)

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "dp2": VarSpec(istart=h, no_j=True),
            "q2tracers": VarSpec(istart=h, no_j=True),
            "nq": VarSpec(),
        }
        self.out_vars = {
            "q2tracers": VarSpec(istart=h, no_j=True),
        }

    def compute(self, inputs):
        import jax

        from pace_tpu.ops.fillz import fix_tracer

        dp2 = np.asarray(inputs["dp2"])          # (6, Ni, nz)
        qt = np.asarray(inputs["q2tracers"])     # (6, Ni, nz, nq)
        nq = int(inputs["nq"])
        fixed = jax.vmap(
            lambda q: fix_tracer(q, dp2), in_axes=-1, out_axes=-1
        )(qt[..., :nq])
        out = qt.copy()
        out[..., :nq] = np.asarray(fixed)
        return {"q2tracers": out}


@register("Remapping")
class TranslateRemapping(BaseOpCase):
    """reference translate_remapping.py: the full Lagrangian->Eulerian
    vertical remap.  pe/peln are (i, k, j)-ordered; ak/bk/pfull are
    per-rank column data.  max_error 2e-8 matches the reference."""

    max_error = 2e-8
    near_zero = 3e-18
    ignore_near_zero_errors = ("q_con",) + TranslateTracer2D1L.TRACERS

    TRACERS = ("qvapor", "qliquid", "qice", "qrain", "qsnow", "qgraupel",
               "qcld")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {name: VarSpec() for name in self.TRACERS}
        for name in ("w", "u", "v", "delz", "pt", "delp", "cappa",
                     "q_con", "ps"):
            self.in_vars[name] = VarSpec()
        self.in_vars["pkz"] = VarSpec(istart=h, jstart=h)
        self.in_vars["pk"] = VarSpec(istart=h, jstart=h)
        self.in_vars["peln"] = VarSpec(istart=h, jstart=h, kaxis=1)
        self.in_vars["pe"] = VarSpec(istart=h - 1, jstart=h - 1, kaxis=1)
        self.in_vars["hs"] = VarSpec(serialname="phis")
        self.in_vars["wsd"] = VarSpec(istart=h, jstart=h)
        for p in ("ptop", "akap", "zvir", "last_step", "consv_te", "mdt"):
            self.in_vars[p] = VarSpec()
        self.out_vars = {name: VarSpec() for name in self.TRACERS}
        for name in ("pt", "delp", "delz", "q_con", "u", "v", "w", "ps",
                     "cappa"):
            self.out_vars[name] = VarSpec()
        self.out_vars["pkz"] = VarSpec(istart=h, jstart=h)
        self.out_vars["pk"] = VarSpec(istart=h, jstart=h)
        self.out_vars["peln"] = VarSpec(istart=h, jstart=h, kaxis=1)
        self.out_vars["pe"] = VarSpec(istart=h - 1, jstart=h - 1, kaxis=1)
        self.stagger = {"u": (0, 1), "v": (1, 0)}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.ops.remapping import lagrangian_to_eulerian

        tracers = {name: jnp.asarray(inputs[name])
                   for name in self.TRACERS}
        tracers["qo3mr"] = jnp.zeros_like(tracers["qvapor"])
        tracers["qsgs_tke"] = jnp.zeros_like(tracers["qvapor"])
        out = lagrangian_to_eulerian(
            tracers, jnp.asarray(inputs["pt"]),
            jnp.asarray(inputs["delp"]), jnp.asarray(inputs["delz"]),
            jnp.asarray(inputs["peln"]), jnp.asarray(inputs["u"]),
            jnp.asarray(inputs["v"]), jnp.asarray(inputs["w"]),
            jnp.asarray(inputs["cappa"]), jnp.asarray(inputs["q_con"]),
            jnp.asarray(inputs["pkz"]), jnp.asarray(inputs["pk"]),
            jnp.asarray(inputs["pe"]), jnp.asarray(inputs["hs"]),
            jnp.asarray(inputs["ps"]), jnp.asarray(inputs["wsd"]),
            self.gd, self.config, self.n, self.h,
            bool(inputs["last_step"]), float(inputs["consv_te"]),
            float(inputs["mdt"]),
        )
        result = {name: np.asarray(out["tracers"][name])
                  for name in self.TRACERS}
        for name in ("pt", "delp", "delz", "q_con", "u", "v", "w", "ps",
                     "cappa", "pkz", "pk", "peln", "pe"):
            result[name] = np.asarray(out[name])
        return result


@register("FVDynamics")
class TranslateFVDynamics(BaseOpCase):
    """reference translate_fvdynamics.py: the whole dycore step.  In/out
    variables mirror the checkpointer's FVDynamics-In/-Out savepoints
    (fv_dynamics.py:321-341)."""

    max_error = 3e-5  # the reference TranslateDriver coupled tolerance

    FIELDS = ("u", "v", "w", "delp", "pt", "delz", "qvapor", "qliquid",
              "qice", "qrain", "qsnow", "qgraupel", "qcld", "ps", "pe",
              "pk", "peln", "pkz", "phis", "q_con", "omga", "ua", "va",
              "uc", "vc", "mfxd", "mfyd", "cxd", "cyd", "diss_estd")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {name: VarSpec() for name in self.FIELDS}
        self.in_vars["pe"] = VarSpec(istart=h - 1, jstart=h - 1, kaxis=1)
        self.in_vars["peln"] = VarSpec(istart=h, jstart=h, kaxis=1)
        self.in_vars["pk"] = VarSpec(istart=h, jstart=h)
        self.in_vars["pkz"] = VarSpec(istart=h, jstart=h)
        self.in_vars["mfxd"] = VarSpec(istart=h, jstart=h)
        self.in_vars["mfyd"] = VarSpec(istart=h, jstart=h)
        self.in_vars["cxd"] = VarSpec(istart=h)
        self.in_vars["cyd"] = VarSpec(jstart=h)
        self.in_vars["bdt"] = VarSpec()
        self.out_vars = dict(self.in_vars)
        del self.out_vars["bdt"]
        self.stagger = {
            "u": (0, 1), "vc": (0, 1), "v": (1, 0), "uc": (1, 0),
            "mfxd": (1, 0), "cxd": (1, 0), "mfyd": (0, 1), "cyd": (0, 1),
        }

    def compute(self, inputs):
        import jax

        from pace_tpu.models.fv3.dynamics import DynamicalCore
        from pace_tpu.models.fv3.state import DycoreState, FIELD_METADATA

        arrays = {}
        for name in FIELD_METADATA:
            src = {"mfxd": "mfxd", "mfyd": "mfyd", "cxd": "cxd",
                   "cyd": "cyd", "diss_estd": "diss_estd",
                   "phis": "phis"}.get(name, name)
            if src in inputs:
                arrays[name] = np.asarray(inputs[src], self.dtype)
            else:
                # fields not serialized (qo3mr/qsgs_tke at init)
                arrays[name] = np.zeros_like(
                    np.asarray(inputs["qvapor"], self.dtype))
        state = DycoreState.from_numpy(arrays, dtype=arrays["u"].dtype)
        core = DynamicalCore(
            self.config, self.sizing, self.gd,
            timestep=float(inputs["bdt"]),
        )
        out = jax.jit(core.step_dynamics)(state)
        return {name: np.asarray(getattr(out, name))
                for name in self.out_vars}
