"""Physics translate cases: reference physics savepoint classes ->
pace_tpu physics ops.

Mirrors every class under /root/reference/physics/tests/savepoint/
translate/ (10 classes), declaring the same serialized variable names
and the GFS "IPD" block layouts ((cn*cn, nz) Fortran blocks with k
stored surface-up — VarSpec phys_order/microph in utils/translate.py,
the analogue of translate_physics.py transform_*_serialized_data).

Like the dycore registry (translate_cases.py) these are self-validated
through the decompose -> savepoint -> assemble -> compute -> validate
round trip until real Serialbox data lands.
"""

from __future__ import annotations

import numpy as np

from pace_tpu.models.physics.config import PhysicsConfig
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils.translate import VarSpec
from pace_tpu.utils.translate_cases import (
    BaseOpCase,
    TranslateFVDynamics,
    _TracersMixin,
    register,
    smooth_field,
)

GFS_TRACERS = ("qvapor", "qliquid", "qrain", "qice", "qsnow", "qgraupel",
               "qo3mr", "qsgs_tke", "qcld")


class BasePhysCase(BaseOpCase):
    """BaseOpCase plus the physics namelist bundle."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.phys_config = PhysicsConfig(npz=self.sizing.nz)

    def _physics_state(self, inputs, dtype=np.float64):
        """PhysicsState with the given fields; the rest zeros."""
        import jax.numpy as jnp

        from pace_tpu.models.physics.physics_state import PhysicsState

        shape3 = np.asarray(inputs["pt"]).shape
        state = PhysicsState.init_zeros(shape3, dtype=jnp.float64)
        import dataclasses

        known = {f.name for f in dataclasses.fields(PhysicsState)}
        repl = {k: jnp.asarray(v) for k, v in inputs.items() if k in known}
        return dataclasses.replace(state, **repl)


@register("AtmosPhysDriverStatein")
class TranslateAtmosPhysDriverStatein(BasePhysCase):
    """reference translate_atmos_phy_statein.py: dycore fields ->
    GFS statein blocks (IPD_prsik/prsi/phii/tgrs/qgrs/prsl)."""

    DYCORE = ("delz", "delp", "qvapor", "qliquid", "qrain", "qice",
              "qsnow", "qgraupel", "qo3mr", "qcld", "pt")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "prsik": VarSpec(serialname="IPD_prsik", phys_order="F"),
            "phii": VarSpec(serialname="IPD_phii", phys_order="F"),
            "prsi": VarSpec(serialname="IPD_prsi", phys_order="F"),
        }
        for name in self.DYCORE:
            self.in_vars[name] = VarSpec()
        self.out_vars = {
            "prsik": VarSpec(serialname="IPD_prsik", phys_order="F"),
            "prsi": VarSpec(serialname="IPD_prsi", phys_order="F"),
            "phii": VarSpec(serialname="IPD_phii", phys_order="F"),
            "tgrs": VarSpec(serialname="IPD_tgrs", phys_order="F",
                            roll_zero=True),
            "qgrs": VarSpec(serialname="IPD_qgrs", phys_order="F"),
            "prsl": VarSpec(serialname="IPD_prsl", phys_order="F",
                            roll_zero=True),
        }

    def make_inputs(self, s0, s1, gd):
        nzi = self.sizing.nz + 1
        zi = np.zeros(s1["pt"].shape[:3] + (nzi,))
        d = {name: s1[name] for name in self.DYCORE if name in s1}
        d["qo3mr"] = np.zeros(s1["pt"].shape)
        d.update(prsik=zi, phii=zi, prsi=zi)
        return d

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.physics.physics import (
            atmos_phys_driver_statein,
        )
        from pace_tpu.utils import constants as con

        ptop = float(np.asarray(self.gd.vertical.ptop))
        state = self._physics_state(
            {k: inputs[k] for k in self.DYCORE if k in inputs}
        )
        import dataclasses

        state = dataclasses.replace(
            state, qsgs_tke=jnp.zeros_like(state.pt))
        out = atmos_phys_driver_statein(
            state, ptop, (ptop / 1.0e5) ** con.KAPPA,
            (1.0 / 1.0e5) ** con.KAPPA, nwat=6,
        )
        qgrs = np.stack(
            [np.asarray(getattr(out, name)) for name in GFS_TRACERS], -1)
        return {
            "prsik": np.asarray(out.prsik),
            "prsi": np.asarray(out.prsi),
            "phii": np.asarray(out.phii),
            "tgrs": np.asarray(inputs["pt"]),
            "qgrs": qgrs,
            "prsl": np.asarray(out.delp),
        }


@register("FillGFS")
class TranslateFillGFS(BasePhysCase):
    """reference translate_fillgfs.py: IPD_prsi + IPD_gq0 -> vapor
    column fill (fill_gfs_delp) -> IPD_qvapor."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "pe": VarSpec(serialname="IPD_prsi", phys_order="C"),
            "q": VarSpec(serialname="IPD_gq0", phys_order="C"),
        }
        self.out_vars = {
            "q": VarSpec(serialname="IPD_qvapor", phys_order="C"),
        }

    def make_inputs(self, s0, s1, gd):
        ptop = float(np.asarray(gd.vertical.ptop))
        pe = np.concatenate(
            [np.full(s1["pt"].shape[:3] + (1,), ptop),
             ptop + np.cumsum(s1["delp"], -1)], -1)
        q = np.stack([s1[t] for t in
                      ("qvapor", "qliquid", "qrain", "qice", "qsnow",
                       "qgraupel", "qcld")], -1)
        q[:, self.h + 1, self.h + 2, 3, 0] = -1e-9
        return {"pe": pe, "q": q}

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.coupler.update_atmos_state import (
            fill_gfs_delp,
        )

        pe = jnp.asarray(inputs["pe"])
        delp = pe[..., 1:] - pe[..., :-1]
        qv = fill_gfs_delp(delp, jnp.asarray(inputs["q"])[..., 0],
                           q_min=1.0e-9)
        out = np.array(inputs["q"])
        out[..., 0] = np.asarray(qv)
        return {"q": out}


@register("PrsFV3")
class TranslatePrsFV3(BasePhysCase):
    """reference translate_prsfv3.py: phii/prsi/tgrs/qgrs -> layer
    thickness del_ and dry del_gz (get_prs_fv3)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "phii": VarSpec(serialname="prs_phii", phys_order="C"),
            "prsi": VarSpec(serialname="prs_prsi", phys_order="C"),
            "tgrs": VarSpec(serialname="prs_tgrs", phys_order="C"),
            "qgrs": VarSpec(serialname="prs_qgrs", phys_order="C"),
            "del_": VarSpec(serialname="prs_del", phys_order="C"),
            "del_gz": VarSpec(serialname="prs_del_gz", phys_order="C",
                              roll_zero=True),
        }
        self.out_vars = {
            "del_": VarSpec(serialname="prs_del", phys_order="C"),
            "del_gz": VarSpec(serialname="prs_del_gz", phys_order="C",
                              roll_zero=True),
        }

    def make_inputs(self, s0, s1, gd):
        from pace_tpu.utils.translate_cases import gz_from_delz

        ptop = float(np.asarray(gd.vertical.ptop))
        phii = gz_from_delz(s1["phis"], s1["delz"]) * 9.80665
        prsi = np.concatenate(
            [np.full(s1["pt"].shape[:3] + (1,), ptop),
             ptop + np.cumsum(s1["delp"], -1)], -1)
        qgrs = np.stack([s1[t] for t in
                         ("qvapor", "qliquid", "qrain", "qice", "qsnow",
                          "qgraupel", "qcld")], -1)
        nzi = self.sizing.nz + 1
        return {
            "phii": phii, "prsi": prsi, "tgrs": s1["pt"], "qgrs": qgrs,
            "del_": np.zeros(s1["pt"].shape),
            "del_gz": np.zeros(s1["pt"].shape[:3] + (nzi,)),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.physics.physics import get_prs_fv3

        del_, del_gz = get_prs_fv3(
            jnp.asarray(inputs["phii"]), jnp.asarray(inputs["prsi"]),
            jnp.asarray(inputs["tgrs"]),
            jnp.asarray(inputs["qgrs"])[..., 0],
        )
        out_gz = np.array(inputs["del_gz"])
        out_gz[..., :np.asarray(del_gz).shape[-1]] = np.asarray(del_gz)
        return {"del_": np.asarray(del_), "del_gz": out_gz}


@register("PhiFV3")
class TranslatePhiFV3(BasePhysCase):
    """reference translate_phifv3.py: gt0/gq0/del_gz -> geopotentials
    phii/phil (get_phi_fv3)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "gt0": VarSpec(serialname="phi_gt0", phys_order="C"),
            "gq0": VarSpec(serialname="phi_gq0", phys_order="C"),
            "del_gz": VarSpec(serialname="phi_del_gz", phys_order="C",
                              roll_zero=True),
            "phii": VarSpec(serialname="phi_phii", phys_order="C"),
            "phil": VarSpec(serialname="phi_phil", phys_order="C"),
        }
        self.out_vars = {
            "del_gz": VarSpec(serialname="phi_del_gz", phys_order="C",
                              roll_zero=True),
            "phii": VarSpec(serialname="phi_phii", phys_order="C"),
            "phil": VarSpec(serialname="phi_phil", phys_order="C"),
        }

    def make_inputs(self, s0, s1, gd):
        import pace_tpu.utils.constants as con

        nzi = self.sizing.nz + 1
        gq0 = np.stack([s1[t] for t in
                        ("qvapor", "qliquid", "qrain", "qice", "qsnow",
                         "qgraupel", "qcld")], -1)
        del_gz = np.zeros(s1["pt"].shape[:3] + (nzi,))
        del_gz[..., :-1] = (
            -s1["delz"] * con.GRAV / s1["pt"]
            / (1.0 + con.ZVIR * s1["qvapor"])
        )
        return {
            "gt0": s1["pt"], "gq0": gq0, "del_gz": del_gz,
            "phii": np.zeros(s1["pt"].shape[:3] + (nzi,)),
            "phil": np.zeros(s1["pt"].shape),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.physics.physics import get_phi_fv3

        phii, phil = get_phi_fv3(
            jnp.asarray(inputs["gt0"]),
            jnp.asarray(inputs["gq0"])[..., 0],
            jnp.asarray(inputs["del_gz"])[..., :-1],
        )
        return {
            "del_gz": inputs["del_gz"], "phii": np.asarray(phii),
            "phil": np.asarray(phil),
        }


@register("PhysUpdatePressureSurfaceWinds")
class TranslatePhysUpdatePressureSurfaceWinds(BasePhysCase):
    """reference translate_update_pressure_sfc_winds_phys.py: dycore
    pressure fields + A-grid winds -> pe/peln/pk/ps/u_srf/v_srf."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "peln": VarSpec(istart=h, jstart=h, kaxis=1),
            "pk": VarSpec(istart=h, jstart=h),
            "delp": VarSpec(),
            "pe": VarSpec(istart=h - 1, jstart=h - 1, kaxis=1),
            "ps": VarSpec(), "ua": VarSpec(), "va": VarSpec(),
            "u_srf": VarSpec(), "v_srf": VarSpec(),
        }
        self.out_vars = {
            "pk": VarSpec(istart=h, jstart=h),
            "ps": VarSpec(), "u_srf": VarSpec(), "v_srf": VarSpec(),
        }

    def make_inputs(self, s0, s1, gd):
        shape2 = s1["ps"].shape
        return {
            "peln": s1["peln"], "pk": s1["pk"], "delp": s1["delp"],
            "pe": s1["pe"], "ps": s1["ps"], "ua": s1["ua"],
            "va": s1["va"], "u_srf": np.zeros(shape2),
            "v_srf": np.zeros(shape2),
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.coupler.fv_update_phys import (
            update_pressure_and_surface_winds,
        )

        pe, peln, pk, ps, u_srf, v_srf = (
            update_pressure_and_surface_winds(
                jnp.asarray(inputs["pe"]), jnp.asarray(inputs["delp"]),
                jnp.asarray(inputs["peln"]), jnp.asarray(inputs["pk"]),
                jnp.asarray(inputs["ua"]), jnp.asarray(inputs["va"]),
            )
        )
        return {
            "pk": np.asarray(pk), "ps": np.asarray(ps),
            "u_srf": np.asarray(u_srf), "v_srf": np.asarray(v_srf),
        }


@register("PhysUpdateTracers")
class TranslatePhysUpdateTracers(BasePhysCase):
    """reference translate_update_tracers_phys.py: physics-updated
    fields (t1) vs pre-physics (t0) -> wind/temperature tendencies and
    FV3 tracer/delp writeback."""

    T1 = {
        "physics_updated_pt": "pt_t1",
        "physics_updated_specific_humidity": "qvapor_t1",
        "physics_updated_qliquid": "qliquid_t1",
        "physics_updated_qrain": "qrain_t1",
        "physics_updated_qsnow": "qsnow_t1",
        "physics_updated_qice": "qice_t1",
        "physics_updated_qgraupel": "qgraupel_t1",
    }
    T0_TRACERS = ("qvapor_t0", "qliquid_t0", "qrain_t0", "qsnow_t0",
                  "qice_t0", "qgraupel_t0")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "u_dt": VarSpec(), "v_dt": VarSpec(),
            "pt_dt": VarSpec(serialname="t_dt"),
            "u_t1": VarSpec(phys_order="F"),
            "v_t1": VarSpec(phys_order="F"),
        }
        for name, serial in self.T1.items():
            self.in_vars[name] = VarSpec(serialname=serial,
                                         phys_order="F")
        for name in ("u_t0", "v_t0", "pt_t0"):
            self.in_vars[name] = VarSpec(phys_order="F")
        for name in self.T0_TRACERS:
            self.in_vars[name] = VarSpec()
        self.in_vars["prsi"] = VarSpec(serialname="IPD_prsi",
                                       phys_order="F")
        self.in_vars["delp"] = VarSpec(serialname="IPD_delp")
        self.in_vars["rdt"] = VarSpec()
        self.out_vars = {
            "u_dt": VarSpec(), "v_dt": VarSpec(),
            "pt_dt": VarSpec(serialname="t_dt"),
            "delp": VarSpec(serialname="IPD_delp"),
        }
        for name in self.T0_TRACERS:
            self.out_vars[name] = VarSpec()

    def make_inputs(self, s0, s1, gd):
        shape3 = s1["pt"].shape
        ptop = float(np.asarray(gd.vertical.ptop))
        prsi = np.concatenate(
            [np.full(shape3[:3] + (1,), ptop),
             ptop + np.cumsum(s1["delp"], -1)], -1)
        d = {
            "u_dt": np.zeros(shape3), "v_dt": np.zeros(shape3),
            "pt_dt": np.zeros(shape3),
            "u_t1": s1["ua"] + 0.01, "v_t1": s1["va"] + 0.01,
            "u_t0": s1["ua"], "v_t0": s1["va"], "pt_t0": s1["pt"],
            "prsi": prsi, "delp": s1["delp"], "rdt": 1.0 / 225.0,
        }
        d["physics_updated_pt"] = s1["pt"] + 0.05
        d["physics_updated_specific_humidity"] = s1["qvapor"] * 1.001
        for name, serial in self.T1.items():
            base = serial.replace("_t1", "")
            if name not in d:
                d[name] = s1[base] * 1.001
        for name in self.T0_TRACERS:
            d[name] = s1[name.replace("_t0", "")]
        return d

    def compute(self, inputs):
        import dataclasses

        import jax.numpy as jnp

        from pace_tpu.models.coupler.update_atmos_state import (
            prepare_tendencies_and_update_tracers,
        )
        from pace_tpu.models.physics.physics_state import PhysicsState

        state = PhysicsState.init_zeros(
            np.asarray(inputs["pt_t0"]).shape, dtype=jnp.float64)
        repl = {name: jnp.asarray(inputs[name]) for name in self.T1}
        repl.update(
            ua=jnp.asarray(inputs["u_t0"]),
            va=jnp.asarray(inputs["v_t0"]),
            pt=jnp.asarray(inputs["pt_t0"]),
            physics_updated_ua=jnp.asarray(inputs["u_t1"]),
            physics_updated_va=jnp.asarray(inputs["v_t1"]),
            prsi=jnp.asarray(inputs["prsi"]),
        )
        state = dataclasses.replace(state, **repl)
        dyc = {name.replace("_t0", ""): jnp.asarray(inputs[name])
               for name in self.T0_TRACERS}
        dyc["delp"] = jnp.asarray(inputs["delp"])
        u_dt, v_dt, pt_dt, new_tracers, new_delp = (
            prepare_tendencies_and_update_tracers(
                jnp.asarray(inputs["u_dt"]), jnp.asarray(inputs["v_dt"]),
                jnp.asarray(inputs["pt_dt"]), state, dyc,
                float(inputs["rdt"]),
            )
        )
        result = {
            "u_dt": np.asarray(u_dt), "v_dt": np.asarray(v_dt),
            "pt_dt": np.asarray(pt_dt), "delp": np.asarray(new_delp),
        }
        for name in self.T0_TRACERS:
            result[name] = np.asarray(
                new_tracers[name.replace("_t0", "")])
        return result


@register("Microph")
class TranslateMicroph(BasePhysCase):
    """reference translate_microphysics.py TranslateMicroph: GFDL
    cloud microphysics one call -> tendencies (mph_* blocks)."""

    IN3 = {
        "qvapor": "mph_qv1", "qliquid": "mph_ql1", "qrain": "mph_qr1",
        "qice": "mph_qi1", "qsnow": "mph_qs1", "qgraupel": "mph_qg1",
        "qcld": "mph_qa1", "ua": "mph_uin", "va": "mph_vin",
        "delprsi": "mph_delp", "wmp": "mph_w", "delz": "mph_dz",
        "pt": "mph_pt",
    }
    OUT = {
        "pt_dt": "mph_pt_dt", "qv_dt": "mph_qv_dt", "ql_dt": "mph_ql_dt",
        "qr_dt": "mph_qr_dt", "qi_dt": "mph_qi_dt", "qs_dt": "mph_qs_dt",
        "qg_dt": "mph_qg_dt", "qa_dt": "mph_qa_dt", "udt": "mph_udt",
        "vdt": "mph_vdt",
    }

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            name: VarSpec(serialname=serial, microph=True)
            for name, serial in self.IN3.items()
        }
        self.in_vars["land"] = VarSpec(serialname="mph_land",
                                       microph=True)
        self.out_vars = {
            name: VarSpec(serialname=serial, microph=True)
            for name, serial in self.OUT.items()
        }

    def make_inputs(self, s0, s1, gd):
        d = {name: s1[name.replace("wmp", "w")
                      .replace("delprsi", "delp")]
             for name in self.IN3
             if name not in ("delprsi", "wmp")}
        d["delprsi"] = s1["delp"]
        d["wmp"] = s1["w"]
        d["land"] = np.zeros(s1["ps"].shape)
        return d

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.physics.microphysics import (
            Microphysics,
            MicrophysicsState,
        )
        from pace_tpu.models.physics.physics import prepare_microphysics

        pt = jnp.asarray(inputs["pt"])
        delp = jnp.asarray(inputs["delprsi"])
        state = MicrophysicsState(
            pt=pt,
            qvapor=jnp.asarray(inputs["qvapor"]),
            qliquid=jnp.asarray(inputs["qliquid"]),
            qrain=jnp.asarray(inputs["qrain"]),
            qice=jnp.asarray(inputs["qice"]),
            qsnow=jnp.asarray(inputs["qsnow"]),
            qgraupel=jnp.asarray(inputs["qgraupel"]),
            qcld=jnp.asarray(inputs["qcld"]),
            ua=jnp.asarray(inputs["ua"]),
            va=jnp.asarray(inputs["va"]),
            delp=delp, delz=jnp.asarray(inputs["delz"]),
            omga=jnp.zeros_like(pt), delprsi=delp,
            wmp=jnp.asarray(inputs["wmp"]),
            dz=jnp.asarray(inputs["delz"]),
            land=jnp.asarray(inputs["land"]),
        )
        mp = Microphysics(self.phys_config, self.gd.horizontal.area,
                          timestep=225.0)
        out = mp(state)
        return {name: np.asarray(out[name]) for name in self.OUT}


@register("GFSPhysicsDriver")
class TranslateGFSPhysicsDriver(BasePhysCase):
    """reference translate_gfs_physics_driver.py: the whole Physics
    driver call (statein -> prs/phi -> microphysics -> updated
    prognostics as IPD_g*0 blocks)."""

    DYCORE = GFS_TRACERS + ("pt", "delp", "delz", "ua", "va", "w",
                            "omga")
    OUT = {
        "gt0": "IPD_gt0", "gu0": "IPD_gu0", "gv0": "IPD_gv0",
        "qvapor": "IPD_qvapor", "qliquid": "IPD_qliquid",
        "qrain": "IPD_rain", "qice": "IPD_qice", "qsnow": "IPD_snow",
        "qgraupel": "IPD_qgraupel", "qcld": "IPD_qcld",
    }

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {name: VarSpec() for name in self.DYCORE}
        self.out_vars = {
            name: VarSpec(serialname=serial, phys_order="F")
            for name, serial in self.OUT.items()
        }

    def make_inputs(self, s0, s1, gd):
        d = {name: s1[name] for name in self.DYCORE if name in s1}
        d["qo3mr"] = np.zeros(s1["pt"].shape)
        d["qsgs_tke"] = np.zeros(s1["pt"].shape)
        return d

    def compute(self, inputs):
        import jax

        from pace_tpu.models.physics.physics import Physics

        ptop = float(np.asarray(self.gd.vertical.ptop))
        state = self._physics_state(
            {k: inputs[k] for k in self.DYCORE})
        phys = Physics(self.phys_config, self.gd.horizontal.area, ptop,
                       timestep=225.0)
        out = jax.jit(phys)(state)
        return {
            "gt0": np.asarray(out.physics_updated_pt),
            "gu0": np.asarray(out.physics_updated_ua),
            "gv0": np.asarray(out.physics_updated_va),
            "qvapor": np.asarray(
                out.physics_updated_specific_humidity),
            "qliquid": np.asarray(out.physics_updated_qliquid),
            "qrain": np.asarray(out.physics_updated_qrain),
            "qice": np.asarray(out.physics_updated_qice),
            "qsnow": np.asarray(out.physics_updated_qsnow),
            "qgraupel": np.asarray(out.physics_updated_qgraupel),
            "qcld": np.asarray(out.physics_updated_cloud_fraction),
        }


@register("FVUpdatePhys")
class TranslateFVUpdatePhys(BasePhysCase, _TracersMixin):
    """reference translate_fv_update_phys.py TranslateFVUpdatePhys:
    apply physics tendencies back to the D-grid dycore state (multi-
    rank: includes the u_dt/v_dt halo update + A->D projection)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        h = self.h
        self.in_vars = {
            "u_dt": VarSpec(), "v_dt": VarSpec(), "t_dt": VarSpec(),
            "ua": VarSpec(), "va": VarSpec(), "u": VarSpec(),
            "v": VarSpec(),
        }
        for name in self.TRACERS[:6]:
            self.in_vars[name] = VarSpec()
        self.in_vars["peln"] = VarSpec(istart=h, jstart=h, kaxis=1)
        self.in_vars["delp"] = VarSpec()
        self.in_vars["pt"] = VarSpec()
        self.in_vars["ps"] = VarSpec()
        self.in_vars["pe"] = VarSpec(istart=h - 1, jstart=h - 1,
                                     kaxis=1)
        self.in_vars["pk"] = VarSpec(istart=h, jstart=h)
        self.in_vars["dt"] = VarSpec()
        self.out_vars = {
            name: VarSpec() for name in self.TRACERS[:6]
        }
        for name in ("pt", "u", "v", "ua", "va"):
            self.out_vars[name] = VarSpec()
        self.stagger = {"u": (0, 1), "v": (1, 0)}

    def make_inputs(self, s0, s1, gd):
        shape3 = s1["pt"].shape
        d = {name: s1[name] for name in self.TRACERS[:6]}
        d.update(
            u_dt=smooth_field(shape3, 41, 1e-4),
            v_dt=smooth_field(shape3, 42, 1e-4),
            t_dt=smooth_field(shape3, 43, 1e-5),
            ua=s1["ua"], va=s1["va"], u=s1["u"], v=s1["v"],
            peln=s1["peln"], delp=s1["delp"], pt=s1["pt"],
            ps=s1["ps"], pe=s1["pe"], pk=s1["pk"], dt=225.0,
        )
        return d

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.coupler.fv_update_phys import (
            apply_physics_to_dycore,
        )

        topo = get_topology(self.n, self.h)
        s = {name: jnp.asarray(inputs[name]) for name in
             self.TRACERS[:6] + ("u", "v", "ua", "va", "pt", "pe",
                                 "peln", "pk", "ps", "delp")}
        s, _u_srf, _v_srf = apply_physics_to_dycore(
            s, jnp.asarray(inputs["u_dt"]),
            jnp.asarray(inputs["v_dt"]),
            jnp.asarray(inputs["t_dt"]), self.gd, topo, self.n, self.h,
            c2l_order=4, dt=float(inputs["dt"]),
        )
        out = {name: np.asarray(s[name]) for name in self.TRACERS[:6]}
        for name in ("pt", "u", "v", "ua", "va"):
            out[name] = np.asarray(s[name])
        return out


@register("Driver")
class TranslateDriver(TranslateFVDynamics):
    """reference physics translate_driver.py TranslateDriver: ONE
    coupled dycore+physics step validated end-to-end (the reference
    builds a full Driver with the 'predefined' initializer; max_error
    3e-5).  Inherits the FVDynamics savepoint variable set."""

    max_error = 3e-5

    def compute(self, inputs):
        import jax

        from pace_tpu.models.coupler import (
            DycoreToPhysics,
            UpdateAtmosphereState,
        )
        from pace_tpu.models.fv3.dynamics import DynamicalCore
        from pace_tpu.models.fv3.state import DycoreState, FIELD_METADATA
        from pace_tpu.models.physics.physics import Physics

        import jax.numpy as jnp

        arrays = {}
        for name in FIELD_METADATA:
            if name in inputs:
                arrays[name] = np.asarray(inputs[name], self.dtype)
            else:
                arrays[name] = np.zeros_like(
                    np.asarray(inputs["qvapor"], self.dtype))
        state = DycoreState.from_numpy(arrays, dtype=arrays["u"].dtype)
        dt = float(inputs["bdt"])
        core = DynamicalCore(self.config, self.sizing, self.gd,
                             timestep=dt)
        ptop = float(np.asarray(self.gd.vertical.ptop))
        phys_config = PhysicsConfig(npz=self.sizing.nz, dt_atmos=dt)
        physics = Physics(phys_config, self.gd.horizontal.area, ptop,
                          dt)
        d2p = DycoreToPhysics(self.sizing, dtype=jnp.float64)
        update = UpdateAtmosphereState(self.gd, core.topo, self.sizing,
                                       dt)

        def step(s):
            s = core.step_dynamics(s)
            phy = d2p(s)
            phy = physics(phy)
            return update(s, phy)

        out = jax.jit(step)(state)
        return {name: np.asarray(getattr(out, name))
                for name in self.out_vars}


@register("UpdateDWindsPhys")
class TranslateUpdateDWindsPhys(BasePhysCase):
    """reference stencils translate_update_dwind_phys.py
    TranslateUpdateDWindsPhys: A-grid wind tendencies projected onto the
    D-grid winds (AGrid2DGridPhysics; here
    models/coupler/update_dwind_phys.py update_dwind_phys)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.in_vars = {
            "u": VarSpec(), "u_dt": VarSpec(),
            "v": VarSpec(), "v_dt": VarSpec(),
            "dt": VarSpec(),
        }
        self.out_vars = {"u": VarSpec(), "v": VarSpec()}
        self.stagger = {"u": (0, 1), "v": (1, 0)}

    def make_inputs(self, s0, s1, gd):
        shape3 = s1["pt"].shape
        return {
            "u": s1["u"], "v": s1["v"],
            "u_dt": smooth_field(shape3, 71, 1e-4),
            "v_dt": smooth_field(shape3, 72, 1e-4),
            "dt": 225.0,
        }

    def compute(self, inputs):
        import jax.numpy as jnp

        from pace_tpu.models.coupler.update_dwind_phys import (
            update_dwind_phys,
        )

        topo = get_topology(self.n, self.h)
        u, v = update_dwind_phys(
            jnp.asarray(inputs["u"]), jnp.asarray(inputs["v"]),
            jnp.asarray(inputs["u_dt"]), jnp.asarray(inputs["v_dt"]),
            self.gd, topo, self.n, self.h, float(inputs["dt"]),
        )
        return {"u": np.asarray(u), "v": np.asarray(v)}
