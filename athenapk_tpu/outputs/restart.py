"""Checkpoint / restart files (the reference's ``.rhdf`` analog).

Stores the full ghost-inclusive conserved state bit-exactly (f64), the
simulation clock, the deck (with recorded defaults), tracer arrays, and the
OU-forcing spectrum + RNG state — everything needed for bitwise-identical
resume (the reference guarantees bitwise restarts, ``CHANGELOG.md:50``;
OU state persistence mirrors ``turbulence::UserWorkBeforeOutput``).

Resume: ``python -m athenapk_tpu.driver -r file.rhdf`` (same convention as
the reference binary).
"""

from __future__ import annotations

import json
import os

import numpy as np


def write_restart(fname, sim):
    import h5py

    os.makedirs(os.path.dirname(fname) or ".", exist_ok=True)
    with h5py.File(fname, "w") as fh:
        info = fh.create_group("Info")
        info.attrs["Time"] = float(sim.t)
        info.attrs["NCycle"] = int(sim.ncycle)
        info.attrs["dt"] = float(sim.tm_dt if sim.tm_dt is not None else 0.0)
        info.attrs["OutputFormatVersion"] = 1
        fh.create_dataset("cons", data=np.asarray(sim.u))
        fh.create_dataset("Input", data=sim.pin.to_string().encode())
        # output trigger states so resumed runs continue the cadence
        trig = [(getattr(o, "next_time", 0.0), getattr(o, "count", 0))
                for o in sim.outputs]
        fh.create_dataset("OutputTriggers", data=np.asarray(trig))
        if sim.tracer_state is not None:
            g = fh.create_group("Tracers")
            for k, v in sim.tracer_state.items():
                g.create_dataset(k, data=np.asarray(v))
        # OU forcing state (turbulence)
        from ..pgen import turbulence as _turb
        fm = _turb._driver_cache.get(sim.pin)
        if fm is not None:
            g = fh.create_group("FewModesFT")
            var_hat, rng_state = fm.get_state()
            g.create_dataset("var_hat_r", data=var_hat.real)
            g.create_dataset("var_hat_i", data=var_hat.imag)
            g.attrs["rng_state"] = json.dumps(rng_state)


def read_restart(fname):
    """-> (pin, payload dict) for Simulation resume."""
    import h5py

    from ..config.parameter_input import ParameterInput

    with h5py.File(fname, "r") as fh:
        pin = ParameterInput.from_string(fh["Input"][()].decode())
        if fh["Info"].attrs.get("Refined", 0):
            return pin, read_restart_smr_payload(fh)
        payload = dict(
            t=float(fh["Info"].attrs["Time"]),
            ncycle=int(fh["Info"].attrs["NCycle"]),
            dt=float(fh["Info"].attrs["dt"]),
            cons=fh["cons"][()],
            triggers=fh["OutputTriggers"][()]
            if "OutputTriggers" in fh else None,
        )
        if "Tracers" in fh:
            payload["tracers"] = {k: fh["Tracers"][k][()]
                                  for k in fh["Tracers"]}
        if "FewModesFT" in fh:
            g = fh["FewModesFT"]
            payload["few_modes_ft"] = (
                g["var_hat_r"][()] + 1j * g["var_hat_i"][()],
                json.loads(g.attrs["rng_state"]))
    return pin, payload


def write_restart_smr(fname, sim):
    """Refined-mesh checkpoint: leaf table + per-level ghost-inclusive
    state (bit-exact) + derefinement counters + output trigger state."""
    import h5py

    os.makedirs(os.path.dirname(fname) or ".", exist_ok=True)
    sm = sim._smesh_now()
    with h5py.File(fname, "w") as fh:
        info = fh.create_group("Info")
        info.attrs["Time"] = float(sim.t)
        info.attrs["NCycle"] = int(sim.ncycle)
        info.attrs["dt"] = float(getattr(sim, "tm_dt", None) or 0.0)
        info.attrs["OutputFormatVersion"] = 1
        info.attrs["Refined"] = 1
        fh.create_dataset("Input", data=sim.pin.to_string().encode())
        fh.create_dataset("Levels", data=np.asarray(sm.levels, np.int32))
        fh.create_dataset("LogicalLocations", data=np.stack(
            [sm.lx1, sm.lx2, sm.lx3], axis=1).astype(np.int64))
        for lev, u in sim.state.items():
            fh.create_dataset(f"cons_lev{lev}", data=np.asarray(u))
        if getattr(sim, "tracer_state", None) is not None:
            g = fh.create_group("Tracers")
            g.create_dataset("n_lost",
                             data=np.asarray(sim.tracer_state["n_lost"]))
            for lev, st in sim.tracer_state["levels"].items():
                gl = g.create_group(f"lev{lev}")
                for k, v in st.items():
                    gl.create_dataset(k, data=np.asarray(v))
        if sim.adaptive:
            counts = {json.dumps(k): v for k, v in
                      sim.driver._deref_counts.items()}
            fh.create_dataset("DerefCounts",
                              data=json.dumps(counts).encode())
        # OU forcing state (turbulence on refined meshes)
        from ..pgen import turbulence as _turb
        fm = _turb._smr_cache.get(sim.pin)
        if fm is not None:
            g = fh.create_group("FewModesFT")
            var_hat, rng_state = fm.get_state()
            g.create_dataset("var_hat_r", data=var_hat.real)
            g.create_dataset("var_hat_i", data=var_hat.imag)
            g.attrs["rng_state"] = json.dumps(rng_state)
        # trigger order must match SmrSimulation's restore zip:
        # hdf5 outs, then rst outs, then the hst trigger last
        trig = [(o["next"], o["count"])
                for o in sim._hdf5_outs + sim._rst_outs]
        trig.append((sim._hst.next_time if sim._hst is not None else 0.0,
                     0))
        fh.create_dataset("OutputTriggers", data=np.asarray(trig))


def read_restart_smr_payload(fh):
    """Payload dict from an open refined-mesh restart file."""
    payload = dict(
        t=float(fh["Info"].attrs["Time"]),
        ncycle=int(fh["Info"].attrs["NCycle"]),
        levels=fh["Levels"][()],
        logical_locations=fh["LogicalLocations"][()],
        state={int(k.split("cons_lev")[1]): fh[k][()]
               for k in fh if k.startswith("cons_lev")},
        triggers=fh["OutputTriggers"][()]
        if "OutputTriggers" in fh else None,
    )
    if "DerefCounts" in fh:
        raw = json.loads(fh["DerefCounts"][()].decode())
        payload["deref_counts"] = {tuple(json.loads(k)): v
                                   for k, v in raw.items()}
    if "Tracers" in fh:
        g = fh["Tracers"]
        payload["tracers"] = {
            "n_lost": g["n_lost"][()],
            "levels": {int(k.split("lev")[1]): {f: g[k][f][()]
                                                for f in g[k]}
                       for k in g if k.startswith("lev")}}
    if "FewModesFT" in fh:
        g = fh["FewModesFT"]
        payload["few_modes_ft"] = (
            g["var_hat_r"][()] + 1j * g["var_hat_i"][()],
            json.loads(g.attrs["rng_state"]))
    return payload
