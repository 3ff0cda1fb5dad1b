"""Block-structured HDF5 dumps (``.phdf``) and restart files.

Serves the role of Parthenon's HDF5 outputs (reference ``docs/input.md``
output blocks; written per ``<parthenon/output*>`` deck block with
``file_type = hdf5``).  The schema is a compact block-structured layout:

  /Info            attrs: Time, dt, NCycle, NumMeshBlocks, MeshBlockSize,
                   NGhost, Coordinates, ProblemId, Fluid
  /Locations/{x,y,z}   cell-center coordinates [nblocks, n_interior]
  /cons | /prim    [nblocks, nvar, nz, ny, nx] interior data (f64 or f32)
  /VarNames_{cons,prim}  component labels

``read_phdf`` is the matching reader used by the regression suites (the
reference reads its dumps with Parthenon's ``phdf`` Python class; we ship
our own equivalent).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.mesh import Mesh

_CONS_NAMES = {
    "euler": ["dens", "mom1", "mom2", "mom3", "ener"],
    "glmmhd": ["dens", "mom1", "mom2", "mom3", "ener",
               "B1", "B2", "B3", "psi"],
}
_PRIM_NAMES = {
    "euler": ["rho", "vel1", "vel2", "vel3", "pres"],
    "glmmhd": ["rho", "vel1", "vel2", "vel3", "pres",
               "B1", "B2", "B3", "psi"],
}


def write_phdf(filename: str, mesh: Mesh, fluid: str, t, dt, ncycle,
               cons: Optional[np.ndarray] = None,
               prim: Optional[np.ndarray] = None,
               single_precision: bool = False,
               extra_params: Optional[dict] = None,
               write_xdmf: bool = True,
               swarms: Optional[dict] = None):
    """``swarms``: {name: {var: np.ndarray[n_active]}} — compacted swarm
    data written as one HDF5 group per swarm (the reference's
    ``swarms = tracers`` output-block option, ``docs/input.md:353-366``)."""
    import h5py

    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    sl = mesh.interior_slices
    out_dtype = np.float32 if single_precision else np.float64
    with h5py.File(filename, "w") as fh:
        info = fh.create_group("Info")
        info.attrs["Time"] = float(t)
        info.attrs["dt"] = float(dt)
        info.attrs["NCycle"] = int(ncycle)
        info.attrs["NumMeshBlocks"] = mesh.nblocks
        info.attrs["MeshBlockSize"] = np.asarray(
            [mesh.mbnx1, mesh.mbnx2, mesh.mbnx3])
        info.attrs["RootGridSize"] = np.asarray([mesh.nx1, mesh.nx2, mesh.nx3])
        info.attrs["RootGridDomain"] = np.asarray(
            [mesh.x1min, mesh.x1max, mesh.x2min, mesh.x2max,
             mesh.x3min, mesh.x3max])
        info.attrs["NGhost"] = mesh.nghost
        info.attrs["Coordinates"] = "UniformCartesian"
        if extra_params:
            par = fh.create_group("Params")
            for k, v in extra_params.items():
                par.attrs[k] = v

        x, y, z = mesh.cell_centers()
        loc = fh.create_group("Locations")
        loc.create_dataset("x", data=x[:, mesh.ng1:mesh.ng1 + mesh.mbnx1])
        loc.create_dataset("y", data=y[:, mesh.ng2:mesh.ng2 + mesh.mbnx2])
        loc.create_dataset("z", data=z[:, mesh.ng3:mesh.ng3 + mesh.mbnx3])

        for name, arr, labels in (("cons", cons, _CONS_NAMES),
                                  ("prim", prim, _PRIM_NAMES)):
            if arr is None:
                continue
            data = np.asarray(arr)[sl].astype(out_dtype)
            fh.create_dataset(name, data=data)
            base = labels[fluid]
            nscal = data.shape[1] - len(base)
            names = base + [f"scalar{i}" for i in range(nscal)]
            fh.create_dataset(
                f"VarNames_{name}",
                data=np.array([s.encode() for s in names]))
        if swarms:
            for sname, fields in swarms.items():
                g = fh.create_group(sname)
                for var, data in fields.items():
                    d = np.asarray(data)
                    if d.dtype.kind == "f" and single_precision:
                        d = d.astype(np.float32)
                    g.create_dataset(var, data=d)
                g.attrs["NumParticles"] = len(next(iter(fields.values()))) \
                    if fields else 0
    if write_xdmf:
        _write_xdmf(filename, mesh, fluid, t, cons is not None,
                    prim is not None)


def _write_xdmf(h5name: str, mesh: Mesh, fluid: str, t, has_cons, has_prim):
    """XDMF sidecar so ParaView/VisIt can open the dumps (the reference's
    Parthenon outputs ship .xdmf next to each .phdf)."""
    import os as _os
    base = _os.path.basename(h5name)
    lines = ['<?xml version="1.0" ?>',
             '<Xdmf Version="3.0">', '<Domain>',
             f'<Grid Name="mesh" GridType="Collection" '
             f'CollectionType="Spatial">',
             f'<Time Value="{float(t)}"/>']
    nb = mesh.nblocks
    nz, ny, nx = mesh.mbnx3, mesh.mbnx2, mesh.mbnx1
    for b in range(nb):
        x0, y0, z0 = mesh.block_origin(b)
        lines += [
            f'<Grid Name="block{b}" GridType="Uniform">',
            f'<Topology TopologyType="3DCoRectMesh" '
            f'Dimensions="{nz + 1} {ny + 1} {nx + 1}"/>',
            '<Geometry GeometryType="ORIGIN_DXDYDZ">',
            f'<DataItem Dimensions="3" Format="XML">'
            f'{z0} {y0} {x0}</DataItem>',
            f'<DataItem Dimensions="3" Format="XML">'
            f'{mesh.dx3} {mesh.dx2} {mesh.dx1}</DataItem>',
            '</Geometry>']
        for kind, present in (("cons", has_cons), ("prim", has_prim)):
            if not present:
                continue
            labels = (_CONS_NAMES if kind == "cons" else _PRIM_NAMES)[fluid]
            for vi, lab in enumerate(labels):
                lines += [
                    f'<Attribute Name="{lab}" Center="Cell">',
                    f'<DataItem ItemType="HyperSlab" '
                    f'Dimensions="1 1 {nz} {ny} {nx}" Type="HyperSlab">',
                    f'<DataItem Dimensions="3 5" Format="XML">'
                    f'{b} {vi} 0 0 0  1 1 1 1 1  1 1 {nz} {ny} {nx}'
                    f'</DataItem>',
                    f'<DataItem Format="HDF" Dimensions='
                    f'"{nb} {len(labels)} {nz} {ny} {nx}">'
                    f'{base}:/{kind}</DataItem>',
                    '</DataItem>', '</Attribute>']
        lines.append('</Grid>')
    lines += ['</Grid>', '</Domain>', '</Xdmf>']
    with open(h5name + ".xdmf", "w") as fh:
        fh.write("\n".join(lines))


class PhdfData:
    """Loaded dump: attributes mirror what the regression suites need."""

    def __init__(self, filename):
        import h5py

        with h5py.File(filename, "r") as fh:
            info = fh["Info"].attrs
            self.time = float(info["Time"])
            self.ncycle = int(info["NCycle"])
            self.num_blocks = int(info["NumMeshBlocks"])
            self.block_size = tuple(info["MeshBlockSize"])
            self.root_grid = tuple(info["RootGridSize"])
            self.domain = tuple(info["RootGridDomain"])
            self.x = fh["Locations/x"][()]
            self.y = fh["Locations/y"][()]
            self.z = fh["Locations/z"][()]
            self.data = {}
            self.var_names = {}
            for name in ("cons", "prim"):
                if name in fh:
                    self.data[name] = fh[name][()]
                    self.var_names[name] = [
                        s.decode() for s in fh[f"VarNames_{name}"][()]]
            self.swarms = {}
            for name in fh:
                if isinstance(fh[name], h5py.Group) and \
                        "NumParticles" in fh[name].attrs:
                    self.swarms[name] = {k: fh[name][k][()]
                                         for k in fh[name]}

    def flat(self, kind: str):
        """Reassemble blocks into one global array [nvar, NZ, NY, NX].

        Assumes the regular block ordering of ``Mesh`` (x fastest).
        """
        arr = self.data[kind]
        nb, nvar, bz, by, bx = arr.shape
        nx1, nx2, nx3 = self.root_grid
        n1, n2, n3 = nx1 // bx, nx2 // by, nx3 // bz
        grid = arr.reshape(n3, n2, n1, nvar, bz, by, bx)
        grid = grid.transpose(3, 0, 4, 1, 5, 2, 6)
        return grid.reshape(nvar, nx3, nx2, nx1)


def read_phdf(filename) -> PhdfData:
    return PhdfData(filename)


def write_phdf_smr(filename: str, smesh, fluid: str, t, dt, ncycle,
                   state=None, prim_state=None,
                   single_precision: bool = False,
                   extra_params: Optional[dict] = None,
                   write_xdmf: bool = True,
                   swarms: Optional[dict] = None):
    """Refined-mesh dump: every leaf is a block with its own coordinates
    and level (Parthenon's mixed-level .phdf layout — blocks carry
    per-block Locations plus /Levels and /LogicalLocations).

    ``state``/``prim_state``: {level: [nb, nvar, NZ, NY, NX]} batched
    leaf arrays (ghost-inclusive); written in global leaf-id order.
    """
    import h5py

    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    b = smesh.base
    g = b.nghost
    nz, ny, nx = b.mbnx3, b.mbnx2, b.mbnx1
    nleaves = int(smesh.levels.size)
    out_dtype = np.float32 if single_precision else np.float64

    def gather(st):
        nvar = next(iter(st.values())).shape[1]
        data = np.empty((nleaves, nvar, nz, ny, nx), out_dtype)
        for lev, ids in smesh.level_ids.items():
            arr = np.asarray(st[lev])[:, :, g:g + nz, g:g + ny, g:g + nx]
            data[ids] = arr.astype(out_dtype)
        return data

    with h5py.File(filename, "w") as fh:
        info = fh.create_group("Info")
        info.attrs["Time"] = float(t)
        info.attrs["dt"] = float(dt)
        info.attrs["NCycle"] = int(ncycle)
        info.attrs["NumMeshBlocks"] = nleaves
        info.attrs["MeshBlockSize"] = np.asarray([nx, ny, nz])
        info.attrs["RootGridSize"] = np.asarray([b.nx1, b.nx2, b.nx3])
        info.attrs["RootGridDomain"] = np.asarray(
            [b.x1min, b.x1max, b.x2min, b.x2max, b.x3min, b.x3max])
        info.attrs["NGhost"] = b.nghost
        info.attrs["Coordinates"] = "UniformCartesian"
        info.attrs["MaxLevel"] = int(smesh.max_level)
        if extra_params:
            par = fh.create_group("Params")
            for k, v in extra_params.items():
                par.attrs[k] = v

        fh.create_dataset("Levels", data=np.asarray(smesh.levels,
                                                    np.int32))
        fh.create_dataset("LogicalLocations", data=np.stack(
            [smesh.lx1, smesh.lx2, smesh.lx3], axis=1).astype(np.int64))

        x = np.empty((nleaves, nx))
        y = np.empty((nleaves, ny))
        z = np.empty((nleaves, nz))
        for gid in range(nleaves):
            xs, ys, zs = smesh.cell_centers_leaf(gid)
            x[gid] = xs.ravel()[g:g + nx]
            y[gid] = ys.ravel()[g:g + ny]
            z[gid] = zs.ravel()[g:g + nz]
        loc = fh.create_group("Locations")
        loc.create_dataset("x", data=x)
        loc.create_dataset("y", data=y)
        loc.create_dataset("z", data=z)

        for name, st, labels in (("cons", state, _CONS_NAMES),
                                 ("prim", prim_state, _PRIM_NAMES)):
            if st is None:
                continue
            data = gather(st)
            fh.create_dataset(name, data=data)
            base = labels[fluid]
            nscal = data.shape[1] - len(base)
            names = base + [f"scalar{i}" for i in range(nscal)]
            fh.create_dataset(
                f"VarNames_{name}",
                data=np.array([s.encode() for s in names]))
        if swarms:
            for sname, fields in swarms.items():
                g = fh.create_group(sname)
                for var, d in fields.items():
                    d = np.asarray(d)
                    if d.dtype.kind == "f" and single_precision:
                        d = d.astype(np.float32)
                    g.create_dataset(var, data=d)
                g.attrs["NumParticles"] = len(next(iter(fields.values()))) \
                    if fields else 0
    if write_xdmf:
        _write_xdmf_smr(filename, smesh, fluid, t, state is not None,
                        prim_state is not None)


def _write_xdmf_smr(h5name: str, smesh, fluid: str, t, has_cons,
                    has_prim):
    """XDMF sidecar for mixed-level dumps: per-block origin + level dx."""
    base = os.path.basename(h5name)
    b = smesh.base
    nz, ny, nx = b.mbnx3, b.mbnx2, b.mbnx1
    nleaves = int(smesh.levels.size)
    lines = ['<?xml version="1.0" ?>',
             '<Xdmf Version="3.0">', '<Domain>',
             '<Grid Name="mesh" GridType="Collection" '
             'CollectionType="Spatial">',
             f'<Time Value="{float(t)}"/>']
    for gid in range(nleaves):
        lev = int(smesh.levels[gid])
        d1, d2, d3 = smesh.dx(lev)
        x0, y0, z0 = smesh.block_origin(gid)
        lines += [
            f'<Grid Name="block{gid}" GridType="Uniform">',
            f'<Topology TopologyType="3DCoRectMesh" '
            f'Dimensions="{nz + 1} {ny + 1} {nx + 1}"/>',
            '<Geometry GeometryType="ORIGIN_DXDYDZ">',
            f'<DataItem Dimensions="3" Format="XML">'
            f'{z0} {y0} {x0}</DataItem>',
            f'<DataItem Dimensions="3" Format="XML">'
            f'{d3} {d2} {d1}</DataItem>',
            '</Geometry>']
        for kind, present in (("cons", has_cons), ("prim", has_prim)):
            if not present:
                continue
            labels = (_CONS_NAMES if kind == "cons" else _PRIM_NAMES)[fluid]
            for vi, lab in enumerate(labels):
                lines += [
                    f'<Attribute Name="{lab}" Center="Cell">',
                    f'<DataItem ItemType="HyperSlab" '
                    f'Dimensions="1 1 {nz} {ny} {nx}" Type="HyperSlab">',
                    f'<DataItem Dimensions="3 5" Format="XML">'
                    f'{gid} {vi} 0 0 0  1 1 1 1 1  1 1 {nz} {ny} {nx}'
                    f'</DataItem>',
                    f'<DataItem Format="HDF" Dimensions='
                    f'"{nleaves} {len(labels)} {nz} {ny} {nx}">'
                    f'{base}:/{kind}</DataItem>',
                    '</DataItem>', '</Attribute>']
        lines.append('</Grid>')
    lines += ['</Grid>', '</Domain>', '</Xdmf>']
    with open(h5name + ".xdmf", "w") as fh:
        fh.write("\n".join(lines))
