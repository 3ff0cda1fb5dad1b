"""Reader for Parthenon-format ``.phdf``/``.rhdf`` HDF5 dumps.

Clean-room implementation of the public ``parthenon_tools.phdf`` API as
consumed by the reference regression suites (the genuine module lives in
the Parthenon submodule, which is not vendored here).  Exposes the exact
call surface those suites use:

  phdf(filename)                      constructor
  .Time .NCycle .NumDims .NumBlocks .MaxLevel .MeshBlockSize
  .IncludesGhost .NGhost .Info (dict incl. ComponentNames/DatasetNames)
  .x .y .z                            cell centers  [nb, n]
  .xf .yf .zf                         cell faces    [nb, n+1]
  .Levels .LogicalLocations
  .Get(var, flatten=True)             raw dataset
  .GetComponents(names, flatten=True) {component: array}
  .GetVolumeLocations(flatten=True)   (zz, yy, xx)
  .GetSwarm(name)                     swarm accessor (.x/.y/.z/.Get)

Usage sites in the reference:
  tst/regression/test_suites/cluster_hse/cluster_hse.py:184-218
  tst/regression/test_suites/particle_advection/particle_advection.py:64-80
  tst/regression/test_suites/riemann_hydro/riemann_hydro.py:111-135
"""

import numpy as np

try:
    import h5py
except ImportError:
    raise ImportError("phdf requires h5py")


class Swarm:
    def __init__(self, group):
        self._data = {k: group[k][()] for k in group}
        self.NumParticles = int(group.attrs.get(
            "NumParticles", len(next(iter(self._data.values()), []))))
        for coord in ("x", "y", "z"):
            if coord in self._data:
                setattr(self, coord, self._data[coord])

    def Get(self, var):
        return self._data[var]

    def keys(self):
        return self._data.keys()


class phdf:
    def __init__(self, filename):
        self.file = filename
        f = h5py.File(filename, "r")
        self.fid = f
        info = f["Info"].attrs
        self.Info = {}
        for k in info:
            v = info[k]
            if isinstance(v, np.ndarray) and v.dtype.kind == "S":
                v = [s.decode() for s in v]
            elif isinstance(v, bytes):
                v = v.decode()
            self.Info[k] = v
        self.Time = float(info["Time"])
        self.NCycle = int(info["NCycle"])
        self.NumDims = int(info["NumDims"])
        self.NumBlocks = int(info["NumMeshBlocks"])
        self.MaxLevel = int(info["MaxLevel"])
        self.MeshBlockSize = np.asarray(info["MeshBlockSize"])
        self.IncludesGhost = int(info["IncludesGhost"])
        self.NGhost = int(info["NGhost"])
        self.Variables = list(self.Info.get("DatasetNames", []))

        self.xf = f["Locations/x"][()]
        self.yf = f["Locations/y"][()]
        self.zf = f["Locations/z"][()]
        if "VolumeLocations" in f:
            self.x = f["VolumeLocations/x"][()]
            self.y = f["VolumeLocations/y"][()]
            self.z = f["VolumeLocations/z"][()]
        else:
            self.x = 0.5 * (self.xf[:, :-1] + self.xf[:, 1:])
            self.y = 0.5 * (self.yf[:, :-1] + self.yf[:, 1:])
            self.z = 0.5 * (self.zf[:, :-1] + self.zf[:, 1:])
        self.Levels = f["Levels"][()] if "Levels" in f else \
            np.zeros(self.NumBlocks, np.int64)
        self.LogicalLocations = f["LogicalLocations"][()] \
            if "LogicalLocations" in f else None

        # component name -> (dataset, component index)
        self._components = {}
        ds_names = self.Info.get("DatasetNames", [])
        ncomps = list(np.atleast_1d(self.Info.get(
            "NumComponents", [1] * len(ds_names))))
        comp_names = self.Info.get("ComponentNames", list(ds_names))
        off = 0
        for name, nc in zip(ds_names, ncomps):
            for i in range(int(nc)):
                self._components[comp_names[off + i]] = (name, i)
            off += int(nc)

        nz, ny, nx = (self.MeshBlockSize[2], self.MeshBlockSize[1],
                      self.MeshBlockSize[0])
        self.TotalCells = self.NumBlocks * int(nz) * int(ny) * int(nx)

    # ------------------------------------------------------------- accessors
    def Get(self, variable, flatten=True):
        """Raw dataset [nb, ncomp, nz, ny, nx]; flatten=True returns
        [nb*nz*ny*nx, ncomp] (squeezed when ncomp == 1)."""
        if variable not in self.fid:
            raise KeyError(f"{variable} not in {self.file}")
        data = self.fid[variable][()]
        if not flatten:
            return data
        nb, nc = data.shape[0], data.shape[1]
        flat = np.moveaxis(data, 1, -1).reshape(-1, nc)
        return flat[:, 0] if nc == 1 else flat

    def GetComponents(self, components, flatten=True):
        """{component name: array}; flatten=False gives [nb, nz, ny, nx],
        flatten=True gives [nb*nz*ny*nx]."""
        out = {}
        for comp in components:
            name, idx = self._components[comp]
            data = self.fid[name][:, idx]
            out[comp] = data.reshape(-1) if flatten else data
        return out

    def GetVolumeLocations(self, flatten=True):
        """Cell-center coordinates of every cell: (zz, yy, xx), each
        [nb*nz*ny*nx] when flattened (matching GetComponents order)."""
        zz, yy, xx = [], [], []
        for b in range(self.NumBlocks):
            Z, Y, X = np.meshgrid(self.z[b], self.y[b], self.x[b],
                                  indexing="ij")
            zz.append(Z)
            yy.append(Y)
            xx.append(X)
        zz = np.stack(zz)
        yy = np.stack(yy)
        xx = np.stack(xx)
        if flatten:
            return zz.reshape(-1), yy.reshape(-1), xx.reshape(-1)
        return zz, yy, xx

    def GetSwarm(self, name):
        return Swarm(self.fid[name])

    def __str__(self):
        return (f"phdf({self.file}): t={self.Time} ncycle={self.NCycle} "
                f"blocks={self.NumBlocks} vars={self.Variables}")
