"""Weak-scaling harness: fixed per-device load over a growing device mesh.

Methodology for the reference's weak-scaling protocol (SURVEY §6: >90%
efficiency to 64 ranks): the block axis of a 3D GLM-MHD problem is
sharded over an N-device `jax.sharding.Mesh`, with the per-device block
count held constant as N grows; XLA inserts the halo collectives.

On real multi-chip TPU hardware this reports true ICI weak scaling.  On
this machine (one chip) it runs on N VIRTUAL CPU devices
(`--xla_force_host_platform_device_count`), which validates the sharded
program and measures SPMD partitioning overhead only — the printed
efficiency is labeled accordingly.

Usage:  PALLAS_AXON_POOL_IPS= python scripts/weak_scaling.py
        [--devices 1,2,4,8] [--blocks-per-device 4] [--cycles 4]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--blocks-per-device", type=int, default=4)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--block", type=int, default=32,
                    help="cubic meshblock size")
    ap.add_argument("--mesh2d", action="store_true",
                    help="use a 2-D (z,y) device mesh (pod layout) via "
                         "the explicit shard_map grid path")
    args = ap.parse_args()

    import jax
    # WEAK_SCALING_TPU=1 targets real TPU devices; default is the
    # virtual-CPU mesh (jax.devices() would otherwise try the tunnel)
    if os.environ.get("WEAK_SCALING_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec

    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.driver import Simulation

    devices = [int(d) for d in args.devices.split(",")]
    mb = args.block
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    label = "ICI weak scaling" if on_tpu else \
        "virtual-CPU partitioning overhead (NOT hardware scaling)"
    print(f"# weak scaling ({label}); block {mb}^3, "
          f"{args.blocks_per_device} blocks/device")

    results = {}
    for nd in devices:
        if nd > len(jax.devices()):
            print(f"n={nd}: skipped (only {len(jax.devices())} devices)")
            continue
        if args.mesh2d:
            _run_mesh2d(nd, args, results, devices, on_tpu, jax, jnp, mb)
            continue
        nb1 = nd * args.blocks_per_device
        deck = f"""
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-6
vflow = 0.0

<parthenon/mesh>
nghost = 3
nx1 = {mb * nb1}
x1min = 0.0
x1max = {float(nb1)}
nx2 = {mb}
x2min = 0.0
x2max = 1.0
nx3 = {mb}
x3min = 0.0
x3max = 1.0

<parthenon/meshblock>
nx1 = {mb}
nx2 = {mb}
nx3 = {mb}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 100.0
nlim = 1
ncycle_out = 0

<hydro>
fluid = glmmhd
riemann = hlld
reconstruction = ppm
gamma = 1.666666666666667
"""
        pin = ParameterInput.from_string(deck)
        sim = Simulation(pin, quiet=True)
        u = sim.u.astype(jnp.float32)
        jm = JMesh(np.array(jax.devices()[:nd]), ("blocks",))
        u = jax.device_put(u, NamedSharding(jm, PartitionSpec("blocks")))
        dt = jnp.asarray(0.8 * float(sim.pkg.estimate_timestep(
            sim.pkg.cons_to_prim(u)[1])[0]), u.dtype)
        c_h = jnp.asarray(0.0, u.dtype)
        step = jax.jit(sim.pkg._step, donate_argnums=(0,))
        u = step(jnp.copy(u), dt, c_h)          # compile + warm
        u.block_until_ready()
        t0 = time.time()
        for _ in range(args.cycles):
            u = step(u, dt, c_h)
        u.block_until_ready()
        wall = time.time() - t0
        zones = mb ** 3 * nb1
        zcs = zones * args.cycles / wall
        results[nd] = zcs
        base = results[devices[0]]
        # real chips: per-chip throughput should hold (divide by n);
        # virtual CPU devices share the same cores, so the null model
        # is CONSTANT total throughput (divide by 1)
        eff = zcs / (nd * base) if on_tpu else zcs / base
        print(f"n={nd}: blocks={nb1} zones={zones} "
              f"zone-cycles/s={zcs:.3e} efficiency={eff:.3f}")


def _run_mesh2d(nd, args, results, devices, on_tpu, jax, jnp, mb):
    """Fixed per-device load over a 2-D (z, y) device mesh: the pod
    layout, via the explicit shard_map grid path (parallel/halo)."""
    import time

    import numpy as np

    from athenapk_tpu.config.parameter_input import ParameterInput
    from athenapk_tpu.driver import Simulation
    from athenapk_tpu.parallel.halo import (grid_sharding,
                                            make_device_mesh_2d,
                                            make_sharded_step_grid,
                                            to_grid)

    ndy = 2 if nd % 2 == 0 and nd > 1 else 1
    ndz = nd // ndy
    k2 = min(2, args.blocks_per_device)
    k3 = max(1, args.blocks_per_device // k2)
    nb3, nb2 = ndz * k3, ndy * k2
    deck = f"""
<job>
problem_id = linear_wave_mhd

<problem/linear_wave>
compute_error = false
wave_flag = 0
amp = 1.0e-6
vflow = 0.0

<parthenon/mesh>
nghost = 3
nx1 = {mb}
x1min = 0.0
x1max = 1.0
nx2 = {mb * nb2}
x2min = 0.0
x2max = {float(nb2)}
nx3 = {mb * nb3}
x3min = 0.0
x3max = {float(nb3)}

<parthenon/meshblock>
nx1 = {mb}
nx2 = {mb}
nx3 = {mb}

<parthenon/time>
integrator = vl2
cfl = 0.3
tlim = 100.0
nlim = 1
ncycle_out = 0

<hydro>
fluid = glmmhd
riemann = hlld
reconstruction = ppm
gamma = 1.666666666666667
"""
    pin = ParameterInput.from_string(deck)
    sim = Simulation(pin, quiet=True)
    dmesh = make_device_mesh_2d(jax.devices()[:nd], (ndz, ndy))
    ug = jax.device_put(to_grid(sim.u.astype(jnp.float32), sim.mesh),
                        grid_sharding(dmesh))
    g_step, g_dt = make_sharded_step_grid(sim.pkg, dmesh)
    dts = g_dt(ug)
    dt = jnp.asarray(0.8 * float(dts[0]), ug.dtype)
    c_h = jnp.asarray(0.0, ug.dtype)
    ug = g_step(ug, dt, c_h)
    ug.block_until_ready()
    t0 = time.time()
    for _ in range(args.cycles):
        ug = g_step(ug, dt, c_h)
    ug.block_until_ready()
    wall = time.time() - t0
    zones = mb ** 3 * nb3 * nb2
    zcs = zones * args.cycles / wall
    results[nd] = zcs
    base = results[devices[0]]
    eff = zcs / (nd * base) if on_tpu else zcs / base
    print(f"n={nd}: mesh=({ndz},{ndy}) blocks={nb3 * nb2} zones={zones} "
          f"zone-cycles/s={zcs:.3e} efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
