"""Measure the f32-state precision strategy (SURVEY §7 hard part 4,
VERDICT r3 item 6): for each sensitive reduction, compare

  naive   — the reduction done entirely in f32 (what a careless fused
            path would produce),
  strategy— the shipped approach (per-block f32 device partials +
            f64 host combine; or Kahan-compensated device sum),
  truth   — the same reduction in full f64,

on an f32 state that is REPRESENTATIVE of the production decks: a
linear-wave-class smooth state (tiny perturbations on an O(1)
background — the adversarial case for f32 sums, where the interesting
signal sits ~7 decades below the background) at 128^3 split into 64
blocks of 32^3 (AMR-class block count).

Run on CPU (the arithmetic is dtype-driven, not backend-driven):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/precision_table.py

Prints a markdown table; NOTES_r4.md carries the recorded copy with the
keep/reject decisions.
"""

import os
import sys

os.environ.setdefault("ATHENAPK_DISABLE_X64", "1")  # production TPU config

import numpy as np                                        # noqa: E402
import jax                                                # noqa: E402
import jax.numpy as jnp                                   # noqa: E402

sys.path.insert(0, "/root/repo")


def digits(approx, truth):
    """Matching decimal digits of `approx` vs `truth`."""
    if approx == truth:
        return 16.0
    return float(-np.log10(abs(approx - truth) / abs(truth)))


def kahan_sum_device(x):
    """Kahan-compensated sum over a flattened f32 array, on device,
    with x64 globally OFF (the fused-kernel constraint).  Sequential
    scan over per-block partial sums: the per-block sums are the
    vectorizable bulk; the compensation runs over the [nblocks] axis."""
    parts = jnp.sum(x, axis=tuple(range(1, x.ndim)))  # [nb] f32 partials

    def body(carry, p):
        s, c = carry
        y = p - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    (s, _), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), parts)
    return s


def main():
    rng = np.random.default_rng(7)
    nb, n = 64, 32                       # 64 blocks of 32^3 = 128^3 zones
    # linear-wave-class state: O(1) background + 1e-6 perturbation
    base = np.ones((nb, n, n, n), np.float64)
    pert = 1e-6 * rng.standard_normal((nb, n, n, n))
    rho64 = base + pert
    rho32 = rho64.astype(np.float32)

    rows = []

    # --- volume sum (mass/energy hst columns) --------------------------
    truth = float(np.sum(rho32.astype(np.float64)))   # f64 over f32 state
    naive = float(jnp.sum(jnp.asarray(rho32)))        # flat f32 sum
    parts = np.asarray(jnp.sum(jnp.asarray(rho32), axis=(1, 2, 3)),
                       dtype=np.float64)
    combine = float(parts.sum())                      # shipped strategy
    kah = float(kahan_sum_device(jnp.asarray(rho32)))
    rows.append(("mass/energy volume sum (2.1M zones)",
                 digits(naive, truth), digits(combine, truth),
                 digits(kah, truth)))

    # --- relDivB-style ratio of |small| sums ---------------------------
    divb64 = 1e-7 * rng.standard_normal((nb, n, n, n))
    divb32 = jnp.asarray(divb64.astype(np.float32))
    truth_n = float(np.sum(np.abs(np.asarray(divb32, np.float64))))
    naive_n = float(jnp.sum(jnp.abs(divb32)))
    parts_n = np.asarray(jnp.sum(jnp.abs(divb32), axis=(1, 2, 3)),
                         dtype=np.float64)
    comb_n = float(parts_n.sum())
    kah_n = float(kahan_sum_device(jnp.abs(divb32)))
    rows.append(("relDivB numerator (|divB| sum)",
                 digits(naive_n, truth_n), digits(comb_n, truth_n),
                 digits(kah_n, truth_n)))

    # --- dt minimum (no accumulation: min is exact in any dtype) -------
    dts = (1.0 + 1e-3 * rng.standard_normal((nb, n, n, n))).astype(np.float32)
    truth_m = float(np.min(dts.astype(np.float64)))
    naive_m = float(jnp.min(jnp.asarray(dts)))
    rows.append(("dt CFL minimum", digits(naive_m, truth_m),
                 digits(naive_m, truth_m), digits(naive_m, truth_m)))

    # --- linear-wave L1 error norm (host-side, f64 numpy: shipped) -----
    # err = mean |u - u0| where the difference is ~1e-8 of the background
    u0 = rho32
    u1 = (rho64 + 1.5e-8).astype(np.float32)
    truth_e = float(np.mean(np.abs(u1.astype(np.float64)
                                   - u0.astype(np.float64))))
    naive_e = float(jnp.mean(jnp.abs(jnp.asarray(u1) - jnp.asarray(u0))))
    # shipped: difference on device f32, mean on host f64
    diff = np.asarray(jnp.abs(jnp.asarray(u1) - jnp.asarray(u0)),
                      dtype=np.float64)
    ship_e = float(diff.mean())
    rows.append(("linear-wave L1 norm (f32 state)",
                 digits(naive_e, truth_e), digits(ship_e, truth_e),
                 float("nan")))

    print("| reduction | naive f32 digits | shipped digits | kahan digits |")
    print("|---|---|---|---|")
    for name, d_naive, d_ship, d_kah in rows:
        print(f"| {name} | {d_naive:.1f} | {d_ship:.1f} | "
              f"{'-' if np.isnan(d_kah) else f'{d_kah:.1f}'} |")


if __name__ == "__main__":
    main()
