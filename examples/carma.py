#!/usr/bin/env python
"""CARMA(p, q) inference on a light curve.

TPU-native counterpart of the reference's experimental CARMA workflow
(reference docs/src/carma.md:63-200):

    python examples/carma.py data.txt --p 2 --q 0 [--use-c]
        [--sampler ns|smc|nuts|chees] [--particles 2048] [--x64]
        [--posterior-checks]

theta parameterizes the AR/MA quadratic factors as (u, b) with
u = c_quad - b^2/4, so the reference's root-band rejection holds with
prior probability 1 (see pioran_tpu.inference.carma_model). Results land
in ``inference/<name>_carma_p{p}q{q}/`` in the ultranest-style layout.
"""

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("--p", type=int, default=2)
    ap.add_argument("--q", type=int, default=0)
    ap.add_argument("--use-c", action="store_true",
                    help="fit the log-shift c: y -> log(y - c)")
    ap.add_argument("--sampler", default="ns",
                    choices=["ns", "smc", "nuts", "chees", "advi"])
    ap.add_argument("--particles", type=int, default=2048)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--moves", type=int, default=12)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="shard the sampler over the first N local "
                    "devices (-1: all; 0: all when more than one is "
                    "visible, else single-device)")
    ap.add_argument("--distributed", action="store_true",
                    help="join a multi-host jax.distributed process "
                    "group and use the global ('hosts','chains') mesh "
                    "(the analog of the reference's mpirun/julia -p "
                    "drivers)")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--posterior-checks", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from pioran_tpu.inference import carma_model, run_inference
    from pioran_tpu.utils import extract_subset

    fname = os.path.basename(args.data).replace(
        ".txt", f"_carma_p{args.p}q{args.q}")
    out = os.path.join("inference", fname)
    os.makedirs(out, exist_ok=True)

    A = np.loadtxt(args.data, comments="#")
    t_all, y_all, yerr_all = A[:, 0], A[:, 1], A[:, 2]
    t, y, yerr, xbar, va = extract_subset(
        args.seed, os.path.join(out, fname), t_all, y_all, yerr_all
    )
    print(f"n={len(t)} xbar={xbar:.4f} va={va:.5f} "
          f"CARMA({args.p},{args.q}) use_c={args.use_c}")

    spec = carma_model(t, y, yerr, xbar, va, p=args.p, q=args.q,
                       use_c=args.use_c)

    from pioran_tpu.parallel import driver_mesh

    mesh = driver_mesh(args.mesh, args.distributed)
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} device(s)")
    print(f"Running {args.sampler} sampler...")
    results = run_inference(
        spec, sampler=args.sampler, key=jax.random.PRNGKey(args.seed),
        mesh=mesh,
        num_particles=args.particles, num_chains=args.chains,
        num_warmup=args.warmup, num_samples=args.samples,
        num_moves=args.moves, log_dir=out,
    )
    for n, m, s in zip(results["paramnames"], results["posterior"]["mean"],
                       results["posterior"]["stdev"]):
        print(f"  {n:10s} {m:+.5g} +/- {s:.5g}")
    if "logz" in results:
        print(f"  logZ = {results['logz']:.3f}"
              + (f" +- {results['logzerr']:.3f}" if "logzerr" in results else ""))
    print(f"  elapsed: {results['elapsed_s']:.1f}s -> {out}")

    if args.posterior_checks:
        from pioran_tpu.diagnostics.ppc import plot_psd_ppc_carma

        print("Running CARMA PSD posterior predictive check...")
        samples = results["samples"]
        sub = samples[np.random.default_rng(0).choice(
            len(samples), size=min(200, len(samples)), replace=False)]
        # rebuild conjugate-pair roots (complex, host-side) from (u, b)
        p, q = args.p, args.q
        n_pairs = p // 2
        ras = []
        for th in sub:
            r = []
            for k in range(n_pairs):
                u, b = th[2 * k], th[2 * k + 1]
                r += [-b / 2 + 1j * np.sqrt(u), -b / 2 - 1j * np.sqrt(u)]
            if p % 2:
                r.append(-th[2 * n_pairs] + 0j)
            ras.append(r)
        i_var = spec.names.index("variance")
        from pioran_tpu.models.carma import poly_from_conjugate_pairs
        import jax.numpy as jnp

        betas = []
        off = 2 * (p // 2) + (p % 2)
        for th in sub:
            if q > 0:
                pre = [jnp.asarray(-th[off + 2 * k + 1] / 2)
                       for k in range(q // 2)]
                pim = [jnp.asarray(np.sqrt(th[off + 2 * k]))
                       for k in range(q // 2)]
                rr = ([jnp.asarray(-th[off + 2 * (q // 2)])]
                      if q % 2 else [])
                betas.append(np.asarray(
                    poly_from_conjugate_pairs(pre, pim, rr)))
            else:
                betas.append(np.ones(1))
        plot_psd_ppc_carma(
            np.asarray(ras), np.asarray(betas), sub[:, i_var],
            sub[:, spec.names.index("ν")], t, y, yerr, p=p, q=q,
            path=os.path.join(out, "plots") + os.sep,
            with_log_transform=True,
        )
        print(f"  plots -> {os.path.join(out, 'plots')}")


if __name__ == "__main__":
    main()
