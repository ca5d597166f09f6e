#!/usr/bin/env python
"""Single-bending power-law PSD inference on a light curve.

TPU-native counterpart of reference examples/ultranest/single_pl.jl:

    python examples/single_pl.py data.txt [--sampler smc|nuts|chees]
        [--particles 2048] [--chains 16] [--x64] [--prior-checks]
        [--posterior-checks]

The file must have three columns: time, flux, flux error. Results land in
``inference/<name>_single/`` (chains/equal_weighted_post.txt +
info/results.json, ultranest-compatible layout) and plots in
``inference/<name>_single/plots/``.

No MPI, no worker farm: particles/chains live on the accelerator; run
under more chips and they shard over the mesh (pioran_tpu.parallel).
"""

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("--sampler", default="ns", choices=["ns", "smc", "nuts", "chees", "advi"])
    ap.add_argument("--init", default="prior", choices=["prior", "advi"],
                    help="chain inits for nuts/chees: raw prior draws, "
                    "or dispersed ADVI-seeded (advi_seeded_inits)")
    ap.add_argument("--mass", default="diag", choices=["diag", "dense"],
                    help="ChEES metric: diagonal, or full cross-chain "
                    "covariance (preconditions correlated ridges)")
    ap.add_argument("--hmc-stepped", action="store_true",
                    help="host-stepped ChEES (25 transitions per jitted "
                    "program) for RPC layers that kill long programs")
    ap.add_argument("--particles", type=int, default=2048)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--moves", type=int, default=12)
    ap.add_argument("--move-kind", default="mala", choices=["rwm", "mala"])
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--components", type=int, default=20)
    ap.add_argument("--basis", default="SHO", choices=["SHO", "DRWCelerite"])
    ap.add_argument("--use-c", action="store_true",
                    help="fit a flux offset c with the log(y - c) "
                    "transform (the reference docs workflow, "
                    "docs/src/single_pl.jl:63-100)")
    ap.add_argument("--alpha1-max", type=float, default=1.5)
    ap.add_argument("--variance-norm", action="store_true",
                    help="normalise the approximation by total variance "
                    "instead of band-integrated power")
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
    ap.add_argument("--x64", action="store_true", help="float64 (CPU) mode")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--prior-checks", action="store_true")
    ap.add_argument("--posterior-checks", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from pioran_tpu.inference import run_inference, single_bending_model
    from pioran_tpu.utils import extract_subset

    fname = os.path.basename(args.data).replace(".txt", "_single")
    out = os.path.join("inference", fname)
    os.makedirs(out, exist_ok=True)

    A = np.loadtxt(args.data, comments="#")
    t_all, y_all, yerr_all = A[:, 0], A[:, 1], A[:, 2]
    t, y, yerr, xbar, va = extract_subset(
        args.seed, os.path.join(out, fname), t_all, y_all, yerr_all
    )
    print(f"n={len(t)} xbar={xbar:.4f} va={va:.5f}")

    spec = single_bending_model(
        t, y, yerr, xbar, va,
        n_components=args.components, basis_function=args.basis,
        use_c=args.use_c, alpha1_max=args.alpha1_max,
        is_integrated_power=not args.variance_norm,
    )

    if args.prior_checks:
        from pioran_tpu.diagnostics import run_diagnostics

        print("Running prior predictive checks...")
        rng_key = jax.random.PRNGKey(args.seed)
        import jax.numpy as jnp

        draws = jax.vmap(spec.prior.sample)(jax.random.split(rng_key, 1000))
        draws = np.asarray(draws)
        # columns in model order (alpha_1, f_1, alpha_2)
        psd_params = np.vstack([draws[:, 0], draws[:, 2], draws[:, 1]])
        run_diagnostics(
            psd_params, draws[:, 3], spec.f_min, spec.f_max,
            spec.psd_model, path=os.path.join(out, "plots") + os.sep,
            basis_function=args.basis, n_components=args.components,
        )

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
        num_moves=args.moves, smc_move=args.move_kind,
        log_dir=out, resume=args.resume,
        init=args.init, mass=args.mass, hmc_stepped=args.hmc_stepped,
    )
    names = results["paramnames"]
    mean = results["posterior"]["mean"]
    std = results["posterior"]["stdev"]
    for n, m, s in zip(names, mean, std):
        print(f"  {n:10s} {m:+.5f} +/- {s:.5f}")
    if "logz" in results:
        print(f"  logZ = {results['logz']:.3f}")
    print(f"  elapsed: {results['elapsed_s']:.1f}s -> {out}")

    if args.posterior_checks:
        from pioran_tpu.diagnostics import run_posterior_predict_checks

        print("Running posterior predictive checks...")
        samples = results["samples"]
        # reporting order for PPC: model wants (a1, f1, a2) columns
        perm = [0, 2, 1, 3, 4, 5] + ([6] if args.use_c else [])
        samples_ppc = samples[:, perm]
        ppc_names = ["α₁", "f₁", "α₂", "variance", "ν", "μ"] + (
            ["c"] if args.use_c else [])
        sub = samples_ppc[
            np.random.default_rng(0).choice(len(samples_ppc), size=min(200, len(samples_ppc)), replace=False)
        ]

        def gp_model(tt, yy, ee, params):
            theta = params[np.argsort(np.asarray(perm))]  # back to spec order
            return spec.gp_model(tt, yy, ee, theta)

        run_posterior_predict_checks(
            sub, ppc_names, spec.paramnames_split, t, y, yerr,
            spec.psd_model, gp_model, True,
            path=os.path.join(out, "plots") + os.sep,
            basis_function=args.basis, n_components=args.components,
            n_samples=min(100, len(sub)),
        )
    print("done")


if __name__ == "__main__":
    main()
