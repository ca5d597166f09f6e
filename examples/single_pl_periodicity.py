#!/usr/bin/env python
"""Periodic signal embedded in red noise (sinusoidal CustomMean + GP).

TPU-native counterpart of reference
examples/ultranest/single_pl_periodicity.jl:

    python examples/single_pl_periodicity.py data.txt [--sampler smc|nuts]
        [--particles 2048] [--seed 123]

9 parameters: (alpha_1, f_1, alpha_2, variance, nu, mu, A, phi, T0);
no log-transform (sigma^2 = nu yerr^2). Results land in
``inference/<name>_periodic_rednoise_<seed>_factor/`` in the
ultranest-compatible layout.
"""

import argparse
import os
import sys



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data")
    ap.add_argument("--sampler", default="ns", choices=["ns", "smc", "nuts", "chees", "advi"])
    ap.add_argument("--particles", type=int, default=2048)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--moves", type=int, default=12)
    ap.add_argument("--move-kind", default="mala", choices=["rwm", "mala"])
    ap.add_argument("--components", type=int, default=20)
    ap.add_argument("--basis", default="SHO", choices=["SHO", "DRWCelerite"])
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
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--posterior-checks", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from pioran_tpu.inference import periodic_rednoise_model, run_inference
    from pioran_tpu.utils import extract_subset

    base = os.path.basename(args.data).replace(".txt", "_periodic_rednoise")
    out = os.path.join("inference", f"{base}_{args.seed}_factor")
    os.makedirs(out, exist_ok=True)

    A = np.loadtxt(args.data, comments="#")
    t_all, y_all, yerr_all = A[:, 0] - A[0, 0], A[:, 1], A[:, 2]
    t, y, yerr, xbar, va = extract_subset(
        args.seed, os.path.join(out, base), t_all, y_all, yerr_all,
        take_log=False,
    )
    print(f"n={len(t)} xbar={xbar:.4f} va={va:.5f}")

    spec = periodic_rednoise_model(
        t, y, yerr, xbar, va,
        n_components=args.components, basis_function=args.basis,
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
    )
    for n, m, s in zip(results["paramnames"], results["posterior"]["mean"],
                       results["posterior"]["stdev"]):
        print(f"  {n:10s} {m:+.5f} +/- {s:.5f}")
    if "logz" in results:
        print(f"  logZ = {results['logz']:.3f}")
    print(f"  elapsed: {results['elapsed_s']:.1f}s -> {out}")

    if args.posterior_checks:
        from pioran_tpu.diagnostics import run_posterior_predict_checks

        samples = results["samples"]
        # spec order (a1, a2, f1, ...) -> reference order (a1, f1, a2, ...)
        perm = [0, 2, 1, 3, 4, 5, 6, 7, 8]
        sub = samples[
            np.random.default_rng(0).choice(
                len(samples), size=min(200, len(samples)), replace=False
            )
        ][:, perm]
        names = ["α₁", "f₁", "α₂", "variance", "ν", "μ", "A", "ϕ", "T₀"]

        def gp_model(tt, yy, ee, params):
            import jax.numpy as jnp

            theta = params[jnp.asarray(perm)]  # invert: same perm is its own inverse here
            return spec.gp_model(tt, yy, ee, theta)

        run_posterior_predict_checks(
            sub, names, spec.paramnames_split, t, y, yerr,
            spec.psd_model, gp_model, False,
            path=os.path.join(out, "plots") + os.sep,
            basis_function=args.basis, n_components=args.components,
            n_samples=min(100, len(sub)),
        )
    print("done")


if __name__ == "__main__":
    main()
