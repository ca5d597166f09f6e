#!/usr/bin/env python
"""Benchmark grid over (N, J) for every likelihood backend.

Mirrors the reference's PkgBenchmark suite (reference
benchmark/benchmarks.jl:16-20: N = 2^5..2^16, celerite J = 2..64,
pioran J-bases 10..50, SHO & DRWCelerite) and its AirspeedVelocity
table output (.github/workflows/benchmarks.yml), plus TPU-era columns:
vmapped-batch throughput and the log-depth Kalman backend.

Usage:
    python benchmarks/bench_grid.py [--cpu] [--x64] [--batch 1024]
        [--out results.json] [--profile trace_dir]

Writes one JSON with per-cell timings and prints a markdown table.
"""

import argparse
import json
import sys
import time
import os



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default=None)
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the flagship cell")
    ap.add_argument("--n-max-pow", type=int, default=16,
                    help="largest N = 2^pow (matches the reference grid)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ref", default=None,
                    help="JSON from a previous (CPU f64) run; adds an "
                         "err_vs_ref column = |logl - logl_ref|")
    ap.add_argument("--assoc-max-n", type=int, default=8192,
                    help="skip the O(N R^3)-memory kalman_assoc backend "
                         "above this N (it is experimental and its "
                         "allocation footprint dominates at long N)")
    ap.add_argument("--markdown", default=None,
                    help="write the summary table to this markdown file")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from pioran_tpu.models.kernels import CeleriteKernel
    from pioran_tpu.ops.celerite import logl
    from pioran_tpu.ops.kalman import logl_kalman, logl_kalman_sequential

    dtype = jnp.float64 if args.x64 else jnp.float32
    rng = np.random.default_rng(0)

    def make_problem(N, J):
        t64 = np.sort(rng.uniform(0, 1000.0, N))
        t = jnp.asarray(t64, dtype)
        y = jnp.asarray(rng.normal(size=N), dtype)
        s2 = jnp.asarray(0.05 + 0.1 * rng.uniform(size=N), dtype)
        a = jnp.asarray(rng.uniform(0.5, 2.0, J), dtype)
        b = jnp.asarray(a)  # SHO-style b = a
        c = jnp.asarray(rng.uniform(0.05, 0.5, J), dtype)
        d = jnp.asarray(c)
        # spacings in f64 BEFORE the cast: diff of an f32 grid loses
        # ~log2(N) bits at this span/N (ops/celerite.py build_uv) —
        # the production specs do the same (inference.py)
        dtv = jnp.asarray(np.diff(t64), dtype)
        return (a, b, c, d, t, y, s2), dtv

    def timeit(fn, *fnargs, iters=args.iters):
        out = fn(*fnargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fnargs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    backends = {
        "celerite_scan": logl,
        "kalman_seq": logl_kalman_sequential,
        "kalman_assoc": logl_kalman,
    }

    ref_vals = {}
    if args.ref:
        with open(args.ref) as fh:
            for cell in json.load(fh)["rows"]:
                if "celerite_scan_val" in cell:
                    ref_vals[(cell["N"], cell["J"])] = cell["celerite_scan_val"]

    Ns = [2**p for p in range(5, args.n_max_pow + 1)]
    Js = [2, 8, 20, 32]
    rows = []
    for N in Ns:
        for J in Js:
            prob, dtv = make_problem(N, J)
            cell = {"N": N, "J": J}
            for name, fn in backends.items():
                if name == "kalman_assoc" and N > args.assoc_max_n:
                    cell[name + "_ms"] = None
                    cell[name + "_ok"] = "skipped_assoc_max_n"
                    continue
                if name == "celerite_scan":
                    jf = jax.jit(lambda *ar, _f=fn: _f(*ar, dt=dtv))
                else:
                    jf = jax.jit(fn)
                try:
                    dt = timeit(jf, *prob)
                    val = float(jf(*prob))
                    cell[name + "_ms"] = round(dt * 1e3, 4)
                    cell[name + "_ok"] = bool(np.isfinite(val))
                    if name == "celerite_scan":
                        cell["celerite_scan_val"] = val
                except Exception as e:  # noqa: BLE001 - report, keep sweeping
                    cell[name + "_ms"] = None
                    cell[name + "_ok"] = f"{type(e).__name__}"
            if (N, J) in ref_vals and "celerite_scan_val" in cell:
                cell["err_vs_ref"] = abs(
                    cell["celerite_scan_val"] - ref_vals[(N, J)]
                )
                cell["relerr_vs_ref"] = cell["err_vs_ref"] / max(
                    abs(ref_vals[(N, J)]), 1e-300
                )
            # vmapped batch throughput on the scan backend (the sampler
            # path); tables are (B, N, 2J) so cap B by memory at long N
            B = max(64, min(args.batch, (1 << 27) // max(N, 1)))
            a, b, c, d, t, y, s2 = prob
            A = jnp.tile(a, (B, 1)) * (
                1 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, J), dtype)
            )
            # lane 0 carries the unperturbed problem so the Pallas
            # kernel's own f32 error vs the f64 reference is measurable
            A = A.at[0].set(a)
            if N <= 2048:
                vf = jax.jit(jax.vmap(lambda aa: logl(aa, b, c, d, t, y, s2)))
                dtb = timeit(vf, A)
                cell["vmap_evals_per_s"] = round(B / dtb, 1)
            # Pallas fused forward + hand-derived adjoint (TPU only)
            if jax.default_backend() == "tpu":
                from pioran_tpu.ops.pallas_celerite import (
                    batched_loglike_pallas_fused,
                )
                from pioran_tpu.ops.pallas_celerite_vjp import (
                    fits_vmem,
                    value_and_grad_tables,
                )

                Bc = jnp.tile(b, (B, 1))
                Cc = jnp.tile(c, (B, 1))
                Dc = jnp.tile(d, (B, 1))
                Y = jnp.tile(y, (B, 1))
                S2 = jnp.tile(s2, (B, 1))
                try:
                    # NB: pass the big (B, N) arrays as ARGUMENTS — closing
                    # over them embeds them as HLO constants and the axon
                    # remote-compile service rejects >~100 MB request
                    # bodies (HTTP 413)
                    pf = jax.jit(
                        lambda *ar: batched_loglike_pallas_fused(
                            *ar, dt=dtv))
                    dtp = timeit(pf, A, Bc, Cc, Dc, t, Y, S2)
                    cell["pallas_batch"] = B
                    cell["pallas_evals_per_s"] = round(B / dtp, 1)
                    cell["pallas_val"] = float(
                        pf(A, Bc, Cc, Dc, t, Y, S2)[0])
                    if (N, J) in ref_vals:
                        # the Kahan-compensated kernel's f32 error
                        cell["pallas_err_vs_ref"] = abs(
                            cell["pallas_val"] - ref_vals[(N, J)])
                    # roofline accounting for the fused kernel: the
                    # recursion costs ~6 R^2 FLOPs/step (S update 3R^2,
                    # S@U 2R^2, rank-1 epilogues), R = 2J; streamed HBM
                    # bytes are the per-chain y and sigma2 rows (tables
                    # are built in-kernel, t is shared)
                    R = 2 * J
                    flops = 6.0 * R * R * N * B / dtp
                    gbs = 2.0 * B * N * 4.0 / dtp / 1e9
                    cell["pallas_tflops"] = round(flops / 1e12, 3)
                    cell["pallas_hbm_gbs"] = round(gbs, 2)
                except Exception as e:  # noqa: BLE001
                    cell["pallas_evals_per_s"] = f"{type(e).__name__}"
                try:
                    # the adjoint's residual tables are O(B N J) in HBM:
                    # shrink the gradient batch until they fit (long-N
                    # grads trade batch for length; r4's segmented
                    # kernels removed the old N<=4096 compile limit)
                    Bg = B
                    while Bg >= 128 and not fits_vmem(J, n=N, batch=Bg):
                        Bg //= 2
                    if fits_vmem(J, n=N, batch=Bg):
                        gf = jax.jit(
                            lambda *ar: value_and_grad_tables(*ar, dt=dtv))
                        dtg = timeit(gf, A[:Bg], Bc[:Bg], Cc[:Bg], Dc[:Bg],
                                     t, Y[:Bg], S2[:Bg])
                        cell["pallas_grad_batch"] = Bg
                        cell["pallas_grad_evals_per_s"] = round(Bg / dtg, 1)
                    else:
                        # beyond the segmented adjoint's HBM envelope:
                        # production (ops/pallas_celerite.py _fwd)
                        # dispatches gradients to the checkpointed-scan
                        # VJP — measure THAT, so no grid cell is blank
                        # (reference grads run at every N,
                        # benchmark/benchmarks.jl:16-18 + ForwardDiff)
                        last_err = None
                        for Bg in (64, 32, 16, 8):
                            try:
                                gsf = jax.jit(jax.grad(
                                    lambda A_, Y_, S2_: jnp.sum(jax.vmap(
                                        lambda aa, yy, ss: logl(
                                            aa, b, c, d, t, yy, ss, dt=dtv)
                                    )(A_, Y_, S2_))))
                                dtg = timeit(gsf, A[:Bg], Y[:Bg], S2[:Bg])
                                cell["pallas_grad_batch"] = Bg
                                cell["pallas_grad_evals_per_s"] = round(
                                    Bg / dtg, 1)
                                cell["grad_backend"] = "scan-vjp"
                                break
                            except Exception as e:  # noqa: BLE001 - OOM: shrink
                                last_err = e
                        else:
                            # never leave the cell silently blank: record
                            # what failed at the smallest batch
                            cell["pallas_grad_evals_per_s"] = (
                                f"{type(last_err).__name__}")
                except Exception as e:  # noqa: BLE001
                    cell["pallas_grad_evals_per_s"] = f"{type(e).__name__}"
            rows.append(cell)
            print(f"N={N:6d} J={J:2d}: " + "  ".join(
                f"{k}={cell[k]}" for k in cell
                if k.endswith("_ms") or k.endswith("evals_per_s")
            ), flush=True)

    if args.profile:
        (a, b, c, d, t, y, s2), _ = make_problem(4096, 20)
        jf = jax.jit(logl)
        jax.block_until_ready(jf(a, b, c, d, t, y, s2))
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(jf(a, b, c, d, t, y, s2))
        print(f"profiler trace -> {args.profile}")

    result = {
        "platform": jax.devices()[0].platform,
        "dtype": str(dtype.__name__),
        "batch": args.batch,
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
        print(f"wrote {args.out}")

    # markdown summary (J=20 column, the flagship config)
    lines = [
        "| N | scan ms | kalman_assoc ms | pallas evals/s | "
        "pallas grad evals/s (batch) | TFLOP/s | HBM GB/s | "
        "scan err vs f64 | pallas err vs f64 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]

    def _fmt_err(v):
        return f"{v:.3g}" if isinstance(v, float) else v

    for cell in rows:
        if cell["J"] == 20:
            g = cell.get("pallas_grad_evals_per_s", "-")
            if "pallas_grad_batch" in cell:
                g = f"{g} ({cell['pallas_grad_batch']})"
            lines.append(
                f"| {cell['N']} | {cell['celerite_scan_ms']} | "
                f"{cell['kalman_assoc_ms']} | "
                f"{cell.get('pallas_evals_per_s', '-')} | "
                f"{g} | "
                f"{cell.get('pallas_tflops', '-')} | "
                f"{cell.get('pallas_hbm_gbs', '-')} | "
                f"{_fmt_err(cell.get('err_vs_ref', '-'))} | "
                f"{_fmt_err(cell.get('pallas_err_vs_ref', '-'))} |"
            )
    table = "\n".join(lines)
    print("\n" + table)
    if args.markdown:
        with open(args.markdown, "w") as fh:
            fh.write(
                f"# Benchmark grid ({result['platform']}, "
                f"{result['dtype']}, J=20 column)\n\n"
                "Full grid (J = 2, 8, 20, 32; N = 2^5..2^%d) in the "
                "accompanying JSON.\n\n" % args.n_max_pow + table + "\n"
            )
        print(f"wrote {args.markdown}")


if __name__ == "__main__":
    main()
