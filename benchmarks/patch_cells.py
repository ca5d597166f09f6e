#!/usr/bin/env python
"""Re-measure failed grid cells in a FRESH process and merge into the JSON.

The original sweep jitted lambdas that CLOSED OVER the (B, N) data
arrays; jax embeds those as HLO constants, and the axon remote-compile
service rejects request bodies past ~100 MB (HTTP 413) — so every
large-N Pallas cell "failed" for a harness reason, not a kernel one
(verified: same cell passes with arrays passed as jit arguments).
This tool re-runs the cells whose ``pallas_*`` columns record an
error, one fresh python process per (N, J) cell with the corrected
calling convention, and rewrites the grid JSON + markdown.

    python benchmarks/patch_cells.py benchmarks/grid_tpu_f32.json \
        [--markdown benchmarks/GRID.md]
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CELL_PROG = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, {root!r})
import jax, jax.numpy as jnp
from pioran_tpu.ops.pallas_celerite import batched_loglike_pallas_fused
from pioran_tpu.ops.pallas_celerite_vjp import fits_vmem, value_and_grad_tables

N, J, B, iters = {N}, {J}, {B}, {iters}
rng = np.random.default_rng(0)
t = jnp.asarray(np.sort(rng.uniform(0, 1000.0, N)), jnp.float32)
y = jnp.asarray(rng.normal(size=N), jnp.float32)
s2 = jnp.asarray(0.05 + 0.1 * rng.uniform(size=N), jnp.float32)
a = jnp.asarray(rng.uniform(0.5, 2.0, J), jnp.float32)
c = jnp.asarray(rng.uniform(0.05, 0.5, J), jnp.float32)
A = jnp.tile(a, (B, 1)) * (1 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, J), jnp.float32))
Bc = jnp.tile(a, (B, 1)); Cc = jnp.tile(c, (B, 1)); Dc = jnp.tile(c, (B, 1))
Y = jnp.tile(y, (B, 1)); S2 = jnp.tile(s2, (B, 1))

def timeit(fn, arg):
    # big arrays as jit ARGUMENTS (closed-over constants trip the axon
    # remote-compile body-size limit, HTTP 413)
    out = fn(arg, Bc, Cc, Dc, t, Y, S2); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg, Bc, Cc, Dc, t, Y, S2)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

cell = {{}}
try:
    from pioran_tpu.ops.celerite import logl
    pf = jax.jit(batched_loglike_pallas_fused)
    # value gate BEFORE timing: after a TPU-worker crash the executor
    # can return instantly without running (bogus ~10 us "timings");
    # a wrong/inf value or absurd speed flags the poisoned state
    v = float(pf(A, Bc, Cc, Dc, t, Y, S2)[0])
    v_ref = float(jax.jit(logl)(A[0], Bc[0], Cc[0], Dc[0], t, y, s2))
    assert abs(v - v_ref) < 1e-3 * abs(v_ref) + 1.0, (v, v_ref)
    dtp = timeit(pf, A)
    assert dtp > 1e-4, f"implausible timing {{dtp}}"
    R = 2 * J
    cell["pallas_batch"] = B
    cell["pallas_evals_per_s"] = round(B / dtp, 1)
    cell["pallas_tflops"] = round(6.0 * R * R * N * B / dtp / 1e12, 3)
    cell["pallas_hbm_gbs"] = round(2.0 * B * N * 4.0 / dtp / 1e9, 2)
except AssertionError as e:
    cell["pallas_evals_per_s"] = "UNVERIFIED:" + str(e)[:120]
except Exception as e:
    cell["pallas_evals_per_s"] = type(e).__name__ + ":" + str(e)[:160]
try:
    if fits_vmem(J, n=N, batch=B):
        gf = jax.jit(value_and_grad_tables)
        dtg = timeit(gf, A)
        assert dtg > 1e-4, f"implausible timing {{dtg}}"
        cell["pallas_grad_evals_per_s"] = round(B / dtg, 1)
    else:
        cell["pallas_grad_evals_per_s"] = "scan_vjp_fallback"
except AssertionError as e:
    cell["pallas_grad_evals_per_s"] = "UNVERIFIED:" + str(e)[:120]
except Exception as e:
    cell["pallas_grad_evals_per_s"] = type(e).__name__ + ":" + str(e)[:160]
print("CELL " + json.dumps(cell))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("grid")
    ap.add_argument("--markdown", default=None)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    with open(args.grid) as fh:
        data = json.load(fh)
    root = os.path.join(HERE, "..")
    def implausible(v):
        # a poisoned post-crash executor "returns" in ~70 us; nothing on
        # one chip legitimately exceeds ~1M evals/s at these shapes
        return isinstance(v, (int, float)) and v > 1e6

    for cell in data["rows"]:
        bad = any(
            isinstance(cell.get(k), str)
            and cell[k] != "scan_vjp_fallback"
            for k in ("pallas_evals_per_s", "pallas_grad_evals_per_s")
        ) or implausible(cell.get("pallas_evals_per_s")) or \
            implausible(cell.get("pallas_grad_evals_per_s"))
        if not bad:
            continue
        N, J = cell["N"], cell["J"]
        B = max(64, min(data.get("batch", 1024), (1 << 27) // max(N, 1)))
        prog = CELL_PROG.format(root=os.path.abspath(root), N=N, J=J, B=B,
                                iters=args.iters)
        print(f"re-measuring N={N} J={J} B={B} ...", flush=True)
        r = subprocess.run([sys.executable, "-u", "-c", prog],
                           capture_output=True, text=True, timeout=1800)
        lines = [l for l in r.stdout.splitlines() if l.startswith("CELL ")]
        if not lines:
            print(f"  still failing:\n{r.stdout[-500:]}\n{r.stderr[-500:]}")
            continue
        patch = json.loads(lines[0][5:])
        cell.update(patch)
        cell["pallas_remeasured_fresh_process"] = True
        print(f"  -> {patch}")

    with open(args.grid, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"rewrote {args.grid}")

    if args.markdown:
        lines = [
            "| N | scan ms | kalman_assoc ms | pallas evals/s | "
            "pallas grad evals/s | TFLOP/s | HBM GB/s | err vs f64 |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for cell in data["rows"]:
            if cell["J"] == 20:
                lines.append(
                    f"| {cell['N']} | {cell['celerite_scan_ms']} | "
                    f"{cell['kalman_assoc_ms']} | "
                    f"{cell.get('pallas_evals_per_s', '-')} | "
                    f"{cell.get('pallas_grad_evals_per_s', '-')} | "
                    f"{cell.get('pallas_tflops', '-')} | "
                    f"{cell.get('pallas_hbm_gbs', '-')} | "
                    f"{cell.get('err_vs_ref', '-')} |"
                )
        with open(args.markdown, "w") as fh:
            fh.write(
                "# Benchmark grid (tpu, float32, J=20 column)\n\n"
                "Full grid (J = 2, 8, 20, 32; N = 2^5..2^16) in the "
                "accompanying JSON. Large-N Pallas cells were re-measured "
                "after fixing a harness bug (closed-over data arrays became "
                "HLO constants and tripped the remote-compile body-size "
                "limit); see pallas_remeasured_fresh_process flags.\n\n"
                + "\n".join(lines) + "\n"
            )
        print(f"rewrote {args.markdown}")


if __name__ == "__main__":
    main()
