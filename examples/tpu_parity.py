#!/usr/bin/env python
"""End-to-end posterior-parity runs on the real TPU, with committed artifacts.

Reruns the reference's three flagship nested-sampling analyses
(reference examples/ultranest/inference/{simu_single,simu_double,
simu_periodic_rednoise_123_factor}/info/results.json) ON the TPU chip in
f32, on the exact cached data subsets ultranest saw, and writes
ultranest-layout artifacts plus a machine-checkable summary:

    python examples/tpu_parity.py --out artifacts/tpu_parity \
        [--datasets single,double,periodic] [--samplers ns,smc] \
        [--particles 1024] [--seed 7]

Artifacts: ``<out>/<dataset>_<sampler>/chains/equal_weighted_post.txt``,
``.../info/results.json``, and ``<out>/summary.json`` holding, per run,
the logZ difference and per-parameter posterior-mean pulls vs the stored
baselines (tests/data/*/results.json). tests/test_tpu_artifacts.py
validates the committed summary against the acceptance gates.
"""

import argparse
import json
import os
import sys
import time


HERE = os.path.dirname(os.path.abspath(__file__))
TESTDATA = os.path.join(HERE, "..", "tests", "data")

# stored-order -> spec-order permutations (see tests/test_parity_models.py)
DATASETS = {
    "single": dict(
        dir="simu_single", subset="simu_single_subset_time_series.txt",
        perm=[0, 2, 1, 3, 4, 5], logz_tol=1.0, pull_tol=0.75,
    ),
    "double": dict(
        dir="simu_double", subset="simu_double_subset_time_series.txt",
        perm=[0, 2, 4, 1, 3, 5, 6, 7], logz_tol=1.2, pull_tol=1.0,
    ),
    "periodic": dict(
        dir="simu_periodic",
        subset="simu_periodic_rednoise_subset_time_series.txt",
        perm=[0, 2, 1, 3, 4, 5, 6, 7, 8], logz_tol=1.5, pull_tol=1.0,
    ),
    # the reference docs workflow: 7 params incl. flux offset c,
    # variance-normalised approximation (docs/src/data/inference)
    "docs": dict(
        dir="simu_docs", subset="subset_time_series.txt",
        perm=[0, 2, 1, 3, 4, 5, 6], logz_tol=1.0, pull_tol=1.0,
        kwargs=dict(use_c=True, alpha1_max=1.25, is_integrated_power=False),
    ),
}


def load_dataset(name):
    import numpy as np

    cfg = DATASETS[name]
    d = os.path.join(TESTDATA, cfg["dir"])
    with open(os.path.join(d, "results.json")) as fh:
        stored = json.load(fh)
    path = os.path.join(d, cfg["subset"])
    A = np.loadtxt(path)
    xbar = va = None
    with open(path) as fh:
        for line in fh:
            if line.startswith("#mean: "):
                left, right = line[len("#mean: "):].split(" va: ")
                xbar, va = float(left), float(right)
                break
    return stored, A[:, 0], A[:, 1], A[:, 2], xbar, va


def build_spec(name, t, y, yerr, xbar, va):
    from pioran_tpu.inference import (
        double_bending_model,
        periodic_rednoise_model,
        single_bending_model,
    )

    builders = {
        "single": single_bending_model,
        "double": double_bending_model,
        "periodic": periodic_rednoise_model,
        "docs": single_bending_model,
    }
    kwargs = DATASETS[name].get("kwargs", {})
    return builders[name](t, y, yerr, xbar, va, **kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/tpu_parity")
    ap.add_argument("--datasets", default="single,double,periodic")
    ap.add_argument("--samplers", default="ns")
    ap.add_argument("--particles", type=int, default=1024)
    ap.add_argument("--moves", type=int, default=12)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--resume", action="store_true",
                    help="use the resumable (host-stepped) NS driver — "
                    "one short jitted step per iteration instead of one "
                    "long-running while_loop program; required on "
                    "tunneled TPU backends whose RPC layer kills "
                    "minutes-long single executions")
    args = ap.parse_args()

    import jax
    import numpy as np

    from pioran_tpu.inference import run_inference

    dev = jax.devices()[0]
    print(f"running on: {dev.platform} / {dev.device_kind}")

    os.makedirs(args.out, exist_ok=True)
    spath = os.path.join(args.out, "summary.json")
    summary = {
        "platform": dev.platform,
        "device_kind": str(dev.device_kind),
        "jax_version": jax.__version__,
        "x64": bool(jax.config.jax_enable_x64),
        "seed": args.seed,
        "particles": args.particles,
        "runs": {},
    }
    if os.path.exists(spath):
        # merge: keep prior runs (datasets are run incrementally)
        with open(spath) as fh:
            prev = json.load(fh)
        if prev.get("platform") == summary["platform"]:
            summary["runs"].update(prev.get("runs", {}))

    for name in args.datasets.split(","):
        stored, t, y, yerr, xbar, va = load_dataset(name)
        spec = build_spec(name, t, y, yerr, xbar, va)
        cfg = DATASETS[name]
        for sampler in args.samplers.split(","):
            tag = f"{name}_{sampler}"
            log_dir = os.path.join(args.out, tag)
            print(f"== {tag}: N={len(t)} params={len(spec.names)}")
            t0 = time.time()
            res = run_inference(
                spec, sampler=sampler, key=jax.random.PRNGKey(args.seed),
                num_particles=args.particles, num_moves=args.moves,
                log_dir=log_dir, resume=args.resume,
            )
            wall = time.time() - t0
            ours_mean = np.asarray(res["posterior"]["mean"])
            ours_std = np.asarray(res["posterior"]["stdev"])
            inv = np.argsort(cfg["perm"])
            ref_mean = np.asarray(stored["posterior"]["mean"])
            ref_std = np.asarray(stored["posterior"]["stdev"])
            pull = np.abs(ours_mean[inv] - ref_mean) / ref_std
            width_ratio = ours_std[inv] / ref_std
            entry = {
                "dataset": name,
                "sampler": sampler,
                "n_points": int(len(t)),
                "wall_s": round(wall, 2),
                "logz": res.get("logz"),
                "logz_ref": stored["logz"],
                "logz_diff": (None if res.get("logz") is None
                              else res["logz"] - stored["logz"]),
                "logz_tol": cfg["logz_tol"],
                "max_pull": float(pull.max()),
                "pulls": pull.round(4).tolist(),
                "pull_tol": cfg["pull_tol"],
                "width_ratio": width_ratio.round(4).tolist(),
                "ess": res.get("ess"),
                "ncall": res.get("ncall"),
                "ml_logl": res["maximum_likelihood"]["logl"],
                "ml_logl_ref": stored["maximum_likelihood"]["logl"],
            }
            ok = (entry["logz_diff"] is None
                  or abs(entry["logz_diff"]) < cfg["logz_tol"]) and \
                entry["max_pull"] < cfg["pull_tol"]
            entry["pass"] = bool(ok)
            summary["runs"][tag] = entry
            print(f"   logZ {entry['logz']} (ref {entry['logz_ref']}, "
                  f"diff {entry['logz_diff']}) max_pull {entry['max_pull']:.3f}"
                  f" wall {wall:.1f}s -> {'PASS' if ok else 'FAIL'}")

    with open(spath, "w") as fh:
        json.dump(summary, fh, indent=2)
    n_pass = sum(r["pass"] for r in summary["runs"].values())
    print(f"{n_pass}/{len(summary['runs'])} runs pass -> {args.out}/summary.json")
    return 0 if n_pass == len(summary["runs"]) else 1


if __name__ == "__main__":
    sys.exit(main())
