"""Real multi-process `jax.distributed` test over localhost.

The reference's distributed execution is multi-process: `julia -p 6` +
`pmap` chains (reference examples/turing_distributed/single_pl.jl:1,80-81)
and `mpirun -n 4` ultranest workers (examples/ultranest/single_pl.jl:3-14).
SURVEY M4 requires the TPU-native replacement to actually form a
process group. This test launches TWO separate python processes, each
with 4 virtual CPU devices, joins them with
``jax.distributed.initialize`` (coordinator on localhost), builds the
("hosts", "chains") 2-D mesh, and runs psum / sharded-ChEES /
sharded-SMC across the process boundary (tests/tools/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group_collectives():
    port = _free_port()
    n = 2
    env = dict(os.environ)
    # the workers configure their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        ok_lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert ok_lines, f"no MULTIHOST_OK in:\n{out}\n{err}"
        outs.append(ok_lines[0].split())

    # both processes must agree bit-for-bit on every collective result
    assert outs[0] == outs[1], outs
    psum_val = float(outs[0][1])
    # sum over 8 global shards: (0+1+2+3) + (10+11+12+13) = 52
    assert psum_val == 52.0, psum_val
    chees_mean = float(outs[0][2])
    # ChEES on N(1.5, 1): posterior mean ~1.5 within loose MC error
    assert abs(chees_mean - 1.5) < 0.5, chees_mean
    smc_logz = float(outs[0][3])
    # L(z) = exp(-|z-1.5|^2/2) (unnormalized), prior N(0, 9 I), dim=2:
    # per-dim logZ = log[ sqrt(2pi) N(1.5; 0, sqrt(1+9)) ]
    #             = -0.5 log(10) - 1.5^2 / (2*10)
    import numpy as np

    expected = 2 * (-0.5 * np.log(10.0) - 1.5**2 / (2 * 10.0))
    assert abs(smc_logz - expected) < 0.6, (smc_logz, expected)
