"""pioran_tpu — TPU-native scalable Gaussian-process PSD inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Pioran.jl (bending power-law PSD estimation of irregularly sampled time
series via O(N) celerite GPs), redesigned TPU-first:

- pure-functional pytree models, one jitted likelihood of the parameter
  vector (the reference rebuilds model+approx+GP per call,
  reference examples/ultranest/single_pl.jl:65-91)
- `lax.scan` / associative-scan solver kernels instead of scalar loops
- samplers (NUTS / SMC / nested-sampling replacement) built in and
  vmapped over chains/particles, sharded over device meshes via
  `jax.sharding` collectives instead of Distributed.jl/MPI
"""

from .config import use_x64
from .models.psd import (
    PowerSpectralDensity,
    PowerLaw,
    SingleBendingPowerLaw,
    DoubleBendingPowerLaw,
    Lorentzian,
    QPO,
    SumPSD,
    separate_psd,
)
from .models.kernels import (
    CeleriteKernel,
    celerite_term,
    sho_term,
    exp_term,
    SHO,
    Exp,
    celerite_psd,
    celerite_covariance,
)
from .ops.approx import (
    approx,
    approximated_psd,
    get_approx_coefficients,
)
from .ops import celerite as celerite_ops
from .ops import direct as direct_ops

__version__ = "0.4.0"
