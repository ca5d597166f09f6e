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

# The reference's remaining root exports (reference src/Pioran.jl:19-25),
# so a Pioran.jl user finds every name at the package root here too.
# mean/cov/std are methods on the PosteriorGP object rather than free
# functions (models/gp.py), and QPO/feature -> celerite conversion is the
# feature's .celerite_coefficients() method (models/psd.py).
from .models.gp import (
    ScalableGP,
    GaussianProcess,
    ConditionedGP,
    PosteriorGP,
    CustomMean,
    posterior,
)
from .models.carma import CARMA, quad2roots, roots2coeffs
from .ops.celerite import log_likelihood
from .priors import (
    TwoUniformDependent,
    ThreeUniformDependent,
    TwoLogUniformDependent,
)
from .utils.subset import extract_subset
from .diagnostics.approx_checks import run_diagnostics, sample_approx_model
from .diagnostics.ppc import run_posterior_predict_checks

__version__ = "0.5.0"
