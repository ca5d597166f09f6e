from .roots import (
    check_conjugate_pair,
    check_order_imag_roots,
    check_roots_bounds,
    roots_valid_jit,
)
from .mcmc_stats import ess_bulk, ess_tail, split_rhat, summarize_chains
from .samples import makelist_namessplit, separate_samples
from .subset import extract_subset

__all__ = [
    "check_conjugate_pair",
    "check_order_imag_roots",
    "check_roots_bounds",
    "roots_valid_jit",
    "extract_subset",
    "separate_samples",
    "makelist_namessplit",
    "split_rhat",
    "ess_bulk",
    "ess_tail",
    "summarize_chains",
]
