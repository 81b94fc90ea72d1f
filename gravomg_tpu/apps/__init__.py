"""Application recipes over the multigrid stack (BASELINE configs 1-3).

Poisson solves, implicit mesh smoothing, and geodesics-in-heat — the
workloads `BASELINE.md` benchmarks; the reference library stops at
hierarchy construction and leaves these to its callers.
"""

from gravomg_tpu.apps.poisson import (poisson_hierarchy,
                                      screened_poisson_operator,
                                      solve_poisson)
from gravomg_tpu.apps.smoothing import implicit_smooth
from gravomg_tpu.apps.heat import heat_geodesics, refit_hierarchy
from gravomg_tpu.apps.spectral import laplace_eigs

__all__ = [
    "poisson_hierarchy", "screened_poisson_operator", "solve_poisson",
    "implicit_smooth", "heat_geodesics", "refit_hierarchy",
    "laplace_eigs",
]
