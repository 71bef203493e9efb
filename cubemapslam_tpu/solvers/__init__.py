"""Batched geometric solvers (RANSAC kernels).

Replaces the reference's sequential per-hypothesis RANSAC loops
(Initializer.cpp, PnPsolver.cpp, Sim3Solver.cpp) with vmapped all-hypotheses-
at-once evaluation: sampling is a top-k over random scores, model fitting is
batched small-matrix linear algebra, scoring is one masked reduction per
hypothesis. Deterministic counter-based jax.random replaces DUtils::Random
(SeedRandOnce(0), Initializer.cpp:90).
"""

from cubemapslam_tpu.solvers.sampling import sample_minimal_sets  # noqa: F401
from cubemapslam_tpu.solvers.triangulate import triangulate_rays  # noqa: F401
from cubemapslam_tpu.solvers.essential import (  # noqa: F401
    compute_e21, decompose_e, find_essential, reconstruct_e, initialize_two_view,
)
from cubemapslam_tpu.solvers.horn import horn_alignment  # noqa: F401
from cubemapslam_tpu.solvers.pnp import pnp_ransac  # noqa: F401
from cubemapslam_tpu.solvers.sim3 import sim3_ransac  # noqa: F401
