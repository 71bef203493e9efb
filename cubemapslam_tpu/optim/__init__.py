"""Batched nonlinear least squares on device.

Replaces the vendored g2o stack (ThirdParty/g2o, ~16k LoC: SparseOptimizer,
BlockSolver_6_3/7_3/X, Levenberg-Marquardt, Schur marginalization) and the
custom cubemap edges (g2o_cubemap_vertices_edges.{h,cpp}) with vmapped
residual/Jacobian evaluation, segment-sum Hessian assembly, batched 3x3
point-block inversion (Schur complement), and dense Cholesky on the reduced
camera system — the natural TPU mapping of sparse BA (SURVEY.md §7 step 7).
"""

from cubemapslam_tpu.optim.residuals import (  # noqa: F401
    project_to_face, reproj_residual, reproj_jacobians,
    eval_point, pose_jac_from_state,
)
from cubemapslam_tpu.optim.pose_opt import pose_optimization  # noqa: F401
from cubemapslam_tpu.optim.ba import bundle_adjust, BAProblem  # noqa: F401
from cubemapslam_tpu.optim.pose_graph import optimize_essential_graph  # noqa: F401
from cubemapslam_tpu.optim.sim3_opt import optimize_sim3  # noqa: F401
