"""cubemapslam_tpu — a TPU-native monocular fisheye cubemap SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CubemapSLAM
(Wang et al., ACCV 2018; reference C++ at /root/reference): fisheye→cubemap
warping under the Scaramuzza omnidirectional model, ORB feature extraction,
cross-face matching, ray-based two-view initialization, EPnP/Sim3 solvers,
bundle adjustment with Schur-complement reduction, pose-graph optimization,
place recognition, and a tracking/mapping/loop-closing runtime — all expressed
as batched, fixed-shape, jittable array programs.

Design stance (SURVEY.md §7): functional core, imperative shell. All numerics
are pure jitted functions over fixed-shape arrays; the SLAM map is a
preallocated array-of-structs arena with validity masks; RANSAC loops are
batched hypothesis evaluation; the reference's thread pipeline becomes a
host-side orchestrator calling jitted device stages.

PROCESS-GLOBAL SIDE EFFECT: importing this package sets JAX's default matmul
precision to 'highest' (see below). This changes matmul numerics/perf for any
OTHER JAX code in the same process, and only affects jits traced AFTER the
import. Embedders who need bf16-default matmuls elsewhere should scope their
own code with `jax.default_matmul_precision(...)` contexts or per-call
`precision=` arguments.
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, f32 dots/einsums default to bf16-rounded operands. SLAM geometry
# (point rotation, triangulation, normal equations, Sim3 propagation) is
# chained and gated by pixel-level chi2 thresholds: at bf16 the map decays
# and tracking is lost within a few keyframes (verified on-device; CPU is
# unaffected since its default is true f32). Image-path dots that tolerate
# quantization (descriptor operator, warp kernels) opt back into bf16
# explicitly by casting their operands.
_jax.config.update("jax_default_matmul_precision", "highest")

from cubemapslam_tpu.config import SlamConfig, load_config  # noqa: F401
from cubemapslam_tpu.camera import CubemapCamera  # noqa: F401
