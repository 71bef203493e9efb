"""ORB feature extraction as batched fixed-shape JAX programs.

Replaces the reference ORBextractor (include/ORBExtractor.h,
src/ORBExtractor.cpp, 1072 LoC): image pyramid + grid FAST + octree NMS +
IC-angle orientation + rBRIEF, re-designed for TPU (SURVEY.md §7 step 3):
data-dependent keypoint counts become fixed-K top-K selections with validity
masks; the octree spatial NMS becomes grid-bucketed best-response selection;
descriptors are batched pattern gathers.
"""

from cubemapslam_tpu.features.extractor import (  # noqa: F401
    OrbParams,
    Keypoints,
    extract_orb,
    build_extractor,
)
from cubemapslam_tpu.features.pattern import orb_pattern  # noqa: F401
