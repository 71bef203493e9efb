"""Host-side runtime: the imperative shell around the jitted stages.

The reference runs three long-lived threads sharing a mutex-guarded map
(Tracking / LocalMapping / LoopClosing, spawned in System.cpp:108-128).
Here the same state machines are host-orchestrated calls into jitted device
stages over the functional map arena — data races are unrepresentable, and
the cross-thread stop/queue protocols (LocalMapping.cpp:484-681) reduce to
ordinary control flow.
"""

from cubemapslam_tpu.runtime.system import CubemapSLAM  # noqa: F401
