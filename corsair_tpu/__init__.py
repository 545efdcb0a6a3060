"""corsair_tpu — TPU-native object retrieval + symmetry-aided registration.

A from-scratch JAX/XLA/Pallas framework with the capabilities of CORSAIR
(reference: ExistentialRobotics/CORSAIR). See ARCHITECTURE.md.
"""

__version__ = "0.1.0"

from corsair_tpu.core.sparse import SparseGrid  # noqa: F401
