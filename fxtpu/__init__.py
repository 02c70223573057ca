"""fxtpu — a TPU-native FX correlator framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
evanmayer/effex (see SURVEY.md for the structural map of the reference and
the file:line parity citations throughout this package).
"""

from fxtpu.config import CorrelatorConfig, STATES, MODES

__version__ = "0.1.0"

__all__ = ["CorrelatorConfig", "STATES", "MODES", "__version__"]
