"""fxtpu — a TPU-native FX correlator framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
evanmayer/effex (see SURVEY.md for the structural map of the reference and
the file:line parity citations throughout this package).
"""

import os as _os

# Persistent XLA compilation cache: on the remote-compile TPU tunnel a cold
# compile takes minutes; cached recompiles take seconds.  setdefault so
# users/environments can override or disable.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/fxtpu_xla"))

from fxtpu.config import CorrelatorConfig, STATES, MODES

__version__ = "0.1.0"

__all__ = ["CorrelatorConfig", "STATES", "MODES", "__version__"]
