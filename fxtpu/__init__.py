"""fxtpu — a TPU-native FX correlator framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
evanmayer/effex (see SURVEY.md for the structural map of the reference and
the file:line parity citations throughout this package).
"""

import os as _os

# Persistent XLA compilation cache: on the remote-compile TPU tunnel a cold
# compile takes minutes; cached recompiles take seconds.  The env var alone
# is NOT enough on hosts whose sitecustomize imports jax before user code
# (jax freezes the config default at import), so set it through jax.config
# too.  Set JAX_COMPILATION_CACHE_DIR="" to disable.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/fxtpu_xla"))
if _os.environ["JAX_COMPILATION_CACHE_DIR"]:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])

from fxtpu.config import CorrelatorConfig, STATES, MODES

__version__ = "0.1.0"

__all__ = ["CorrelatorConfig", "STATES", "MODES", "__version__"]
