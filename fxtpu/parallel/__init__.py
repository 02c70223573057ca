"""fxtpu.parallel — device mesh, shardings, and the distributed FX step."""

from fxtpu.parallel.mesh import (
    TIME_AXIS,
    FREQ_AXIS,
    init_distributed,
    make_correlator_mesh,
    block_sharding,
    validate_shapes,
)
from fxtpu.parallel.sharded import make_sharded_fx_step

__all__ = [
    "TIME_AXIS", "FREQ_AXIS", "init_distributed", "make_correlator_mesh",
    "block_sharding", "validate_shapes", "make_sharded_fx_step",
]
