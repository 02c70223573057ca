"""Sharded host->mesh ingest (fxtpu.parallel.ingest): placement shardings,
engine integration, and per-process sample spans.  Runs on the conftest's
8 virtual CPU devices; the multi-process branch
(make_array_from_process_local_data) shares the sharding-spec code path
validated here and is exercised on real multi-host slices."""

import numpy as np
import pytest

import jax

from fxtpu.config import CorrelatorConfig
from fxtpu.fx import FxEngine
from fxtpu.ops.cplx import to_complex
from fxtpu.parallel import make_correlator_mesh
from fxtpu.parallel.ingest import block_sharding, local_sample_span, put_block


@pytest.fixture(scope="module")
def mesh():
    return make_correlator_mesh(4, 2, devices=jax.devices()[:8])


def _block(rng, nch=2, ns=2**13):
    return (rng.normal(size=(nch, ns)) + 1j * rng.normal(size=(nch, ns))
            ).astype(np.complex64)


def test_put_block_sharded_placement(rng, mesh):
    blk = _block(rng)
    iq = put_block(blk, mesh)
    want = block_sharding(mesh)
    assert iq.re.sharding == want and iq.im.sharding == want
    np.testing.assert_allclose(to_complex(iq), blk, atol=0)


def test_put_block_no_mesh_single_device(rng):
    blk = _block(rng)
    iq = put_block(blk, None)
    np.testing.assert_allclose(to_complex(iq), blk, atol=0)


def test_engine_prepare_block_uses_mesh_sharding(rng, mesh):
    cfg = CorrelatorConfig(num_samp=2**13, nbins=256, clamp_num_samp=False)
    eng = FxEngine(cfg, mesh=mesh)
    iq = eng.prepare_block(_block(rng, ns=cfg.num_samp))
    assert iq.re.sharding == block_sharding(mesh)
    # and the sharded step consumes it directly
    import jax.numpy as jnp
    vis, _ = eng.step(iq, jnp.zeros((2,), jnp.float32), eng.fresh_history())
    assert to_complex(vis).shape == (1, 256)


def test_local_sample_span_single_process_covers_all(mesh):
    start, stop = local_sample_span(mesh, 2**13)
    assert (start, stop) == (0, 2**13)  # one process owns every device
