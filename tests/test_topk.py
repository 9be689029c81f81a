"""Sharded top-k merge == single-device lax.top_k on the 8-dev CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gdmcf_tpu.ops.topk import sharded_topk
from gdmcf_tpu.parallel.mesh import make_mesh

cpu_devices = jax.devices("cpu")
pytestmark = pytest.mark.skipif(len(cpu_devices) < 8,
                                reason="needs 8 virtual cpu devices")


@pytest.mark.parametrize("dp,mp", [(2, 4), (4, 2), (1, 8)])
def test_sharded_topk_matches_dense(rng, dp, mp):
    mesh = make_mesh(dp=dp, mp=mp, devices=cpu_devices)
    B, n, k = 8 * dp, 64 * mp, 20
    scores = rng.standard_normal((B, n)).astype(np.float32)
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)

    sharded = jax.device_put(jnp.asarray(scores),
                             NamedSharding(mesh, P("dp", "mp")))
    vals, idx = sharded_topk(mesh, sharded, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-6)
    # indices must point at identical values (ties may reorder)
    np.testing.assert_allclose(
        np.take_along_axis(scores, np.asarray(idx), axis=1),
        np.asarray(ref_vals), rtol=1e-6)


@pytest.mark.parametrize("n,k,chunk", [(2810, 100, 512), (300, 100, 512),
                                       (1000, 20, 128), (513, 7, 256),
                                       (4096, 100, 512)])
def test_chunked_topk_exact(rng, n, k, chunk):
    """chunked_topk == lax.top_k bit-for-bit, including tie indices."""
    from gdmcf_tpu.ops.topk import chunked_topk
    B = 16
    scores = rng.standard_normal((B, n)).astype(np.float32)
    # inject heavy ties and -inf masking (the eval regime)
    scores[rng.random((B, n)) < 0.3] = -np.inf
    scores[rng.random((B, n)) < 0.2] = 1.5
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)
    # min_n=0 forces the chunked path (production crossover is 64k columns)
    vals, idx = chunked_topk(jnp.asarray(scores), k, chunk=chunk, min_n=0)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_chunked_topk_all_neg_inf_row(rng):
    """Degenerate all--inf row: same indices as lax.top_k (0..k-1)."""
    from gdmcf_tpu.ops.topk import chunked_topk
    scores = np.full((4, 1500), -np.inf, np.float32)
    scores[0, 7] = 1.0
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), 10)
    vals, idx = chunked_topk(jnp.asarray(scores), 10, chunk=256, min_n=0)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sharded_topk_with_neg_inf_mask(rng):
    """Masked (-inf) history entries must never be selected."""
    mesh = make_mesh(dp=2, mp=4, devices=cpu_devices)
    B, n, k = 16, 256, 10
    scores = rng.standard_normal((B, n)).astype(np.float32)
    mask = rng.random((B, n)) < 0.5
    scores[mask] = -np.inf
    sharded = jax.device_put(jnp.asarray(scores),
                             NamedSharding(mesh, P("dp", "mp")))
    vals, idx = sharded_topk(mesh, sharded, k)
    picked_masked = mask[np.arange(B)[:, None], np.asarray(idx)]
    finite = np.isfinite(np.asarray(vals))
    assert not picked_masked[finite].any()
