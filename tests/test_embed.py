"""Row-sharded embedding lookup: forward parity + gradient locality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gdmcf_tpu.parallel.embed import sharded_embedding_lookup
from gdmcf_tpu.parallel.mesh import make_mesh

cpu_devices = jax.devices("cpu")
pytestmark = pytest.mark.skipif(len(cpu_devices) < 8,
                                reason="needs 8 virtual cpu devices")


def setup(rng, n_rows=64, d=16, b=24):
    mesh = make_mesh(dp=1, mp=8, devices=cpu_devices)
    table = rng.standard_normal((n_rows, d)).astype(np.float32)
    ids = rng.integers(0, n_rows, b).astype(np.int32)
    ts = jax.device_put(jnp.asarray(table), NamedSharding(mesh, P("mp", None)))
    return mesh, table, ids, ts


def test_lookup_matches_dense_gather(rng):
    mesh, table, ids, ts = setup(rng)
    out = sharded_embedding_lookup(mesh, ts, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)


def test_lookup_gradients_scatter_to_rows(rng):
    mesh, table, ids, ts = setup(rng)

    def loss(t):
        out = sharded_embedding_lookup(mesh, t, jnp.asarray(ids))
        return (out ** 2).sum()

    g = jax.grad(loss)(ts)
    expect = np.zeros_like(table)
    np.add.at(expect, ids, 2 * table[ids])
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-6)


def test_lookup_inside_jit(rng):
    mesh, table, ids, ts = setup(rng)
    out = jax.jit(lambda t, i: sharded_embedding_lookup(mesh, t, i))(
        ts, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), table[ids], rtol=1e-6)
