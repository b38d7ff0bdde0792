"""Collective wrappers under shard_map on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vit_tpu.parallel.collectives import (all_gather_codes,
                                          global_codebook_usage, mean_metric,
                                          psum_grads)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))


def test_psum_grads_means_across_replicas():
    mesh = _mesh()
    grads = {"w": jnp.arange(8, dtype=jnp.float32).reshape(8, 1)}

    f = shard_map(lambda g: psum_grads(g), mesh=mesh,
                  in_specs=({"w": P("data", None)},),
                  out_specs={"w": P("data", None)})
    out = f(grads)
    np.testing.assert_allclose(np.asarray(out["w"]),
                               np.full((8, 1), np.arange(8).mean(), np.float32))


def test_global_codebook_usage_union():
    mesh = _mesh()
    # each replica marks a different code; union covers all
    usage = jnp.eye(8, 16, dtype=jnp.float32)  # (8 replicas, 16 codes)

    f = shard_map(lambda u: global_codebook_usage(u[0]), mesh=mesh,
                  in_specs=(P("data", None),), out_specs=P(None),
                  check_rep=False)
    out = np.asarray(f(usage))
    want = np.zeros(16, np.float32)
    want[:8] = 1.0
    np.testing.assert_array_equal(out, want)


def test_all_gather_codes():
    mesh = _mesh()
    codes = jnp.arange(16, dtype=jnp.int32).reshape(8, 2)
    f = shard_map(lambda c: all_gather_codes(c), mesh=mesh,
                  in_specs=(P("data", None),), out_specs=P(None, None),
                  check_rep=False)
    np.testing.assert_array_equal(np.asarray(f(codes)), np.asarray(codes))


def test_mean_metric():
    mesh = _mesh()
    vals = jnp.arange(8, dtype=jnp.float32)
    f = shard_map(lambda v: mean_metric(v[0]), mesh=mesh,
                  in_specs=(P("data"),), out_specs=P(), check_rep=False)
    assert float(f(vals)) == pytest.approx(3.5)
