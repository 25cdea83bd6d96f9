"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4) —
the standard JAX stand-in for real multi-chip hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flowerdiff.models import ConditionalLatentDenoiser
from flowerdiff.parallel import (
    create_mesh,
    data_sharding,
    latent_denoiser_rules,
    shard_params,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8, (
        "conftest must force 8 host-platform devices"
    )


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        create_mesh(data=3, model=2)


def test_data_parallel_batch_sharding():
    mesh = create_mesh()
    x = jnp.zeros((16, 8))
    x = jax.device_put(x, data_sharding(mesh, x.ndim))
    # each device holds a (2, 8) shard
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2, 8)}


def test_latent_denoiser_tensor_parallel_forward():
    """Megatron-sharded denoiser params over a 4x2 mesh: forward must compile
    (GSPMD inserts the collectives) and match the replicated result."""
    mesh = create_mesh(data=4, model=2)
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(32, 64, 32), time_emb_dim=16, num_classes=7
    )
    z = jax.random.normal(jax.random.key(0), (8, 16))
    t = jnp.arange(8)
    c = jnp.arange(8) % 7
    params = model.init(jax.random.key(1), z, t, c)

    expected = model.apply(params, z, t, c)

    sharded = shard_params(params, mesh, latent_denoiser_rules())
    # verify a stage kernel actually got model-sharded
    kern = sharded["params"]["block_fc_0"]["kernel"]
    assert kern.sharding.spec == P(None, "model")
    z_in = jax.device_put(z, data_sharding(mesh, 2))

    with jax.set_mesh(mesh):
        out = jax.jit(model.apply)(sharded, z_in, t, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)


def test_data_parallel_gradient_step():
    """DP over the mesh: per-shard grads must all-reduce to the global-batch
    gradient (jit inserts the psum)."""
    mesh = create_mesh()
    w = jnp.ones((8, 8))
    x = jax.random.normal(jax.random.key(0), (16, 8))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    w_sh = jax.device_put(w, NamedSharding(mesh, P()))
    x_sh = jax.device_put(x, data_sharding(mesh, 2))
    g = jax.jit(jax.grad(loss))(w_sh, x_sh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_data_parallel_sampling_under_mesh():
    """Class-conditional sampling with the batch sharded over 'data': GSPMD
    partitions the whole reverse scan; result matches the unsharded run."""
    from flowerdiff.diffusion import linear_schedule
    from flowerdiff.diffusion.api import DiffusionSampler
    from flowerdiff.models import ConditionalLatentDenoiser

    mesh = create_mesh()
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=5
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    sched = linear_schedule(6)
    sampler = DiffusionSampler(model, params, sched, (16,))
    classes = jnp.arange(16, dtype=jnp.int32) % 5

    expected = sampler.sample(jax.random.key(1), 16, classes)

    sharded_params = jax.device_put(
        sampler.params, NamedSharding(mesh, P())
    )
    classes_sh = jax.device_put(classes, data_sharding(mesh, 1))
    with jax.set_mesh(mesh):
        out = sampler._sample_jit(sharded_params, sampler.sched, jax.random.key(1), 16, classes_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)
