"""Multi-slice (DCN) mesh plumbing: training over a ('dcn','data','model')
mesh must equal single-device training bit-for-bit (up to f32 reduction
order), with batches sharded jointly over slices and chips."""

import numpy as np

import jax
import jax.numpy as jnp

from sais_tpu.config import ModelConfig, TemporalConfig, TrainConfig
from sais_tpu.models.full_model import full_model_init, prototypes_init
from sais_tpu.parallel.distributed import (batch_sharding,
                                           data_parallel_size,
                                           is_multislice, multislice_mesh)
from sais_tpu.train.loop import PrototypeTrainer

DIM = 32


def _cfg():
    return ModelConfig(rep_dim=DIM, modalities="RGB",
                       temporal=TemporalConfig(rep_dim=DIM, num_layers=1,
                                               num_heads=2, ffn_dim=64,
                                               max_positions=16))


def test_multislice_mesh_layout():
    mesh = multislice_mesh(2, devices=jax.devices()[:8])
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape["dcn"] == 2 and mesh.shape["data"] == 4
    assert is_multislice(mesh)
    assert data_parallel_size(mesh) == 8
    # slices hold contiguous device blocks (DCN crosses only the outer axis)
    devs = np.asarray(mesh.devices)
    flat = [d.id for d in devs.reshape(-1)]
    assert flat == sorted(flat)

    mp = multislice_mesh(2, model_parallel=2, devices=jax.devices()[:8])
    assert mp.shape == {"dcn": 2, "data": 2, "model": 2}


def test_batch_sharding_splits_across_slices():
    mesh = multislice_mesh(2, devices=jax.devices()[:8])
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, batch_sharding(mesh))
    # every device owns 2 contiguous rows
    shards = {s.device.id: np.asarray(s.data).ravel().tolist()
              for s in xs.addressable_shards}
    assert all(len(v) == 2 for v in shards.values())


def test_multislice_training_matches_single_device():
    cfg = _cfg()
    params = jax.tree.map(np.asarray, full_model_init(jax.random.key(0), cfg))
    keys, protos = prototypes_init(jax.random.key(1), 2)
    protos = np.asarray(protos)
    rng = np.random.default_rng(0)
    batches = [{
        "rgb": rng.normal(size=(8, 1, 5, DIM)).astype(np.float32),
        "rgb_mask": np.zeros((8, 1, 6), bool),
        "label_cols": (np.arange(8) % 2).astype(np.int32),
        "labels": (np.arange(8) % 2).astype(np.int32),
    } for _ in range(2)]

    single = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                              jax.tree.map(jnp.asarray, params), keys,
                              jnp.asarray(protos))
    l_single, _ = single.run_epoch(iter(batches), train=True)

    mesh = multislice_mesh(2, devices=jax.devices()[:8])
    multi = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                             jax.tree.map(jnp.asarray, params), keys,
                             jnp.asarray(protos), mesh=mesh)
    l_multi, _ = multi.run_epoch(iter(batches), train=True)
    assert abs(l_single - l_multi) < 1e-5
    np.testing.assert_allclose(np.asarray(multi.state.prototypes),
                               np.asarray(single.state.prototypes),
                               atol=1e-5)
