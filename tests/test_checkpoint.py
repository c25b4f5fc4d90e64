"""Checkpointing: orbax resume, result persistence, torch-interop export
round-trip through the weight converters."""

import numpy as np

import jax
import jax.numpy as jnp

from sais_tpu.config import ModelConfig, TemporalConfig
from sais_tpu.models.full_model import (full_model_init, prototypes_forward,
                                        prototypes_init)
from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                      prototypes_from_torch)
from sais_tpu.train.checkpoint import (CheckpointManager,
                                       export_torch_prototypes,
                                       export_torch_state_dict,
                                       load_training_result,
                                       save_training_result)

DIM = 32


def _cfg():
    return ModelConfig(rep_dim=DIM, modalities="RGB", importance_head=True,
                       temporal=TemporalConfig(rep_dim=DIM, num_layers=2,
                                               num_heads=2, ffn_dim=64,
                                               max_positions=16))


def test_checkpoint_manager_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.int32(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    step, restored = mgr.restore_latest(state)
    assert step is None  # nothing saved yet
    mgr.save(1, state)
    mgr.save(2, jax.tree.map(lambda x: x + 1, state))
    step, restored = mgr.restore_latest(jax.tree.map(np.zeros_like, state))
    assert step == 2
    np.testing.assert_array_equal(restored["w"],
                                  np.arange(6.0).reshape(2, 3) + 1)
    mgr.close()


def test_training_result_roundtrip(tmp_path):
    cfg = _cfg()
    params = full_model_init(jax.random.key(0), cfg)
    _, protos = prototypes_init(jax.random.key(1), 2)
    save_training_result(str(tmp_path), {
        "model": params, "prototypes": protos,
        "metrics": {"loss": [1.0, 0.5]}})
    out = load_training_result(str(tmp_path))
    assert out["metrics"]["loss"] == [1.0, 0.5]
    np.testing.assert_array_equal(out["prototypes"], np.asarray(protos))
    np.testing.assert_array_equal(out["params"]["frame_pos"],
                                  np.asarray(params["frame_pos"]))


def test_torch_export_import_roundtrip():
    """export -> reference naming -> re-import == identity, proving interop
    with params.zip/prototypes.zip consumers in both directions."""
    cfg = _cfg()
    params = full_model_init(jax.random.key(2), cfg)
    sd = export_torch_state_dict(params)
    # every key must carry the DDP prefix: the reference loader strips it
    # unconditionally via param_name.split('module.')[1]
    # (prepare_model.py:521-530) and would IndexError on bare names
    assert all(k.startswith("module.") for k in sd)
    stripped = {k.split("module.")[1]: v for k, v in sd.items()}  # as ref does
    assert "transEncoderFrame.layers.0.self_attn.in_proj_weight" in stripped
    assert ("frame_pos_embeddings.0" in stripped
            and stripped["frame_pos_embeddings.0"].shape == (1, DIM))
    back = full_model_params_from_torch(sd, num_layers=2)

    rgb = jax.random.normal(jax.random.key(3), (2, 1, 5, DIM))
    mask = jnp.zeros((2, 1, 6), bool)
    a = prototypes_forward(params, cfg, rgb, mask)
    b = prototypes_forward(back, cfg, rgb, mask)
    np.testing.assert_allclose(np.asarray(a.video_rep),
                               np.asarray(b.video_rep), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.importances),
                               np.asarray(b.importances), atol=1e-6)

    keys, protos = prototypes_init(jax.random.key(4), 3)
    pd = export_torch_prototypes(keys, protos)
    keys2, mat2 = prototypes_from_torch(pd)
    assert keys2 == keys
    np.testing.assert_array_equal(mat2, np.asarray(protos))
