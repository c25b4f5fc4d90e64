"""DINO trainer checkpoint/resume round-trip (utils.restart_from_checkpoint
equivalent) and non-finite loss abort."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import ViTConfig
from sais_tpu.train.checkpoint import CheckpointManager
from sais_tpu.train.dino import DINOConfig, DINOTrainer

pytestmark = pytest.mark.slow


def _trainer():
    cfg = DINOConfig(out_dim=16, n_global_crops=2, n_local_crops=0,
                     epochs=2, batch_size=2, warmup_epochs=0,
                     freeze_last_layer_epochs=0)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=16, depth=1,
                        num_heads=2)
    return DINOTrainer(vit_cfg, cfg, niter_per_ep=2, key=jax.random.key(0))


def test_dino_checkpoint_resume(tmp_path):
    g = jax.random.uniform(jax.random.key(1), (4, 16, 16, 3))

    t1 = _trainer()
    t1.step(g, None)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, t1.state())
    l_next = t1.step(g, None)

    t2 = _trainer()
    step, state = mgr.restore_latest(t2.state())
    assert step == 1
    t2.load_state(state)
    assert t2.step_idx == t1.step_idx - 1
    l_resumed = t2.step(g, None)
    # deterministic resume: identical next-step loss
    np.testing.assert_allclose(l_resumed, l_next, rtol=1e-6)
    mgr.close()


def test_dino_nonfinite_loss_aborts():
    t = _trainer()
    bad = jnp.full((4, 16, 16, 3), jnp.nan)
    with pytest.raises(FloatingPointError):
        t.step(bad, None)


def test_dino_data_parallel_matches_single_device():
    from sais_tpu.config import MeshConfig
    from sais_tpu.parallel.mesh import make_mesh
    g = jax.random.uniform(jax.random.key(7), (16, 16, 16, 3))

    t_single = _trainer()
    cfg = DINOConfig(out_dim=16, n_global_crops=2, n_local_crops=0,
                     epochs=2, batch_size=2, warmup_epochs=0,
                     freeze_last_layer_epochs=0)
    vit_cfg = ViTConfig(image_size=16, patch_size=8, embed_dim=16, depth=1,
                        num_heads=2)
    t_mesh = DINOTrainer(vit_cfg, cfg, niter_per_ep=2, key=jax.random.key(0),
                         mesh=make_mesh(MeshConfig()))
    l1 = t_single.step(g, None)
    l2 = t_mesh.step(g, None)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    # one more step: updated params/center agree
    np.testing.assert_allclose(t_single.step(g, None), t_mesh.step(g, None),
                               rtol=1e-4)
