"""Flash attention wired into the PRODUCTION temporal model.

The fused Pallas kernel (kernels/flash_attention.py) must be reachable via
`TemporalConfig.use_flash` from `prototypes_forward` and `GestureDecoder`
(the `sais decode` / `sais steps` engines), match the dense encoder's
probabilities at a long bucketed length (L >= 1024 — the reference's
2000-frame-cap regime, prepare_dataset.py:2437), and export the CLS-query
attention row in place of the dense (L, L) matrix — the only row SAIS
consumes for attribution (prepare_model.py:213,221).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sais_tpu.config import (ModelConfig, PipelineConfig, TemporalConfig,
                             WindowConfig)
from sais_tpu.models.full_model import (cls_attention, full_model_init,
                                        prototypes_forward, prototypes_init,
                                        resolve_flash)

D = 64


def _model_cfg(use_flash):
    t = TemporalConfig(rep_dim=D, num_layers=2, num_heads=4, ffn_dim=128,
                       use_flash=use_flash)
    return ModelConfig(rep_dim=D, modalities="RGB", temporal=t)


def test_resolve_flash_auto_and_forced():
    auto = _model_cfg(None)
    # auto never turns flash on off-TPU (the kernel would need interpret
    # mode, which is strictly slower than dense XLA on CPU)
    assert resolve_flash(auto, 2000) == (jax.default_backend() == "tpu")
    assert resolve_flash(auto, 16) is False          # below flash_min_len
    assert resolve_flash(_model_cfg(True), 16) is True
    assert resolve_flash(_model_cfg(False), 4096) is False


def test_prototypes_forward_flash_matches_dense_long():
    """L = 1024 through the full Prototypes head: probs match, attention
    export becomes the CLS row."""
    key = jax.random.key(0)
    params = full_model_init(key, _model_cfg(False))
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 1024, D))
    mask = jnp.zeros((1, 1, 1025), bool).at[0, 0, 1000:].set(True)

    dense = prototypes_forward(params, _model_cfg(False), rgb, mask)
    flash = prototypes_forward(params, _model_cfg(True), rgb, mask)

    np.testing.assert_allclose(np.asarray(flash.video_rep),
                               np.asarray(dense.video_rep),
                               rtol=2e-3, atol=2e-4)
    assert dense.attn.ndim == 3 and flash.attn.ndim == 2
    np.testing.assert_allclose(np.asarray(flash.attn),
                               np.asarray(cls_attention(dense.attn)),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_gesture_decoder_flash_matches_dense():
    """End-to-end long-window decode (the `sais steps` full-length regime):
    GestureDecoder with flash on reproduces the dense path's ensembled
    window probabilities and exports CLS-row attention artifacts."""
    from sais_tpu.infer.pipeline import GestureDecoder

    # one 1024-frame window, stride 1 (full-length sequence into the
    # temporal encoder — the regime SURVEY section 5.7 targets)
    wcfg = WindowConfig(duration_s=51.2, hop_s=51.2, fps=20.0,
                        stride_divisor=4096, flow_jump_factor=15)
    assert wcfg.duration_frames == 1024

    rng = np.random.default_rng(0)
    reps = rng.standard_normal((1040, D)).astype(np.float32)

    key = jax.random.key(7)
    params = full_model_init(key, _model_cfg(False))
    _, protos = prototypes_init(jax.random.fold_in(key, 1), 2)

    def decoder(use_flash):
        cfg = PipelineConfig(model=_model_cfg(use_flash), window=wcfg)
        return GestureDecoder([(params, protos)], cfg, device_batch=4)

    dense, flash = decoder(False), decoder(True)
    p_dense = dense.window_probs("v", reps, None)
    p_flash = flash.window_probs("v", reps, None)
    assert p_dense.shape[0] == 1
    np.testing.assert_allclose(p_flash, p_dense, rtol=5e-4, atol=5e-5)

    a_dense = dense.inference_artifacts("v", reps, None)
    a_flash = flash.inference_artifacts("v", reps, None)
    att_d, att_f = a_dense["attention"], a_flash["attention"]
    assert att_d.ndim == 3 and att_f.ndim == 2     # (W, L, L) vs (W, L)
    np.testing.assert_allclose(att_f, att_d[:, 0, :], rtol=1e-3, atol=1e-5)
