"""Parity: JAX temporal model + converter vs golden torch fullModel.

Gate 3 of the build plan (SURVEY.md section 7): logits / video reps /
attention maps must match the PyTorch semantics (patched torch-1.8
TransformerEncoder) to <=1e-3; we hold f32 to ~1e-4.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sais_tpu.config import ModelConfig, TemporalConfig
from sais_tpu.models import heads
from sais_tpu.models.full_model import (classification_forward,
                                        full_model_init, mil_forward,
                                        prototypes_forward)
from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                      prototypes_from_torch)
from tests.golden.torch_temporal import (golden_mil_forward, golden_nce_loss,
                                         golden_prototypes_forward,
                                         random_full_model_state_dict)

DIM, FFN, LAYERS, HEADS, POS = 64, 128, 3, 4, 32


def _cfg(**kw):
    t = TemporalConfig(rep_dim=DIM, num_layers=LAYERS, num_heads=HEADS,
                       ffn_dim=FFN, max_positions=POS)
    return ModelConfig(rep_dim=DIM, temporal=t, **kw)


def _sd_and_params(seed=0, importance=True):
    gen = torch.Generator().manual_seed(seed)
    sd = random_full_model_state_dict(gen, dim=DIM, ffn=FFN, layers=LAYERS,
                                      pos_slots=POS, importance=importance)
    params = full_model_params_from_torch(sd, num_layers=LAYERS)
    return gen, sd, params


def _batch(gen, b=3, s=2, f=9):
    x = torch.randn(b, s, f, DIM, generator=gen)
    lens = torch.randint(3, f + 1, (b,), generator=gen)
    pad = torch.zeros(b, s, f + 1, dtype=torch.bool)
    for i, ln in enumerate(lens):
        pad[i, :, ln + 1:] = True  # CLS slot 0 always valid (collator semantics)
    return x, pad


def test_prototypes_forward_rgb_flow_parity():
    gen, sd, params = _sd_and_params(0)
    rgb, rgb_pad = _batch(gen)
    flow, flow_pad = _batch(gen, f=4)

    g_rep, g_logits, g_attn, g_imp = golden_prototypes_forward(
        sd, rgb, rgb_pad, flow, flow_pad, layers=LAYERS, heads=HEADS,
        importance=True)

    cfg = _cfg(modalities="RGB-Flow", importance_head=True)
    out = prototypes_forward(params, cfg, jnp.asarray(rgb.numpy()),
                             jnp.asarray(pad_np(rgb_pad)),
                             jnp.asarray(flow.numpy()),
                             jnp.asarray(pad_np(flow_pad)))
    np.testing.assert_allclose(np.asarray(out.video_rep), g_rep.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.aux_logits), g_logits.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.attn), g_attn.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.importances), g_imp.numpy(),
                               rtol=1e-4, atol=1e-5)


def pad_np(pad):
    return pad.numpy()


def test_prototypes_forward_rgb_only_parity():
    gen, sd, params = _sd_and_params(1)
    rgb, rgb_pad = _batch(gen, b=2, s=1, f=15)
    g_rep, _, g_attn, _ = golden_prototypes_forward(
        sd, rgb, rgb_pad, layers=LAYERS, heads=HEADS)
    cfg = _cfg(modalities="RGB")
    out = prototypes_forward(params, cfg, jnp.asarray(rgb.numpy()),
                             jnp.asarray(rgb_pad.numpy()))
    np.testing.assert_allclose(np.asarray(out.video_rep), g_rep.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.attn), g_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mil_forward_parity():
    gen, sd, params = _sd_and_params(2)
    rgb, rgb_pad = _batch(gen, b=2, s=5, f=7)
    g_logits, g_attn = golden_mil_forward(sd, rgb, rgb_pad, nclasses=3,
                                          layers=LAYERS, heads=HEADS)
    cfg = _cfg(modalities="RGB", nclasses=3)
    logits, attn = mil_forward(params, cfg, jnp.asarray(rgb.numpy()),
                               jnp.asarray(rgb_pad.numpy()))
    np.testing.assert_allclose(np.asarray(logits), g_logits.numpy(),
                               rtol=1e-4, atol=1e-5)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(attn[c]), g_attn[c].numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_nce_loss_and_probs_parity():
    gen = torch.Generator().manual_seed(3)
    reps = torch.randn(6, 32, generator=gen)
    proto = {"0": torch.rand(1, 32, generator=gen),
             "1": torch.rand(1, 32, generator=gen),
             "2": torch.rand(1, 32, generator=gen)}
    labels = [0, 1, 2, 0, 1, 7]  # 7 matches no key -> column 0 quirk

    keys, mat = prototypes_from_torch(proto)
    g_loss = golden_nce_loss(reps, torch.vstack(list(proto.values())), keys,
                             labels)
    cols = heads.labels_to_prototype_columns(labels, keys)
    assert cols.tolist() == [0, 1, 2, 0, 1, 0]
    loss = heads.nce_loss(jnp.asarray(reps.numpy()), mat, jnp.asarray(cols))
    np.testing.assert_allclose(float(loss), float(g_loss), rtol=1e-5)

    # prototype softmax probs (process_inference_results.py:76-91)
    p = torch.vstack(list(proto.values()))
    p = p / p.norm(dim=1, keepdim=True)
    s = reps / reps.norm(dim=1, keepdim=True)
    g_probs = torch.exp(s @ p.T)
    g_probs = g_probs / g_probs.sum(dim=1, keepdim=True)
    probs = heads.prototype_probs(jnp.asarray(reps.numpy()), mat)
    np.testing.assert_allclose(np.asarray(probs), g_probs.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_classification_head_shapes():
    import jax
    cfg = dataclasses.replace(_cfg(modalities="RGB-Flow", nclasses=2),
                              data_type="raw")
    params = full_model_init(jax.random.key(0), cfg)
    rgb = jnp.ones((2, 3, 5, DIM))
    flow = jnp.ones((2, 3, 4, DIM))
    logits = classification_forward(params, cfg, rgb, None, flow, None)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_multi_task_linearB_routing():
    """Multi-task '+'-domain routing (prepare_model.py:406-416): primary
    rows use `linear`, others `linearB`."""
    import jax
    cfg = dataclasses.replace(_cfg(modalities="RGB"), multi_task=True)
    params = full_model_init(jax.random.key(5), cfg)
    rgb = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 1, 5, DIM)).astype(np.float32))
    mask = jnp.zeros((4, 1, 6), bool)
    primary = jnp.asarray([True, False, True, False])
    out = prototypes_forward(params, cfg, rgb, mask, primary_domain=primary)
    out_a = prototypes_forward(params, cfg, rgb, mask,
                               primary_domain=jnp.ones(4, bool))
    out_b = prototypes_forward(params, cfg, rgb, mask,
                               primary_domain=jnp.zeros(4, bool))
    np.testing.assert_allclose(np.asarray(out.video_rep[0]),
                               np.asarray(out_a.video_rep[0]))
    np.testing.assert_allclose(np.asarray(out.video_rep[1]),
                               np.asarray(out_b.video_rep[1]))
    assert not np.allclose(np.asarray(out_a.video_rep[1]),
                           np.asarray(out_b.video_rep[1]))


def test_prototypes_forward_flow_only_parity():
    """modalities='Flow' (prepare_model.py:318-329): the flow stream drives
    both the representation and the exported attention."""
    gen, sd, params = _sd_and_params(7)
    flow, flow_pad = _batch(gen, b=2, s=1, f=6)
    g_rep, _, g_attn, _ = golden_prototypes_forward(
        sd, flow, flow_pad, layers=LAYERS, heads=HEADS)
    cfg = _cfg(modalities="Flow")
    out = prototypes_forward(params, cfg, rgb=None, rgb_mask=None,
                             flow=jnp.asarray(flow.numpy()),
                             flow_mask=jnp.asarray(flow_pad.numpy()))
    np.testing.assert_allclose(np.asarray(out.video_rep), g_rep.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.attn), g_attn.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_no_self_attention_mean_pool_path():
    """cfg.self_attention=False (reference CLI without -sa): snippets become
    plain means over the PADDED frame axis — including zero pad rows, the
    reference's exact torch.mean(x, 2) quirk (prepare_model.py:296-301) —
    with no transformer, pos-emb or CLS, and a ones((1,1)) attention
    placeholder."""
    import dataclasses

    import jax

    from sais_tpu.config import ModelConfig
    from sais_tpu.models.full_model import (full_model_init,
                                            prototypes_forward,
                                            temporal_features)

    cfg = dataclasses.replace(ModelConfig(), rep_dim=16, proj_dim=8,
                              modalities="RGB", self_attention=False,
                              importance_head=True)
    params = full_model_init(jax.random.key(0), cfg)
    b, s, f, d = 3, 2, 5, 16
    reps = jax.random.normal(jax.random.key(1), (b, s, f, d))
    reps = reps.at[:, :, 3:].set(0.0)          # pad rows are zero
    mask = jnp.zeros((b, s, f + 1), bool).at[:, :, 4:].set(True)

    t = temporal_features(params, reps, mask, cfg)
    assert t.full_seq is None
    assert t.attn.shape == (1, 1) and float(t.attn[0, 0]) == 1.0
    # mean INCLUDES the zero pad rows (divides by full F)
    np.testing.assert_allclose(np.asarray(t.cls_seq),
                               np.asarray(reps).sum(2) / f, rtol=1e-6)

    out = prototypes_forward(params, cfg, rgb=reps, rgb_mask=mask)
    assert out.video_rep.shape == (b, 8)
    assert out.importances is None             # needs the transformer
    # downstream math matches the reference chain: mean over snippets ->
    # relu -> linear -> video rep
    pooled = np.asarray(reps).sum(2).mean(1) / f
    act = np.maximum(pooled, 0.0)
    expect = act @ np.asarray(params["linear"]["w"]) + np.asarray(
        params["linear"]["b"])
    np.testing.assert_allclose(np.asarray(out.video_rep), expect, rtol=1e-5,
                               atol=1e-6)


def test_prototypes_forward_multitask_params_mismatch_raises():
    """primary_domain against params initialized without multi_task must
    raise instead of silently routing every row through the primary head."""
    import jax
    import pytest

    cfg = _cfg(modalities="RGB")
    params = full_model_init(jax.random.key(5), cfg)
    params.pop("linearB", None)
    rgb = jnp.zeros((2, 3, 4, cfg.rep_dim))
    mask = jnp.zeros((2, 3, 5), bool)
    with pytest.raises(ValueError, match="linearB"):
        prototypes_forward(params, cfg, rgb, mask, None, None,
                           primary_domain=jnp.array([True, False]))


@pytest.mark.slow
def test_prototypes_forward_shape_fuzz_vs_torch():
    """Parity across random (batch, snippets, frames, pad lengths, seeds):
    the fixed-geometry tests above pin one shape; this sweeps the shape
    space the collator's buckets can produce, including minimum-length
    rows and frames == pos-table capacity."""
    rng = np.random.default_rng(9)
    for case in range(25):
        b = int(rng.integers(1, 5))
        s = int(rng.integers(1, 3))
        f = int(rng.integers(2, POS))          # pos table has POS slots
        seed = int(rng.integers(0, 1000))
        gen, sd, params = _sd_and_params(seed)
        x = torch.randn(b, s, f, DIM, generator=gen)
        lens = torch.randint(1, f + 1, (b,), generator=gen)
        pad = torch.zeros(b, s, f + 1, dtype=torch.bool)
        for i, ln in enumerate(lens):
            pad[i, :, ln + 1:] = True
        g_rep, g_logits, g_attn, g_imp = golden_prototypes_forward(
            sd, x, pad, None, None, layers=LAYERS, heads=HEADS,
            importance=True)
        cfg = _cfg(modalities="RGB", importance_head=True)
        out = prototypes_forward(params, cfg, jnp.asarray(x.numpy()),
                                 jnp.asarray(pad.numpy()))
        np.testing.assert_allclose(np.asarray(out.video_rep), g_rep.numpy(),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=f"case {case} b{b} s{s} f{f}")
        np.testing.assert_allclose(np.asarray(out.attn), g_attn.numpy(),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=f"case {case}")
        np.testing.assert_allclose(np.asarray(out.importances),
                                   g_imp.numpy(), rtol=5e-4, atol=1e-4,
                                   err_msg=f"case {case}")


def test_nce_loss_fuzz_vs_golden():
    """NCE loss + prototype softmax across random batch sizes, prototype
    counts, dims, and label patterns (incl. unmatched labels hitting the
    string-match column-0 quirk)."""
    rng = np.random.default_rng(21)
    for case in range(30):
        b = int(rng.integers(1, 12))
        k = int(rng.integers(2, 6))
        d = int(rng.choice([16, 32, 64]))
        gen = torch.Generator().manual_seed(case)
        reps = torch.randn(b, d, generator=gen)
        proto = {str(i): torch.rand(1, d, generator=gen) for i in range(k)}
        labels = [int(rng.integers(0, k + 2)) for _ in range(b)]  # some
        # labels beyond k-1 match no key -> column 0 (the quirk)
        keys, mat = prototypes_from_torch(proto)
        g_loss = golden_nce_loss(reps, torch.vstack(list(proto.values())),
                                 keys, labels)
        cols = heads.labels_to_prototype_columns(labels, keys)
        loss = heads.nce_loss(jnp.asarray(reps.numpy()), mat,
                              jnp.asarray(cols))
        np.testing.assert_allclose(float(loss), float(g_loss), rtol=1e-5,
                                   err_msg=f"case {case} b{b} k{k} d{d}")
        p = torch.vstack(list(proto.values()))
        p = p / p.norm(dim=1, keepdim=True)
        s = reps / reps.norm(dim=1, keepdim=True)
        g_probs = torch.exp(s @ p.T)
        g_probs = g_probs / g_probs.sum(dim=1, keepdim=True)
        probs = heads.prototype_probs(jnp.asarray(reps.numpy()), mat)
        np.testing.assert_allclose(np.asarray(probs), g_probs.numpy(),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"case {case}")
