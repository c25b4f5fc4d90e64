"""Sequence (context) parallelism: the ring-attention encoder over a mesh
'seq' axis must match the single-device dense encoder exactly (up to f32
reduction order), including the CLS-row attention export and gradients.

The reference has no sequence parallelism at all — long videos are
subsampled to a 2000-frame cap (prepare_dataset.py:2437, SURVEY.md §5.7);
this capability is TPU-native new ground, so the dense path is the oracle.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sais_tpu.config import ModelConfig, TemporalConfig
from sais_tpu.models.full_model import (full_model_init, prototypes_forward,
                                        temporal_features)
from sais_tpu.models.temporal import encoder_forward, encoder_init
from sais_tpu.parallel.sequence import (SEQ_AXIS, _ring_attention_local,
                                        encoder_forward_seq_parallel,
                                        seq_mesh,
                                        seq_parallel_prototypes_forward,
                                        seq_parallel_temporal_features)

DIM = 32


def _tcfg(layers=2):
    return TemporalConfig(rep_dim=DIM, num_layers=layers, num_heads=2,
                          ffn_dim=64, max_positions=64)


def _mcfg(**kw):
    kw.setdefault("modalities", "RGB")
    return ModelConfig(rep_dim=DIM, temporal=_tcfg(), **kw)


def _ragged_mask(rng, b, l):
    """(B, L) key-padding mask with ragged valid lengths; slot 0 (CLS)
    never padded, matching the collator convention."""
    mask = np.zeros((b, l), bool)
    for i in range(b):
        n = rng.integers(2, l + 1)
        mask[i, n:] = True
    return mask


def test_seq_mesh_layout():
    mesh = seq_mesh(8)
    assert mesh.axis_names == ("data", SEQ_AXIS)
    assert mesh.shape[SEQ_AXIS] == 8 and mesh.shape["data"] == 1
    mesh2 = seq_mesh(4, n_data=2)
    assert mesh2.shape == {"data": 2, SEQ_AXIS: 4}
    with pytest.raises(ValueError):
        seq_mesh(3)


@pytest.mark.parametrize("l", [pytest.param(24, marks=pytest.mark.slow),
                               37])  # divisible (slow tier) and ragged vs n=8
def test_ring_encoder_matches_dense(rng, l):
    cfg = _tcfg()
    params = encoder_init(jax.random.key(0), cfg)
    b = 3
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)

    dense_out, dense_attn = encoder_forward(params, x, cfg, mask)
    out, cls_row = encoder_forward_seq_parallel(params, x, cfg, mask, mesh)

    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=2e-5, rtol=2e-5)
    # dense attn is the full (B, L, L) head-averaged matrix; the ring
    # exports only the CLS-query row (row 0) — the artifact SAIS saves
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(dense_attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


def test_ring_encoder_no_mask_and_jit(rng):
    cfg = _tcfg(layers=1)
    params = encoder_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.normal(size=(2, 40, DIM)).astype(np.float32))
    mesh = seq_mesh(8)
    dense_out, dense_attn = encoder_forward(params, x, cfg, None)
    fn = jax.jit(functools.partial(encoder_forward_seq_parallel, cfg=cfg,
                                   mesh=mesh))
    out, cls_row = fn(params, x, key_padding_mask=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(dense_attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("l", [pytest.param(24, marks=pytest.mark.slow),
                               37])
def test_ring_flash_chunks_match_dense(rng, l):
    """chunk_flash=True runs each ring step through the fused Pallas flash
    forward and merges chunks by logsumexp — must match the dense encoder
    like the einsum form (CPU: interpret mode)."""
    cfg = _tcfg()
    params = encoder_init(jax.random.key(6), cfg)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)
    dense_out, dense_attn = encoder_forward(params, x, cfg, mask)
    out, cls_row = encoder_forward_seq_parallel(params, x, cfg, mask, mesh,
                                                chunk_flash=True,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(dense_attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_ring_flash_chunk_gradients_match_dense(rng):
    """The flash-chunk ring's custom VJP (a second ring over the Pallas
    flash backward kernels, dk/dv riding with each chunk) must give the
    same parameter gradients as the dense encoder (CPU: interpret mode)."""
    cfg = _tcfg(layers=2)
    params = encoder_init(jax.random.key(14), cfg)
    b, l = 2, 21
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)
    w = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))

    def loss_dense(p):
        out, _ = encoder_forward(p, x, cfg, mask)
        return jnp.sum(out * w)

    def loss_ring(p):
        out, _ = encoder_forward_seq_parallel(p, x, cfg, mask, mesh,
                                              chunk_flash=True,
                                              interpret=True)
        return jnp.sum(out * w)

    gd = jax.grad(loss_dense)(params)
    gr = jax.grad(loss_ring)(params)
    for a, b_ in zip(jax.tree.leaves(gd), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_ring_on_combined_data_seq_mesh(rng):
    """The encoder shards time over 'seq' while staying replicated over a
    coexisting 'data' axis (batch sharding composes outside)."""
    cfg = _tcfg(layers=1)
    params = encoder_init(jax.random.key(2), cfg)
    x = jnp.asarray(rng.normal(size=(2, 20, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, 2, 20))
    mesh = seq_mesh(4, n_data=2)
    dense_out, _ = encoder_forward(params, x, cfg, mask)
    out, _ = encoder_forward_seq_parallel(params, x, cfg, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_ring_gradients_match_dense(rng):
    """ppermute is linear, so autodiff through the ring is exact: encoder
    parameter gradients must match the dense path's."""
    cfg = _tcfg(layers=2)
    params = encoder_init(jax.random.key(3), cfg)
    b, l = 2, 21
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)
    w = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))

    def loss_dense(p):
        out, _ = encoder_forward(p, x, cfg, mask)
        return jnp.sum(out * w)

    def loss_ring(p):
        out, _ = encoder_forward_seq_parallel(p, x, cfg, mask, mesh)
        return jnp.sum(out * w)

    gd = jax.grad(loss_dense)(params)
    gr = jax.grad(loss_ring)(params)
    for a, b_ in zip(jax.tree.leaves(gd), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_ring_all_masked_row_is_zero(rng):
    """A globally all-masked batch row must return zeros (the flash
    kernel's convention, flash_attention.py:356-364), not an unmasked
    average."""
    mesh = seq_mesh(8)
    b, h, l, dh = 2, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, dh)).astype(np.float32))
    bias = jnp.zeros((b, l), jnp.float32).at[1].set(-1e30)

    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=SEQ_AXIS,
                          axis_size=8),
        mesh=mesh,
        in_specs=(P(None, None, SEQ_AXIS, None),
                  P(None, None, SEQ_AXIS, None),
                  P(None, None, SEQ_AXIS, None), P(None, SEQ_AXIS)),
        out_specs=P(None, None, SEQ_AXIS, None),
    )
    out = np.asarray(fn(q, k, v, bias))
    assert np.all(out[1] == 0.0)
    assert np.any(out[0] != 0.0)


@pytest.mark.slow
def test_seq_parallel_temporal_features_matches(rng):
    cfg = _mcfg()
    params = full_model_init(jax.random.key(4), cfg)
    b, s, f = 2, 2, 19
    reps = jnp.asarray(rng.normal(size=(b, s, f, DIM)).astype(np.float32))
    mask = np.zeros((b, s, f + 1), bool)
    for i in range(b):
        for j in range(s):
            n = rng.integers(3, f + 1)
            mask[i, j, n + 1:] = True
    mask = jnp.asarray(mask)
    mesh = seq_mesh(8)

    dense = temporal_features(params, reps, mask, cfg)
    sp = seq_parallel_temporal_features(params, reps, mask, cfg, mesh)
    np.testing.assert_allclose(np.asarray(sp.full_seq),
                               np.asarray(dense.full_seq),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sp.cls_seq),
                               np.asarray(dense.cls_seq),
                               atol=2e-5, rtol=2e-5)
    # dense attn: (B*S, F+1, F+1); seq-parallel exports the CLS row
    assert sp.attn.shape == (b * s, f + 1)
    np.testing.assert_allclose(np.asarray(sp.attn),
                               np.asarray(dense.attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_gesture_decoder_seq_parallel_matches_dense(rng):
    """Production wiring: GestureDecoder(seq_mesh=...) reproduces the dense
    decoder's ensembled window probabilities, and the attention artifact is
    the CLS row — the same contract as --flash on (the CLI exposes this as
    --seq-parallel N on decode/steps)."""
    from sais_tpu.config import PipelineConfig, WindowConfig
    from sais_tpu.infer.pipeline import GestureDecoder

    # 64-frame windows at stride 1 (full-length regime, scaled down)
    wcfg = WindowConfig(duration_s=3.2, hop_s=3.2, fps=20.0,
                        stride_divisor=4096, flow_jump_factor=15)
    assert wcfg.duration_frames == 64
    reps = rng.standard_normal((200, DIM)).astype(np.float32)
    params = full_model_init(jax.random.key(7), _mcfg())
    from sais_tpu.models.full_model import prototypes_init
    _, protos = prototypes_init(jax.random.key(8), 2)
    cfg = PipelineConfig(model=_mcfg(), window=wcfg)

    dense = GestureDecoder([(params, protos)], cfg, device_batch=4)
    sp = GestureDecoder([(params, protos)], cfg, device_batch=4,
                        seq_mesh=seq_mesh(8))
    p_dense = dense.window_probs("v", reps, None)
    p_sp = sp.window_probs("v", reps, None)
    np.testing.assert_allclose(p_sp, p_dense, rtol=5e-4, atol=5e-5)

    a_dense = dense.inference_artifacts("v", reps, None)
    a_sp = sp.inference_artifacts("v", reps, None)
    att_d, att_s = a_dense["attention"], a_sp["attention"]
    assert att_d.ndim == 3 and att_s.ndim == 2     # (W, L, L) vs (W, L)
    np.testing.assert_allclose(att_s, att_d[:, 0, :], rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_seq_parallel_inherits_multitask_guard(rng):
    """The seq twin delegates to prototypes_forward, so the dense path's
    params/config-mismatch guard (primary_domain without a linearB head)
    fires identically."""
    cfg = _mcfg()
    params = full_model_init(jax.random.key(9), cfg)   # no multi_task
    rgb = jnp.asarray(rng.normal(size=(2, 1, 7, DIM)).astype(np.float32))
    mask = jnp.zeros((2, 1, 8), bool)
    with pytest.raises(ValueError, match="linearB"):
        seq_parallel_prototypes_forward(
            params, cfg, rgb, mask, primary_domain=jnp.ones((2,), bool),
            mesh=seq_mesh(8))


def test_decoder_rejects_seq_mesh_with_flash_off(rng):
    """--flash off promises full (L, L) attention artifacts; combining it
    with --seq-parallel (CLS-row only) must fail loudly, not silently
    emit the wrong layout."""
    import dataclasses as dc

    from sais_tpu.config import PipelineConfig
    from sais_tpu.infer.pipeline import GestureDecoder
    from sais_tpu.models.full_model import prototypes_init

    m = _mcfg()
    m = dc.replace(m, temporal=dc.replace(m.temporal, use_flash=False))
    cfg = dc.replace(PipelineConfig(), model=m)
    params = full_model_init(jax.random.key(10), m)
    _, protos = prototypes_init(jax.random.key(11), 2)
    with pytest.raises(ValueError, match="flash off"):
        GestureDecoder([(params, protos)], cfg, seq_mesh=seq_mesh(8))


@pytest.mark.slow
def test_seq_parallel_training_matches_dense(rng):
    """PrototypeTrainer(seq_mesh=...) trains through the ring: losses over
    several SGD steps match the dense trainer's (the ring VJP is exact)."""
    from sais_tpu.config import TrainConfig
    from sais_tpu.models.full_model import prototypes_init
    from sais_tpu.train.loop import PrototypeTrainer

    cfg = _mcfg()
    params = jax.tree.map(np.asarray, full_model_init(jax.random.key(12), cfg))
    keys, protos = prototypes_init(jax.random.key(13), 2)
    protos = np.asarray(protos)

    def batches():
        out = []
        for i in range(3):
            r = np.random.default_rng(i)
            out.append({
                "rgb": r.normal(size=(4, 1, 11, DIM)).astype(np.float32),
                "rgb_mask": np.zeros((4, 1, 12), bool),
                "label_cols": (np.arange(4) % 2).astype(np.int32),
            })
        return out

    dense = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                             jax.tree.map(np.copy, params), keys,
                             jnp.asarray(protos))
    ring = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                            jax.tree.map(np.copy, params), keys,
                            jnp.asarray(protos), seq_mesh=seq_mesh(8))
    for _ in range(2):
        ld, _ = dense.run_epoch(iter(batches()), train=True)
        lr_, _ = ring.run_epoch(iter(batches()), train=True)
        np.testing.assert_allclose(lr_, ld, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="either mesh"):
        PrototypeTrainer(cfg, TrainConfig(lr=0.1), params, keys,
                         jnp.asarray(protos), mesh=seq_mesh(8),
                         seq_mesh=seq_mesh(8))


@pytest.mark.slow
@pytest.mark.parametrize("n_seq,n_data", [(4, 2), (2, 4)])
def test_seq_x_data_training_matches_dense(rng, n_seq, n_data):
    """seq x data COMPOSITION at the trainer level (VERDICT r3 #1): a
    seq_mesh(n_seq, n_data>1) trainer shards batches over 'data' AND each
    window's time axis over 'seq' — losses across SGD steps must match the
    dense single-device trainer both as 2x4 and 4x2 on the 8-device mesh,
    and the device batch must REALLY be data-sharded (not replicated)."""
    from jax.sharding import PartitionSpec as P

    from sais_tpu.config import TrainConfig
    from sais_tpu.models.full_model import prototypes_init
    from sais_tpu.train.loop import PrototypeTrainer

    cfg = _mcfg()
    params = jax.tree.map(np.asarray, full_model_init(jax.random.key(20), cfg))
    keys, protos = prototypes_init(jax.random.key(21), 2)
    protos = np.asarray(protos)

    def batches():
        out = []
        for i in range(3):
            r = np.random.default_rng(100 + i)
            mask = np.zeros((4, 1, 12), bool)
            mask[0, 0, 9:] = True  # one ragged row crosses seq shards
            out.append({
                "rgb": r.normal(size=(4, 1, 11, DIM)).astype(np.float32),
                "rgb_mask": mask,
                "label_cols": (np.arange(4) % 2).astype(np.int32),
            })
        return out

    dense = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                             jax.tree.map(np.copy, params), keys,
                             jnp.asarray(protos))
    comp = PrototypeTrainer(cfg, TrainConfig(lr=0.1),
                            jax.tree.map(np.copy, params), keys,
                            jnp.asarray(protos),
                            seq_mesh=seq_mesh(n_seq, n_data=n_data))

    dev = comp._device_batch(batches()[0])
    assert dev["rgb"].sharding.spec == P("data"), dev["rgb"].sharding

    for _ in range(2):
        ld, md = dense.run_epoch(iter(batches()), train=True)
        lc, mc = comp.run_epoch(iter(batches()), train=True)
        np.testing.assert_allclose(lc, ld, rtol=1e-4, atol=1e-5)
    assert mc.keys() == md.keys()


@pytest.mark.slow
def test_seq_parallel_prototypes_forward_matches(rng):
    cfg = _mcfg(modalities="RGB-Flow", importance_head=True)
    params = full_model_init(jax.random.key(5), cfg)
    b, s, f = 2, 1, 26
    rgb = jnp.asarray(rng.normal(size=(b, s, f, DIM)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(b, s, 9, DIM)).astype(np.float32))
    rgb_mask = jnp.asarray(_ragged_mask(rng, b, f + 1)[:, None, :])
    flow_mask = jnp.asarray(_ragged_mask(rng, b, 10)[:, None, :])
    mesh = seq_mesh(8)

    dense = prototypes_forward(params, cfg, rgb, rgb_mask, flow, flow_mask)
    sp = seq_parallel_prototypes_forward(params, cfg, rgb, rgb_mask, flow,
                                         flow_mask, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sp.video_rep),
                               np.asarray(dense.video_rep),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sp.aux_logits),
                               np.asarray(dense.aux_logits),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sp.importances),
                               np.asarray(dense.importances),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(sp.attn),
                               np.asarray(dense.attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


def test_ring_beyond_vmem_local_chunk_matches_dense(rng, monkeypatch):
    """When a device's LOCAL shard exceeds the plain flash kernels' VMEM
    working set, each ring step must switch to the chunked core
    (_ring_local_chunk) — values AND gradients stay equal to the dense
    encoder.  The chunk threshold is forced so the chunked path engages
    at test scale (the real trigger is an 8k-token f32 shard on v5e,
    where the un-chunked ring OOMs scoped vmem by 1.5 MB)."""
    from sais_tpu.parallel import sequence as seq

    monkeypatch.setattr(seq, "_ring_local_chunk",
                        lambda lp, dhp, itemsize, blk: blk)
    cfg = _tcfg(layers=1)
    params = encoder_init(jax.random.key(21), cfg)
    b, l = 2, 40
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)

    dense_out, dense_attn = encoder_forward(params, x, cfg, mask)
    out, cls_row = encoder_forward_seq_parallel(params, x, cfg, mask, mesh,
                                                chunk_flash=True,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(dense_attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.slow
def test_ring_beyond_vmem_local_chunk_gradients_match_dense(rng,
                                                            monkeypatch):
    """Gradient half of the forced-chunk ring test (slow tier: the
    interpret-mode flash backward over an 8-way mesh dominates its
    runtime; the forward/CLS parity above stays in the fast tier)."""
    from sais_tpu.parallel import sequence as seq

    monkeypatch.setattr(seq, "_ring_local_chunk",
                        lambda lp, dhp, itemsize, blk: blk)
    cfg = _tcfg(layers=1)
    params = encoder_init(jax.random.key(21), cfg)
    b, l = 2, 40
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(8)
    w = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))

    def loss_ring(p):
        o, _ = encoder_forward_seq_parallel(p, x, cfg, mask, mesh,
                                            chunk_flash=True,
                                            interpret=True)
        return jnp.sum(o * w)

    def loss_dense(p):
        o, _ = encoder_forward(p, x, cfg, mask)
        return jnp.sum(o * w)

    gd = jax.grad(loss_dense)(params)
    gr = jax.grad(loss_ring)(params)
    for a, b_ in zip(jax.tree.leaves(gd), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_ring_multi_slice_local_chunk_matches_dense(rng):
    """True multi-slice regime: Lloc=600 pads to 1024 with blk=512, and
    the real _vmem_chunk_tokens threshold (forced via a 512-token budget)
    splits each visiting chunk into two slices inside every ring step.
    Values and the CLS row must still match dense."""
    from sais_tpu.parallel import sequence as seq

    orig = seq._ring_local_chunk
    cfg = _tcfg(layers=1)
    params = encoder_init(jax.random.key(22), cfg)
    b, l = 1, 1200
    x = jnp.asarray(rng.normal(size=(b, l, DIM)).astype(np.float32))
    mask = jnp.asarray(_ragged_mask(rng, b, l))
    mesh = seq_mesh(2, devices=jax.devices()[:2])  # Lloc=600 -> lp=1024, blk=512
    assert orig(1024, 128, 4, 512) in (0, 512)  # documents the real curve
    import sais_tpu.parallel.sequence as seqmod
    try:
        seqmod._ring_local_chunk = lambda lp, dhp, itemsize, blk: (
            blk if lp > blk else 0)
        dense_out, dense_attn = encoder_forward(params, x, cfg, mask)
        out, cls_row = encoder_forward_seq_parallel(params, x, cfg, mask,
                                                    mesh, chunk_flash=True,
                                                    interpret=True)
    finally:
        seqmod._ring_local_chunk = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_out),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(cls_row),
                               np.asarray(dense_attn[:, 0, :]),
                               atol=1e-6, rtol=1e-5)
