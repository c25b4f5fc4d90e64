"""Parity against the ACTUAL reference modules (not hand-written oracles).

Two layers of defense against transcription drift:

1. The real `/root/reference/SAIS/scripts/dino-main/vision_transformer.py`
   is imported and used directly as the ViT oracle — a bug in our
   hand-rolled tests/golden/torch_vit.py can no longer mask a mismatch.
2. A full-pipeline golden: synthetic frames -> reference-ViT reps (torch)
   -> reference window/TTA/prototype/post-processing math (transcribed
   line-by-line from prepare_dataset.py:2642-2670 and
   process_inference_results.py:76-197,218-258) -> gesture CSV, compared
   against `GestureDecoder.decode` at the BASELINE.json acceptance
   tolerance (<=1e-3).  This test fails if ANY stage drifts.

(prepare_model.py / RAFT cannot be imported here — they require timm /
ptlflow which are not installed — so the temporal model keeps its
hand-written oracle, itself verified against torch's real
F.multi_head_attention_forward in tests/golden/torch_temporal.py.)
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sais_tpu.config import ModelConfig, PipelineConfig, ViTConfig
from sais_tpu.infer.pipeline import GestureDecoder
from sais_tpu.models.vit import vit_forward
from sais_tpu.ops.preprocess import preprocess_reference_host
from sais_tpu.port.torch_port import (full_model_params_from_torch,
                                      vit_params_from_torch)
from tests.golden.torch_temporal import (golden_prototypes_forward,
                                         random_full_model_state_dict)

pytestmark = pytest.mark.slow

REF_DINO = "/root/reference/SAIS/scripts/dino-main"


@pytest.fixture(scope="module")
def ref_vits():
    if not os.path.isdir(REF_DINO):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_DINO)
    try:
        import vision_transformer as vits
    finally:
        sys.path.remove(REF_DINO)
    return vits


def _small_ref_vit(ref_vits, seed=0):
    torch.manual_seed(seed)
    m = ref_vits.VisionTransformer(
        img_size=[224], patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
    m.eval()
    return m


def test_vit_cls_matches_real_reference_module(ref_vits):
    """CLS features from the imported reference VisionTransformer
    (vision_transformer.py:209-214) vs our JAX ViT via the weight port."""
    m = _small_ref_vit(ref_vits)
    gen = torch.Generator().manual_seed(1)
    imgs = torch.randn(4, 3, 224, 224, generator=gen)
    with torch.no_grad():
        ref = m(imgs)

    cfg = ViTConfig(image_size=224, patch_size=16, embed_dim=192, depth=4,
                    num_heads=3)
    params = vit_params_from_torch(m.state_dict())
    ours, _ = vit_forward(params,
                          jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)),
                          cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_vit_attention_matches_real_reference_module(ref_vits):
    """get_last_selfattention (vision_transformer.py:216-223) parity."""
    m = _small_ref_vit(ref_vits, seed=2)
    gen = torch.Generator().manual_seed(3)
    imgs = torch.randn(2, 3, 224, 224, generator=gen)
    with torch.no_grad():
        ref_attn = m.get_last_selfattention(imgs)

    cfg = ViTConfig(image_size=224, patch_size=16, embed_dim=192, depth=4,
                    num_heads=3)
    params = vit_params_from_torch(m.state_dict())
    _, attn = vit_forward(params,
                          jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)),
                          cfg, return_last_attention=True)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_intermediate_layers_match_real_reference_module(ref_vits):
    """get_intermediate_layers(x, n) (vision_transformer.py:224-232) and
    the eval_linear probe-feature construction (eval_linear.py:166-170):
    n-last-blocks CLS concat, plus the n=1 avgpool interleave."""
    import torch as _t
    m = _small_ref_vit(ref_vits, seed=6)
    gen = _t.Generator().manual_seed(7)
    imgs = _t.randn(2, 3, 224, 224, generator=gen)
    with _t.no_grad():
        ref_layers = m.get_intermediate_layers(imgs, n=3)

    from sais_tpu.eval.probes import eval_linear_features
    from sais_tpu.models.vit import vit_intermediate_layers
    cfg = ViTConfig(image_size=224, patch_size=16, embed_dim=192, depth=4,
                    num_heads=3)
    params = vit_params_from_torch(m.state_dict())
    x = jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1))
    ours = vit_intermediate_layers(params, x, cfg, n=3)
    assert len(ours) == len(ref_layers) == 3
    for o, r in zip(ours, ref_layers):
        np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                   rtol=1e-3, atol=1e-4)

    # eval_linear ViT-S protocol: CLS of n last blocks concatenated
    ref_feat = _t.cat([t[:, 0] for t in ref_layers], dim=-1)
    np.testing.assert_allclose(np.asarray(eval_linear_features(ours)),
                               ref_feat.numpy(), rtol=1e-3, atol=1e-4)

    # ViT-B protocol (n=1 + avgpool): interleaved cls/avg reshape quirk
    with _t.no_grad():
        last = m.get_intermediate_layers(imgs, n=1)
    ref1 = _t.cat([t[:, 0] for t in last], dim=-1)
    ref1 = _t.cat((ref1.unsqueeze(-1),
                   _t.mean(last[-1][:, 1:], dim=1).unsqueeze(-1)), dim=-1)
    ref1 = ref1.reshape(ref1.shape[0], -1)
    ours1 = vit_intermediate_layers(params, x, cfg, n=1)
    np.testing.assert_allclose(
        np.asarray(eval_linear_features(ours1, avgpool=True)),
        ref1.numpy(), rtol=1e-3, atol=1e-4)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        eval_linear_features(ours, avgpool=True)   # n>1 + avgpool = invalid


def test_vit_s16_full_size_against_reference_module(ref_vits):
    """Full production geometry (vit_small: 384/12/6,
    vision_transformer.py:243-247) against the real module."""
    torch.manual_seed(4)
    m = ref_vits.vit_small(patch_size=16)
    m.eval()
    gen = torch.Generator().manual_seed(5)
    imgs = torch.randn(2, 3, 224, 224, generator=gen)
    with torch.no_grad():
        ref = m(imgs)
    params = vit_params_from_torch(m.state_dict())
    ours, _ = vit_forward(params,
                          jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)),
                          ViTConfig())
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Full-pipeline golden
# ---------------------------------------------------------------------------

def _reference_preprocess(frames_u8: np.ndarray) -> torch.Tensor:
    """SurgDataset.__getitem__ + prepareDataloader transform
    (main_dino.py:295-302, extract_representations.py:145-162): PIL
    CenterCrop(0.8H, 0.8W) -> Resize (224,224) BILINEAR -> ToTensor ->
    ImageNet Normalize.  Written with PIL directly (torchvision's
    implementations delegate to these exact PIL calls)."""
    from PIL import Image
    mean = np.array((0.485, 0.456, 0.406), np.float32)
    std = np.array((0.229, 0.224, 0.225), np.float32)
    out = []
    for frame in frames_u8:
        img = Image.fromarray(frame)
        w, h = img.size
        ch, cw = 0.8 * h, 0.8 * w
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
        img = img.crop((left, top, int(left + cw), int(top + ch)))
        img = img.resize((224, 224), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        out.append((x - mean) / std)
    arr = np.stack(out).transpose(0, 3, 1, 2)
    return torch.from_numpy(np.ascontiguousarray(arr))


def _reference_window_indices(total_frames: int):
    """Custom_inference manifest + per-window TTA frame indices, transcribed
    from prepare_dataset.py:1711-1726 (windows) and :2642-2656 (indices)."""
    duration_frames, hop_frames = 15, 15
    nsamples = (total_frames - duration_frames) // hop_frames + 1
    startframes = [n * hop_frames for n in range(nsamples)]
    endframes = [s + duration_frames for s in startframes]
    all_indices = []
    for s, e in zip(startframes, endframes):
        startIdx, endIdx = s - 1, e - 1
        jump_size = (endIdx - startIdx) // 10
        indices = list(np.arange(startIdx, endIdx, jump_size))
        indices2 = list(np.arange(startIdx + 3, endIdx, jump_size))
        indices3 = list(np.arange(startIdx + 6, endIdx, jump_size))
        all_indices.append((indices, indices2, indices3))
    return startframes, endframes, all_indices


def _reference_probs(reps: torch.Tensor, pros: torch.Tensor) -> np.ndarray:
    """calcProbs (process_inference_results.py:76-91)."""
    norm = torch.norm(pros, dim=1).unsqueeze(1).repeat(1, pros.shape[1])
    p_norm = pros / norm
    norm = torch.norm(reps, dim=1).unsqueeze(1).repeat(1, reps.shape[1])
    s_norm = reps / norm
    sim = torch.matmul(s_norm, p_norm.T)
    sim_exp = torch.exp(sim)
    probs = sim_exp / torch.sum(sim_exp, 1).unsqueeze(1).repeat(
        1, sim_exp.shape[1])
    return probs.numpy()


def _reference_group_intervals(index_list, seconds):
    """groupPredictionIntervals (process_inference_results.py:139-169)."""
    curr_index = list(index_list)
    cumCount = 0
    startIndices, endIndices = [], []
    if len(curr_index) == 1:
        return [curr_index[0]], [curr_index[0]]
    startIdx = curr_index[0]
    prevIdx = startIdx
    for index in curr_index[1:]:
        if index - prevIdx > seconds:
            startIndices.append(startIdx)
            endIndices.append(prevIdx)
            startIdx = index
            cumCount = 0
        if index == curr_index[-1]:
            if cumCount == 0:
                startIndices.append(index)
                endIndices.append(index)
            else:
                startIndices.append(startIdx)
                endIndices.append(index)
        cumCount += 1
        prevIdx = index
    return startIndices, endIndices


def _reference_postprocess(mean_probs: np.ndarray, startframes, endframes,
                           gestures=("in-view", "out-of-view"),
                           threshold=0.515, entropy_max=0.66, seconds=3):
    """__main__ post-processing (process_inference_results.py:218-258):
    threshold preds + entropy filter per gesture, interval grouping,
    per-interval prob mean + argmax re-prediction."""
    mapping = dict(zip(np.arange(len(gestures)), sorted(gestures)))
    entropy = -np.sum(mean_probs * np.log(mean_probs), axis=1)
    pred_idx = (mean_probs[:, -1] > threshold).astype(int)
    preds = np.array([mapping[i] for i in pred_idx])
    rows = []
    for gesture in sorted(gestures):
        keep = np.nonzero((preds == gesture) & (entropy <= entropy_max))[0]
        if len(keep) == 0:
            continue
        sIdx, eIdx = _reference_group_intervals(list(keep), seconds)
        for s_i, e_i in zip(sIdx, eIdx):
            members = keep[(keep >= s_i) & (keep <= e_i)]  # .loc[s:e] rows
            p = mean_probs[members].mean(axis=0)
            rows.append({
                "Gesture": gesture,
                "StartFrame": int(startframes[s_i]),
                "EndFrame": int(endframes[e_i]),
                "probs": p,
                "pred": mapping[int(np.argmax(p))],   # getPreds threshold=None
            })
    return rows


def test_full_pipeline_golden_csv():
    """North-star acceptance (BASELINE.json): synthetic video decoded by our
    pipeline matches the reference recipe end-to-end at <=1e-3."""
    # --- synthetic video frames (deterministic, structured) ---------------
    rng = np.random.default_rng(7)
    nframes = 45
    frames = rng.integers(0, 255, (nframes, 48, 64, 3), dtype=np.uint8)
    for i in range(nframes):
        frames[i, :, : (i * 64 // nframes)] = (220, 30, 30)

    # --- ORACLE: reference preprocessing + real reference ViT -------------
    sys.path.insert(0, REF_DINO)
    try:
        import vision_transformer as vits
    finally:
        sys.path.remove(REF_DINO)
    torch.manual_seed(10)
    vit = vits.VisionTransformer(
        img_size=[224], patch_size=16, embed_dim=192, depth=4, num_heads=3,
        mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
    vit.eval()
    pre = _reference_preprocess(frames)
    with torch.no_grad():
        ref_reps = vit(pre)                                   # (45, 192)

    # --- ORACLE: windows + TTA + temporal model + prototypes --------------
    startframes, endframes, tta_indices = _reference_window_indices(nframes)
    gen = torch.Generator().manual_seed(11)
    sd = random_full_model_state_dict(gen, dim=192, proj=64, ffn=256,
                                      layers=2, pos_slots=16)
    reps_np = ref_reps.numpy()
    per_augment_video_reps = [[], [], []]
    for indices in tta_indices:                                # per window
        for a, idx in enumerate(indices):
            snip = torch.from_numpy(reps_np[np.asarray(idx)]).unsqueeze(0)
            pad = torch.zeros(1, 1, snip.shape[1] + 1, dtype=torch.bool)
            video_rep, _, _, _ = golden_prototypes_forward(
                sd, snip.unsqueeze(0), pad, layers=2, heads=4)
            per_augment_video_reps[a].append(video_rep[0])

    # prototypes engineered to produce confident predictions (so the
    # entropy filter keeps rows and the interval logic is exercised)
    first = per_augment_video_reps[0][0]
    pros = torch.stack([first, -first])                        # in/out-of-view
    per_augment_probs = [
        _reference_probs(torch.stack(v), pros)
        for v in per_augment_video_reps
    ]
    mean_probs = np.mean(np.stack(per_augment_probs), axis=0)  # TTA mean :218
    oracle_rows = _reference_postprocess(mean_probs, startframes, endframes)
    assert oracle_rows, "oracle produced no intervals — test misconfigured"

    # --- OURS: same weights through the TPU-native pipeline ---------------
    import dataclasses
    from sais_tpu.config import TemporalConfig
    cfg = PipelineConfig(
        vit=ViTConfig(image_size=224, patch_size=16, embed_dim=192, depth=4,
                      num_heads=3),
        model=ModelConfig(rep_dim=192, modalities="RGB",
                          temporal=TemporalConfig(rep_dim=192, num_layers=2,
                                                  num_heads=4, ffn_dim=256,
                                                  max_positions=16)),
        compute_dtype="float32")

    # the production parity path: FeatureExtractor in exact_preprocess mode
    # (host PIL preprocessing, bit-identical with the torchvision stack)
    from sais_tpu.infer.pipeline import FeatureExtractor
    fx = FeatureExtractor(vit_params_from_torch(vit.state_dict()), cfg,
                          batch_size=16, exact_preprocess=True)
    ours_reps = fx.extract_array(frames)
    # stage gate: feature parity (identical PIL preprocessing both sides)
    np.testing.assert_allclose(ours_reps, reps_np, rtol=1e-3, atol=1e-4)
    # the DEFAULT device path now resamples bit-exactly like PIL
    # (ops/preprocess.resize_pil_exact) — same features WITHOUT host PIL
    fx_fast = FeatureExtractor(vit_params_from_torch(vit.state_dict()), cfg,
                               batch_size=16, use_native_decode=False)
    fast_reps = fx_fast.extract_array(frames)
    np.testing.assert_allclose(fast_reps, ours_reps, atol=2e-5)
    # sanity: direct forward over host-preprocessed frames agrees
    host = preprocess_reference_host(frames, cfg.preprocess)
    direct, _ = vit_forward(vit_params_from_torch(vit.state_dict()),
                            jnp.asarray(host), cfg.vit)
    np.testing.assert_allclose(ours_reps, np.asarray(direct), atol=1e-5)

    params = full_model_params_from_torch(sd, num_layers=2)
    dec = GestureDecoder([(params, jnp.asarray(pros.numpy()))], cfg,
                         device_batch=4)
    df = dec.decode("vid", ours_reps, None)

    # --- CSV parity --------------------------------------------------------
    assert len(df) == len(oracle_rows), (len(df), oracle_rows)
    df = df.sort_values(["Gesture", "StartFrame"]).reset_index(drop=True)
    oracle_rows = sorted(oracle_rows,
                         key=lambda r: (r["Gesture"], r["StartFrame"]))
    for i, row in enumerate(oracle_rows):
        got = df.iloc[i]
        assert got["Gesture"] == row["Gesture"]
        assert int(got["StartFrame"]) == row["StartFrame"]
        assert int(got["EndFrame"]) == row["EndFrame"]
        assert got["pred"] == row["pred"]
        np.testing.assert_allclose(
            np.asarray([got[c] for c in range(2)], np.float64),
            row["probs"], atol=1e-3)


def test_vit_geometry_fuzz_vs_real_reference_module(ref_vits):
    """Weight-port + forward parity across random ViT geometries (patch
    size, depth, heads, width, input resolution incl. non-train sizes
    that trigger the bicubic pos-embed interpolation) — the fixed tests
    above pin two geometries; hubconf's zoo spans many."""
    rng = np.random.default_rng(17)
    for case in range(8):
        heads = int(rng.choice([2, 3, 4]))
        dim = heads * int(rng.choice([32, 64]))
        depth = int(rng.integers(1, 5))
        patch = int(rng.choice([8, 16]))
        train_size = 224
        in_size = int(rng.choice([train_size, 96, 160]))
        if in_size % patch:
            in_size = (in_size // patch) * patch
        torch.manual_seed(100 + case)
        m = ref_vits.VisionTransformer(
            img_size=[train_size], patch_size=patch, embed_dim=dim,
            depth=depth, num_heads=heads, mlp_ratio=4, qkv_bias=True,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
        m.eval()
        gen = torch.Generator().manual_seed(case)
        imgs = torch.randn(2, 3, in_size, in_size, generator=gen)
        with torch.no_grad():
            ref = m(imgs)
        cfg = ViTConfig(image_size=train_size, patch_size=patch,
                        embed_dim=dim, depth=depth, num_heads=heads)
        params = vit_params_from_torch(m.state_dict())
        ours, _ = vit_forward(
            params, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)), cfg)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=2e-3, atol=2e-4,
            err_msg=f"case {case}: p{patch} d{depth} h{heads} "
                    f"dim{dim} in{in_size}")
