"""Golden functional PyTorch implementation of the SAIS temporal model.

Consumes a state_dict in the reference fullModel naming (prepare_model.py)
and reproduces the forward semantics of the hand-patched torch 1.8
TransformerEncoder (returns last layer's head-averaged attention) plus the
Prototypes / importance / MIL heads.  Used only as a numerical oracle.
"""

import torch
import torch.nn.functional as F


def random_full_model_state_dict(gen, dim=384, proj=256, ffn=2048, layers=4,
                                 pos_slots=64, n_att_classes=3,
                                 importance=True):
    def r(*shape):
        return 0.05 * torch.randn(*shape, generator=gen)

    sd = {
        "frame_cls": torch.rand(1, dim, generator=gen),
        "clip_cls": torch.rand(1, dim, generator=gen),
        "linear.weight": r(proj, dim), "linear.bias": r(proj),
        "linear2.weight": r(n_att_classes, proj),
        "linear2.bias": r(n_att_classes),
        "attentionA.weight": r(proj, dim), "attentionA.bias": r(proj),
        "attentionB.weight": r(proj, dim), "attentionB.bias": r(proj),
    }
    for i in range(pos_slots):
        sd[f"frame_pos_embeddings.{i}"] = torch.rand(1, dim, generator=gen)
        sd[f"clip_pos_embeddings.{i}"] = torch.rand(1, dim, generator=gen)
    for enc in ("transEncoderFrame", "transEncoderClip"):
        for i in range(layers):
            p = f"{enc}.layers.{i}."
            sd.update({
                p + "self_attn.in_proj_weight": r(3 * dim, dim),
                p + "self_attn.in_proj_bias": r(3 * dim),
                p + "self_attn.out_proj.weight": r(dim, dim),
                p + "self_attn.out_proj.bias": r(dim),
                p + "linear1.weight": r(ffn, dim), p + "linear1.bias": r(ffn),
                p + "linear2.weight": r(dim, ffn), p + "linear2.bias": r(dim),
                p + "norm1.weight": 1 + 0.1 * r(dim), p + "norm1.bias": 0.1 * r(dim),
                p + "norm2.weight": 1 + 0.1 * r(dim), p + "norm2.bias": 0.1 * r(dim),
            })
    for c in range(n_att_classes):
        sd[f"attentionModules.{c}.weight"] = r(1, proj)
        sd[f"attentionModules.{c}.bias"] = r(1)
        sd[f"finalModules.{c}.weight"] = r(1, dim)
        sd[f"finalModules.{c}.bias"] = r(1)
    if importance:
        sd["importance_function.weight"] = r(1, dim)
        sd["importance_function.bias"] = r(1)
    return sd


@torch.no_grad()
def golden_encoder(sd, prefix, src, key_padding_mask=None, layers=4, heads=4,
                   eps=1e-5):
    """Patched torch-1.8 TransformerEncoder: post-norm layers, returns
    (output, last layer's head-averaged attn).  src: (L, N, E)."""
    dim = src.shape[-1]
    attn = None
    for i in range(layers):
        p = f"{prefix}.layers.{i}."
        src2, attn = F.multi_head_attention_forward(
            src, src, src, dim, heads,
            sd[p + "self_attn.in_proj_weight"], sd[p + "self_attn.in_proj_bias"],
            None, None, False, 0.0,
            sd[p + "self_attn.out_proj.weight"], sd[p + "self_attn.out_proj.bias"],
            training=False, key_padding_mask=key_padding_mask,
            need_weights=True, average_attn_weights=True)
        src = F.layer_norm(src + src2, (dim,), sd[p + "norm1.weight"],
                           sd[p + "norm1.bias"], eps)
        h = F.relu(F.linear(src, sd[p + "linear1.weight"], sd[p + "linear1.bias"]))
        h = F.linear(h, sd[p + "linear2.weight"], sd[p + "linear2.bias"])
        src = F.layer_norm(src + h, (dim,), sd[p + "norm2.weight"],
                           sd[p + "norm2.bias"], eps)
    return src, attn


@torch.no_grad()
def golden_temporal_features(sd, x, pad, layers=4, heads=4):
    """prepareInputForTransformer + aggregateInputs (prepare_model.py:179-221).

    x: (B, S, F, D); pad: (B, S, F+1) bool True=pad.
    Returns (full_seq (B,S,F+1,D), cls_seq (B,S,D), attn (B*S,F+1,F+1)).
    """
    b, s, f, d = x.shape
    pos = torch.vstack([sd[f"frame_pos_embeddings.{i}"] for i in range(f)])
    x = x + pos.view(1, 1, f, d)
    cls = sd["frame_cls"].expand(b, s, 1, -1)
    x = torch.cat([cls, x], dim=2)
    src = x.reshape(b * s, f + 1, d).permute(1, 0, 2)
    out, attn = golden_encoder(sd, "transEncoderFrame", src,
                               key_padding_mask=pad.reshape(b * s, f + 1),
                               layers=layers, heads=heads)
    out = F.relu(out).permute(1, 0, 2).reshape(b, s, f + 1, d)
    return out, out[:, :, 0, :], attn


@torch.no_grad()
def golden_prototypes_forward(sd, rgb, rgb_pad, flow=None, flow_pad=None,
                              layers=4, heads=4, importance=False):
    """Prototypes-task forward (prepare_model.py:304-421)."""
    full_seq, cls_seq, attn = golden_temporal_features(sd, rgb, rgb_pad,
                                                       layers, heads)
    pooled = cls_seq.mean(dim=1)
    if flow is not None:
        _, fcls, _ = golden_temporal_features(sd, flow, flow_pad, layers, heads)
        pooled = pooled + fcls.mean(dim=1)
    video_rep = F.linear(F.relu(pooled), sd["linear.weight"], sd["linear.bias"])
    logits = F.linear(F.relu(video_rep), sd["linear2.weight"], sd["linear2.bias"])
    imps = None
    if importance:
        imps = F.linear(full_seq, sd["importance_function.weight"],
                        sd["importance_function.bias"])
    return video_rep, logits, attn, imps


@torch.no_grad()
def golden_mil_forward(sd, rgb, rgb_pad, nclasses, layers=4, heads=4):
    """MIL pathway: frame encoder -> getClipReps -> MIL_Head
    (prepare_model.py:359-363, 452-488)."""
    _, cls_seq, _ = golden_temporal_features(sd, rgb, rgb_pad, layers, heads)
    b, s, d = cls_seq.shape
    pos = torch.vstack([sd[f"clip_pos_embeddings.{i}"] for i in range(s)])
    x = (cls_seq + pos.view(1, s, d)).permute(1, 0, 2)
    out, _ = golden_encoder(sd, "transEncoderClip", x, None, layers, heads)
    snip_reps = F.relu(out).permute(1, 0, 2)

    scores, attention = [], {}
    # attentionA/B are shared across classes: loop-invariant
    a = torch.tanh(F.linear(snip_reps, sd["attentionA.weight"],
                            sd["attentionA.bias"]))
    g = torch.sigmoid(F.linear(snip_reps, sd["attentionB.weight"],
                               sd["attentionB.bias"]))
    for c in range(nclasses):
        w = F.linear(a * g, sd[f"attentionModules.{c}.weight"],
                     sd[f"attentionModules.{c}.bias"])
        w = torch.softmax(w, dim=1).squeeze(-1)
        video_rep = torch.bmm(w.unsqueeze(1), snip_reps)
        score = F.linear(video_rep, sd[f"finalModules.{c}.weight"],
                         sd[f"finalModules.{c}.bias"])
        scores.append(score.squeeze(-1))
        attention[c] = w
    return torch.cat(scores, dim=1), attention


@torch.no_grad()
def golden_nce_loss(video_reps, proto_mat, proto_keys, labels):
    """Reference NCE loss (prepare_miscellaneous.py:14-46) with the string
    label->column matching quirk."""
    import numpy as np
    p = proto_mat / proto_mat.norm(dim=1, keepdim=True)
    s = video_reps / video_reps.norm(dim=1, keepdim=True)
    sim_exp = torch.exp(s @ p.T)
    p_labels = np.repeat(np.expand_dims(np.array(proto_keys), 0),
                         video_reps.shape[0], axis=0)
    s_labels = np.repeat(np.expand_dims(np.array([str(l) for l in labels]), 1),
                         proto_mat.shape[0], axis=1)
    cols = np.argmax(p_labels == s_labels, 1)
    nums = sim_exp[range(len(cols)), cols]
    dens = sim_exp.sum(dim=1)
    return -torch.log(nums / dens).mean()
