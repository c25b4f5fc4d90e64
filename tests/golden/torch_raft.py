"""Golden functional PyTorch RAFT (official princeton-vl semantics) used to
verify the JAX implementation + converter.  Consumes a state_dict in the
official naming (fnet.*, cnet.*, update_block.*)."""

import torch
import torch.nn.functional as F


def random_raft_state_dict(gen):
    def r(*s):
        return 0.1 * torch.randn(*s, generator=gen)

    sd = {}

    def conv(name, cin, cout, kh, kw, bias=True):
        # fan-in scaling keeps activations O(1) through the deep residual
        # stacks so the oracle stays finite with random weights
        fan = cin * kh * kw
        sd[name + ".weight"] = torch.randn(cout, cin, kh, kw,
                                           generator=gen) / fan ** 0.5
        if bias:
            sd[name + ".bias"] = 0.01 * torch.randn(cout, generator=gen)

    def bn(name, c):
        sd[name + ".weight"] = 1 + 0.1 * r(c)
        sd[name + ".bias"] = 0.1 * r(c)
        sd[name + ".running_mean"] = 0.1 * r(c)
        sd[name + ".running_var"] = (1 + 0.1 * r(c)).abs()

    for enc, norm in (("fnet", "instance"), ("cnet", "batch")):
        conv(enc + ".conv1", 3, 64, 7, 7)
        out_dim = 256
        conv(enc + ".conv2", 128, out_dim, 1, 1)
        if norm == "batch":
            bn(enc + ".norm1", 64)
        for i, (cin, cout, stride) in enumerate(
                [(64, 64, 1), (64, 96, 2), (96, 128, 2)], start=1):
            for j in range(2):
                bi = cin if j == 0 else cout
                p = f"{enc}.layer{i}.{j}"
                conv(p + ".conv1", bi, cout, 3, 3)
                conv(p + ".conv2", cout, cout, 3, 3)
                if norm == "batch":
                    bn(p + ".norm1", cout)
                    bn(p + ".norm2", cout)
                if j == 0 and stride != 1:
                    conv(p + ".downsample.0", bi, cout, 1, 1)
                    if norm == "batch":
                        bn(p + ".downsample.1", cout)
    u = "update_block"
    conv(u + ".encoder.convc1", 324, 256, 1, 1)
    conv(u + ".encoder.convc2", 256, 192, 3, 3)
    conv(u + ".encoder.convf1", 2, 128, 7, 7)
    conv(u + ".encoder.convf2", 128, 64, 3, 3)
    conv(u + ".encoder.conv", 256, 126, 3, 3)
    for k in ("convz1", "convr1", "convq1"):
        conv(f"{u}.gru.{k}", 384, 128, 1, 5)
    for k in ("convz2", "convr2", "convq2"):
        conv(f"{u}.gru.{k}", 384, 128, 5, 1)
    conv(u + ".flow_head.conv1", 128, 256, 3, 3)
    conv(u + ".flow_head.conv2", 256, 2, 3, 3)
    conv(u + ".mask.0", 128, 256, 3, 3)
    conv(u + ".mask.2", 256, 576, 1, 1)
    return sd


def _c(sd, name, x, stride=1, padding=0):
    return F.conv2d(x, sd[name + ".weight"], sd.get(name + ".bias"),
                    stride=stride, padding=padding)


def _norm(sd, name, x, kind):
    if kind == "instance":
        return F.instance_norm(x)
    return F.batch_norm(x, sd[name + ".running_mean"],
                        sd[name + ".running_var"], sd[name + ".weight"],
                        sd[name + ".bias"], training=False)


def _res_block(sd, p, x, kind, stride):
    y = F.relu(_norm(sd, p + ".norm1", _c(sd, p + ".conv1", x, stride, 1), kind))
    y = F.relu(_norm(sd, p + ".norm2", _c(sd, p + ".conv2", y, 1, 1), kind))
    if p + ".downsample.0.weight" in sd:
        x = _norm(sd, p + ".downsample.1", _c(sd, p + ".downsample.0", x, stride),
                  kind)
    return F.relu(x + y)


def _encoder(sd, enc, x, kind):
    x = F.relu(_norm(sd, enc + ".norm1", _c(sd, enc + ".conv1", x, 2, 3), kind))
    for i, stride in ((1, 1), (2, 2), (3, 2)):
        x = _res_block(sd, f"{enc}.layer{i}.0", x, kind, stride)
        x = _res_block(sd, f"{enc}.layer{i}.1", x, kind, 1)
    return _c(sd, enc + ".conv2", x)


def _bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def _coords_grid(b, h, w):
    coords = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    return torch.stack(coords[::-1], dim=0).float()[None].repeat(b, 1, 1, 1)


@torch.no_grad()
def golden_raft_forward(sd, image1, image2, iters=4, levels=4, radius=4):
    """images: (B, 3, H, W) in [0, 255], H/W divisible by 8.
    Returns (B, 2, H, W) flow."""
    assert iters >= 1, "convex upsampling needs at least one update"
    i1 = 2 * (image1 / 255.0) - 1.0
    i2 = 2 * (image2 / 255.0) - 1.0
    f1 = _encoder(sd, "fnet", i1, "instance")
    f2 = _encoder(sd, "fnet", i2, "instance")

    b, d, h, w = f1.shape
    corr = torch.matmul(f1.view(b, d, h * w).transpose(1, 2),
                        f2.view(b, d, h * w)) / (d ** 0.5)
    corr = corr.reshape(b * h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    cnet = _encoder(sd, "cnet", i1, "batch")
    net, inp = torch.split(cnet, [128, 128], dim=1)
    net = torch.tanh(net)
    inp = F.relu(inp)

    coords0 = _coords_grid(b, h, w)
    coords1 = coords0.clone()

    r = radius
    dx = torch.linspace(-r, r, 2 * r + 1)
    dy = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)

    u = "update_block"
    up_mask = None
    for _ in range(iters):
        # corr lookup (official CorrBlock.__call__)
        coords = coords1.permute(0, 2, 3, 1)
        outs = []
        for i_lvl, c in enumerate(pyramid):
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i_lvl
            coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            sampled = _bilinear_sampler(c, coords_lvl)
            outs.append(sampled.view(b, h, w, -1))
        corr_feat = torch.cat(outs, dim=-1).permute(0, 3, 1, 2).contiguous()

        flow = coords1 - coords0
        cor = F.relu(_c(sd, u + ".encoder.convc1", corr_feat))
        cor = F.relu(_c(sd, u + ".encoder.convc2", cor, 1, 1))
        flo = F.relu(_c(sd, u + ".encoder.convf1", flow, 1, 3))
        flo = F.relu(_c(sd, u + ".encoder.convf2", flo, 1, 1))
        mot = F.relu(_c(sd, u + ".encoder.conv", torch.cat([cor, flo], 1), 1, 1))
        mot = torch.cat([mot, flow], dim=1)

        x = torch.cat([inp, mot], dim=1)
        for sfx, pad in (("1", (0, 2)), ("2", (2, 0))):
            hx = torch.cat([net, x], dim=1)
            z = torch.sigmoid(_c(sd, f"{u}.gru.convz{sfx}", hx, 1, pad))
            rr = torch.sigmoid(_c(sd, f"{u}.gru.convr{sfx}", hx, 1, pad))
            q = torch.tanh(_c(sd, f"{u}.gru.convq{sfx}",
                              torch.cat([rr * net, x], dim=1), 1, pad))
            net = (1 - z) * net + z * q

        delta_flow = _c(sd, u + ".flow_head.conv2",
                        F.relu(_c(sd, u + ".flow_head.conv1", net, 1, 1)), 1, 1)
        up_mask = 0.25 * _c(sd, u + ".mask.2",
                            F.relu(_c(sd, u + ".mask.0", net, 1, 1)))
        coords1 = coords1 + delta_flow

    # convex upsampling
    flow = coords1 - coords0
    n = b
    mask = up_mask.view(n, 1, 9, 8, 8, h, w)
    mask = torch.softmax(mask, dim=2)
    up_flow = F.unfold(8 * flow, [3, 3], padding=1)
    up_flow = up_flow.view(n, 2, 9, 1, 1, h, w)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(n, 2, 8 * h, 8 * w)
