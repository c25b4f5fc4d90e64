"""Golden functional torch R3D-18 (torchvision video resnet semantics) for
parity-testing the JAX implementation + converter."""

import torch
import torch.nn.functional as F


def random_r3d18_state_dict(gen):
    sd = {}

    def conv(name, cin, cout, kd, kh, kw):
        fan = cin * kd * kh * kw
        sd[name + ".weight"] = torch.randn(cout, cin, kd, kh, kw,
                                           generator=gen) / fan ** 0.5

    def bn(name, c):
        sd[name + ".weight"] = 1 + 0.1 * torch.randn(c, generator=gen)
        sd[name + ".bias"] = 0.1 * torch.randn(c, generator=gen)
        sd[name + ".running_mean"] = 0.1 * torch.randn(c, generator=gen)
        sd[name + ".running_var"] = (1 + 0.1 * torch.randn(c, generator=gen)).abs()

    conv("stem.0", 3, 64, 3, 7, 7)
    bn("stem.1", 64)
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for li, (cin, cout) in enumerate(chans, start=1):
        for bi in range(2):
            p = f"layer{li}.{bi}"
            b_in = cin if bi == 0 else cout
            conv(p + ".conv1.0", b_in, cout, 3, 3, 3)
            bn(p + ".conv1.1", cout)
            conv(p + ".conv2.0", cout, cout, 3, 3, 3)
            bn(p + ".conv2.1", cout)
            if bi == 0 and li > 1:
                conv(p + ".downsample.0", b_in, cout, 1, 1, 1)
                bn(p + ".downsample.1", cout)
    return sd


def _bn(sd, name, x):
    return F.batch_norm(x, sd[name + ".running_mean"],
                        sd[name + ".running_var"], sd[name + ".weight"],
                        sd[name + ".bias"], training=False)


@torch.no_grad()
def golden_r3d18_features(sd, clips):
    """clips: (B, 3, T, H, W) normalized -> (B, 512)."""
    x = F.conv3d(clips, sd["stem.0.weight"], stride=(1, 2, 2),
                 padding=(1, 3, 3))
    x = F.relu(_bn(sd, "stem.1", x))
    for li in range(1, 5):
        for bi in range(2):
            p = f"layer{li}.{bi}"
            stride = (2, 2, 2) if (bi == 0 and li > 1) else (1, 1, 1)
            y = F.conv3d(x, sd[p + ".conv1.0.weight"], stride=stride,
                         padding=1)
            y = F.relu(_bn(sd, p + ".conv1.1", y))
            y = F.conv3d(y, sd[p + ".conv2.0.weight"], padding=1)
            y = _bn(sd, p + ".conv2.1", y)
            if p + ".downsample.0.weight" in sd:
                x = _bn(sd, p + ".downsample.1",
                        F.conv3d(x, sd[p + ".downsample.0.weight"],
                                 stride=stride))
            x = F.relu(x + y)
    return x.mean(dim=(2, 3, 4))
