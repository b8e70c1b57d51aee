"""Plain-torch oracle of TSN(ResNet50+TAM) for numerical parity tests.

Independent re-statement of the architecture (TAM arXiv:2005.06803,
torchvision Bottleneck v1.5) with checkpoint-compatible parameter names
(``base_model.layer1.0.net.conv1`` / ``...tam.G.0`` ...), so it both
(a) exercises vitta_tpu.utils.checkpoint.convert_tanet_checkpoint on a
realistically-named state_dict and (b) provides reference logits.
No torchvision required.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchTAM(nn.Module):
    def __init__(self, c, t, k=3):
        super().__init__()
        self.t, self.k = t, k
        self.G = nn.Sequential(
            nn.Linear(t, 2 * t, bias=False), nn.BatchNorm1d(2 * t),
            nn.ReLU(), nn.Linear(2 * t, k, bias=False), nn.Softmax(-1))
        self.L = nn.Sequential(
            nn.Conv1d(c, c // 4, k, padding=k // 2, bias=False),
            nn.BatchNorm1d(c // 4), nn.ReLU(),
            nn.Conv1d(c // 4, c, 1, bias=False), nn.Sigmoid())

    def forward(self, x):  # (N*T, C, H, W)
        nt, c, h, w = x.shape
        t = self.t
        n = nt // t
        xv = x.view(n, t, c, h, w).permute(0, 2, 1, 3, 4).contiguous()  # N,C,T,H,W
        pooled = xv.mean((3, 4))                                        # N,C,T
        kernel = self.G(pooled.reshape(n * c, t)).view(n * c, 1, self.k, 1)
        attn = self.L(pooled).view(n, c, t, 1, 1)
        xa = xv * attn
        out = F.conv2d(xa.view(1, n * c, t, h * w), kernel, bias=None,
                       stride=(1, 1), padding=(self.k // 2, 0), groups=n * c)
        out = out.view(n, c, t, h, w).permute(0, 2, 1, 3, 4).reshape(nt, c, h, w)
        return out


class TorchBottleneckNet(nn.Module):
    """The `.net` part: a torchvision-style Bottleneck (stride on conv2)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        out_planes = planes * 4
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out_planes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_planes)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out_planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_planes))


class TorchTemporalBottleneck(nn.Module):
    def __init__(self, inplanes, planes, t, stride=1, downsample=False):
        super().__init__()
        self.net = TorchBottleneckNet(inplanes, planes, stride, downsample)
        self.tam = TorchTAM(planes, t)

    def forward(self, x):
        identity = x
        out = F.relu(self.net.bn1(self.net.conv1(x)))
        out = self.tam(out)
        out = F.relu(self.net.bn2(self.net.conv2(out)))
        out = self.net.bn3(self.net.conv3(out))
        if self.net.downsample is not None:
            identity = self.net.downsample(x)
        return F.relu(out + identity)


class TorchResNet50TAM(nn.Module):
    def __init__(self, t):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        layers = []
        inplanes = 64
        for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
            stage = []
            for bi in range(blocks):
                stage.append(TorchTemporalBottleneck(
                    inplanes, planes, t, stride if bi == 0 else 1, bi == 0))
                inplanes = planes * 4
            layers.append(nn.Sequential(*stage))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x)
        return x.mean((2, 3))  # adaptive avg pool -> (N*T, 2048)


class TorchTSN(nn.Module):
    def __init__(self, num_classes, t):
        super().__init__()
        self.t = t
        self.base_model = TorchResNet50TAM(t)
        self.new_fc = nn.Linear(2048, num_classes)

    def forward(self, x):  # (B, T, C, H, W)
        b = x.shape[0]
        frames = x.reshape(-1, *x.shape[2:])
        feats = self.base_model(frames)
        logits = self.new_fc(feats).view(b, self.t, -1)
        return logits.mean(1)


def randomize_bn_stats(model, seed=0):
    """Give running stats non-default values so conversion errors show."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model
