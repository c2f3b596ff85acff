"""Minimal torch YOLOv8 mirror for weight-converter parity tests.

A from-scratch torch implementation of the ultralytics YOLOv8 detection
architecture with the EXACT ``DetectionModel.state_dict()`` key layout
(``model.{i}.conv.weight``, ``model.{i}.m.{j}.cv1.bn.running_mean``,
``model.22.cv2.{l}.{k}...``, …) and forward semantics (Conv+BN(eps=1e-3)
+SiLU, C2f dense taps, SPPF chained 5x5 maxpools, PAN concat order,
decoupled DFL head).  ultralytics itself is not installed in this
environment (no network egress), so this mirror plays the role its
``DetectionModel`` would in tests: random-weight ground truth for
models/weights.py::convert_yolov8_state_dict and models/yolo.py.

Reference for behavior: the reference repo ships ultralytics YOLOv8 as its
detector (reference src/detection/yolov8_detector.py); architecture per
the public yolov8.yaml / ultralytics modules.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

BN_EPS = 1e-3  # ultralytics Conv block BatchNorm2d eps


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


class Conv(nn.Module):
    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=BN_EPS)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1: int, c2: int, shortcut: bool = True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3)
        self.cv2 = Conv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1: int, c2: int, n: int = 1, shortcut: bool = False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut) for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1: int, c2: int, k: int = 5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class DFL(nn.Module):
    """Fixed arange conv: (b, 4*reg_max, a) logits -> (b, 4, a) distances."""

    def __init__(self, c1: int = 16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class Detect(nn.Module):
    def __init__(self, nc: int, ch: tuple[int, ...], reg_max: int = 16):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        c2 = max(16, ch[0] // 4, 4 * reg_max)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1))
            for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1))
            for c in ch
        )
        self.dfl = DFL(reg_max)

    def forward(self, feats):
        # Raw per-level outputs (box_dist, cls_logits) — NCHW.
        return [
            (self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)
        ]


class DetectionModel(nn.Module):
    """state_dict-compatible stand-in for ultralytics DetectionModel.

    ``model`` is an nn.ModuleList indexed by the yolov8.yaml module ids;
    parameter-free Upsample/Concat slots hold nn.Identity so indices (and
    therefore state_dict keys) line up exactly.
    """

    def __init__(self, variant_mult: tuple[float, float, int],
                 nc: int = 1, reg_max: int = 16):
        super().__init__()
        d, w, mc = variant_mult
        ch = [_make_divisible(min(c, mc) * w) for c in (64, 128, 256, 512, 1024)]
        n = [max(round(b * d), 1) for b in (3, 6, 6, 3)]
        m = nn.ModuleList()
        m.append(Conv(3, ch[0], 3, 2))            # 0
        m.append(Conv(ch[0], ch[1], 3, 2))        # 1
        m.append(C2f(ch[1], ch[1], n[0], True))   # 2
        m.append(Conv(ch[1], ch[2], 3, 2))        # 3
        m.append(C2f(ch[2], ch[2], n[1], True))   # 4
        m.append(Conv(ch[2], ch[3], 3, 2))        # 5
        m.append(C2f(ch[3], ch[3], n[2], True))   # 6
        m.append(Conv(ch[3], ch[4], 3, 2))        # 7
        m.append(C2f(ch[4], ch[4], n[3], True))   # 8
        m.append(SPPF(ch[4], ch[4]))              # 9
        m.append(nn.Identity())                   # 10 Upsample
        m.append(nn.Identity())                   # 11 Concat
        m.append(C2f(ch[4] + ch[3], ch[3], n[0], False))  # 12
        m.append(nn.Identity())                   # 13 Upsample
        m.append(nn.Identity())                   # 14 Concat
        m.append(C2f(ch[3] + ch[2], ch[2], n[0], False))  # 15
        m.append(Conv(ch[2], ch[2], 3, 2))        # 16
        m.append(nn.Identity())                   # 17 Concat
        m.append(C2f(ch[2] + ch[3], ch[3], n[0], False))  # 18
        m.append(Conv(ch[3], ch[3], 3, 2))        # 19
        m.append(nn.Identity())                   # 20 Concat
        m.append(C2f(ch[3] + ch[4], ch[4], n[0], False))  # 21
        m.append(Detect(nc, (ch[2], ch[3], ch[4]), reg_max))  # 22
        self.model = m
        self.up = nn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        n4 = m[12](torch.cat([self.up(p5), p4], 1))
        o3 = m[15](torch.cat([self.up(n4), p3], 1))
        o4 = m[18](torch.cat([m[16](o3), n4], 1))
        o5 = m[21](torch.cat([m[19](o4), p5], 1))
        return m[22]([o3, o4, o5])


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats so the converter's
    folding is actually exercised (fresh BN stats are 0/1 = identity)."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 2.0, generator=g)
