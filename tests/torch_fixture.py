"""Test-only torch oracle: a minimal ultralytics-style YOLOv5 graph.

Used to (a) fabricate checkpoints in the exact pickled layout ultralytics
ships (flat ``model.N`` Sequential, Detect head with anchor buffers, ``yaml``
dict attr) and (b) compute reference forward outputs to pin numerical parity
of the JAX stack.  Written fresh as a fixture — this is the *test oracle*,
not product code.

Class __module__ is spoofed to 'models.common'/'models.yolo' so pickles
exercise the stub-unpickling path in yolort_tpu.models._checkpoint.
"""

import math

import torch
import torch.nn as nn


def _autopad(k, p=None):
    return k // 2 if p is None else p


class FConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act="silu"):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, _autopad(k, p), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU() if act == "silu" else nn.Hardswish()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class FBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = FConv(c1, c_, 1, 1)
        self.cv2 = FConv(c_, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class FC3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = FConv(c1, c_, 1, 1)
        self.cv2 = FConv(c1, c_, 1, 1)
        self.cv3 = FConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*[FBottleneck(c_, c_, shortcut, e=1.0) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class FSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = FConv(c1, c_, 1, 1)
        self.cv2 = FConv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


class FConcat(nn.Module):
    def __init__(self, d=1):
        super().__init__()
        self.d = d

    def forward(self, xs):
        return torch.cat(xs, self.d)


class FDetect(nn.Module):
    def __init__(self, nc, anchors, ch):
        super().__init__()
        self.nc = nc
        self.no = nc + 5
        self.nl = len(anchors)
        self.na = len(anchors[0]) // 2
        self.register_buffer("anchors", torch.tensor(anchors).float().view(self.nl, -1, 2))
        self.m = nn.ModuleList(nn.Conv2d(c, self.no * self.na, 1) for c in ch)

    def forward(self, feats):
        """Returns decoded (bs, total, no) like ultralytics inference."""
        z = []
        for i, x in enumerate(feats):
            x = self.m[i](x)
            bs, _, ny, nx = x.shape
            x = x.view(bs, self.na, self.no, ny, nx).permute(0, 1, 3, 4, 2)
            y = x.sigmoid()
            yv, xv = torch.meshgrid(torch.arange(ny).float(), torch.arange(nx).float())
            grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2)
            anchor_grid = (self.anchors[i] * self.stride[i]).view(1, self.na, 1, 1, 2)
            xy = (y[..., 0:2] * 2 - 0.5 + grid) * self.stride[i]
            wh = (y[..., 2:4] * 2) ** 2 * anchor_grid
            y = torch.cat((xy, wh, y[..., 4:]), 4)
            z.append(y.view(bs, -1, self.no))
        return torch.cat(z, 1)


class FModel(nn.Module):
    """Flat-Sequential DetectionModel lookalike (P5, r6.0 layout)."""

    def __init__(self, nc=7, dm=0.33, wm=0.25, anchors=None):
        super().__init__()
        if anchors is None:
            anchors = [
                [10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326],
            ]

        def mdiv(v, d=8):
            nv = max(d, int(v + d / 2) // d * d)
            return nv + d if nv < 0.9 * v else nv

        def dg(n):
            return max(round(n * dm), 1)

        c = {k: mdiv(k * wm) for k in (64, 128, 256, 512, 1024)}
        layers = [
            FConv(3, c[64], 6, 2, 2),            # 0
            FConv(c[64], c[128], 3, 2),          # 1
            FC3(c[128], c[128], dg(3)),          # 2
            FConv(c[128], c[256], 3, 2),         # 3
            FC3(c[256], c[256], dg(6)),          # 4
            FConv(c[256], c[512], 3, 2),         # 5
            FC3(c[512], c[512], dg(9)),          # 6
            FConv(c[512], c[1024], 3, 2),        # 7
            FC3(c[1024], c[1024], dg(3)),        # 8
            FSPPF(c[1024], c[1024], 5),          # 9
            FConv(c[1024], c[512], 1, 1),        # 10
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 11
            FConcat(),                           # 12
            FC3(c[1024], c[512], dg(3), False),  # 13
            FConv(c[512], c[256], 1, 1),         # 14
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 15
            FConcat(),                           # 16
            FC3(c[512], c[256], dg(3), False),   # 17
            FConv(c[256], c[256], 3, 2),         # 18
            FConcat(),                           # 19
            FC3(c[512], c[512], dg(3), False),   # 20
            FConv(c[512], c[512], 3, 2),         # 21
            FConcat(),                           # 22
            FC3(c[1024], c[1024], dg(3), False), # 23
            FDetect(nc, anchors, (c[256], c[512], c[1024])),  # 24
        ]
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0])
        # ultralytics stores Detect.anchors normalized by stride after build
        with torch.no_grad():
            self.model[-1].anchors /= self.model[-1].stride.view(-1, 1, 1)
        self.stride = self.model[-1].stride
        # real ultralytics checkpoints carry the FULL parsed yaml incl.
        # backbone/head rows — mirror that so the generic yaml-DSL ingestion
        # path is exercised by the standard fixture too
        self.yaml = {
            "nc": nc, "depth_multiple": dm, "width_multiple": wm, "anchors": anchors,
            "backbone": [
                [-1, 1, "Conv", [64, 6, 2, 2]],
                [-1, 1, "Conv", [128, 3, 2]],
                [-1, 3, "C3", [128]],
                [-1, 1, "Conv", [256, 3, 2]],
                [-1, 6, "C3", [256]],
                [-1, 1, "Conv", [512, 3, 2]],
                [-1, 9, "C3", [512]],
                [-1, 1, "Conv", [1024, 3, 2]],
                [-1, 3, "C3", [1024]],
                [-1, 1, "SPPF", [1024, 5]],
            ],
            "head": [
                [-1, 1, "Conv", [512, 1, 1]],
                [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
                [[-1, 6], 1, "Concat", [1]],
                [-1, 3, "C3", [512, False]],
                [-1, 1, "Conv", [256, 1, 1]],
                [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
                [[-1, 4], 1, "Concat", [1]],
                [-1, 3, "C3", [256, False]],
                [-1, 1, "Conv", [256, 3, 2]],
                [[-1, 14], 1, "Concat", [1]],
                [-1, 3, "C3", [512, False]],
                [-1, 1, "Conv", [512, 3, 2]],
                [[-1, 10], 1, "Concat", [1]],
                [-1, 3, "C3", [1024, False]],
                [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
            ],
        }

    def forward(self, x):
        m = self.model
        x1 = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x1))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        i10 = m[10](p5)
        x13 = m[13](m[12]([m[11](i10), p4]))
        i14 = m[14](x13)
        x17 = m[17](m[16]([m[15](i14), p3]))  # P3 out
        x20 = m[20](m[19]([m[18](x17), i14]))  # P4 out
        x23 = m[23](m[22]([m[21](x20), i10]))  # P5 out
        return m[24]([x17, x20, x23])


def randomize_bn_stats(model: nn.Module, seed: int = 0):
    """Give BN layers non-trivial running stats so conv+BN folding is
    actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
            mod.running_var.copy_(torch.rand(mod.num_features, generator=g) * 1.5 + 0.3)
            with torch.no_grad():
                mod.weight.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
                mod.bias.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
    return model


class FFocus(nn.Module):
    def __init__(self, c1, c2, k=1):
        super().__init__()
        self.conv = FConv(c1 * 4, c2, k, 1)

    def forward(self, x):
        return self.conv(
            torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1
            )
        )


class FSPP(nn.Module):
    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = FConv(c1, c_, 1, 1)
        self.cv2 = FConv(c_ * (len(k) + 1), c2, 1, 1)
        self.m = nn.ModuleList(
            nn.MaxPool2d(kernel_size=x, stride=1, padding=x // 2) for x in k
        )

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))


class FModelR40(nn.Module):
    """r4.0-era flat layout: Focus stem, stages [3,9,9], SPP tail at flat 8,
    first head block C3(shortcut=False) at flat 9 (old yolov5s.yaml)."""

    def __init__(self, nc=7, dm=0.33, wm=0.25, anchors=None):
        super().__init__()
        if anchors is None:
            anchors = [
                [10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326],
            ]

        def mdiv(v, d=8):
            nv = max(d, int(v + d / 2) // d * d)
            return nv + d if nv < 0.9 * v else nv

        def dg(n):
            return max(round(n * dm), 1)

        c = {k: mdiv(k * wm) for k in (64, 128, 256, 512, 1024)}
        layers = [
            FFocus(3, c[64], 3),                  # 0
            FConv(c[64], c[128], 3, 2),           # 1
            FC3(c[128], c[128], dg(3)),           # 2
            FConv(c[128], c[256], 3, 2),          # 3
            FC3(c[256], c[256], dg(9)),           # 4
            FConv(c[256], c[512], 3, 2),          # 5
            FC3(c[512], c[512], dg(9)),           # 6
            FConv(c[512], c[1024], 3, 2),         # 7
            FSPP(c[1024], c[1024]),               # 8
            FC3(c[1024], c[1024], dg(3), False),  # 9
            FConv(c[1024], c[512], 1, 1),         # 10
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 11
            FConcat(),                            # 12
            FC3(c[1024], c[512], dg(3), False),   # 13
            FConv(c[512], c[256], 1, 1),          # 14
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 15
            FConcat(),                            # 16
            FC3(c[512], c[256], dg(3), False),    # 17
            FConv(c[256], c[256], 3, 2),          # 18
            FConcat(),                            # 19
            FC3(c[512], c[512], dg(3), False),    # 20
            FConv(c[512], c[512], 3, 2),          # 21
            FConcat(),                            # 22
            FC3(c[1024], c[1024], dg(3), False),  # 23
            FDetect(nc, anchors, (c[256], c[512], c[1024])),  # 24
        ]
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0])
        with torch.no_grad():
            self.model[-1].anchors /= self.model[-1].stride.view(-1, 1, 1)
        self.stride = self.model[-1].stride
        self.yaml = {"nc": nc, "depth_multiple": dm, "width_multiple": wm, "anchors": anchors}

    def forward(self, x):
        m = self.model
        x1 = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x1))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))      # SPP then first head C3 (inner.0)
        i10 = m[10](p5)
        x13 = m[13](m[12]([m[11](i10), p4]))
        i14 = m[14](x13)
        x17 = m[17](m[16]([m[15](i14), p3]))
        x20 = m[20](m[19]([m[18](x17), i14]))
        x23 = m[23](m[22]([m[21](x20), i10]))
        return m[24]([x17, x20, x23])


class FBottleneckHS(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = FConv(c1, c_, 1, 1, act="hardswish")
        self.cv2 = FConv(c_, c2, 3, 1, act="hardswish")
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class FBottleneckCSP(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = FConv(c1, c_, 1, 1, act="hardswish")
        self.cv2 = nn.Conv2d(c1, c_, 1, 1, bias=False)
        self.cv3 = nn.Conv2d(c_, c_, 1, 1, bias=False)
        self.cv4 = FConv(2 * c_, c2, 1, 1, act="hardswish")
        self.bn = nn.BatchNorm2d(2 * c_, eps=1e-3)
        self.act = nn.LeakyReLU(0.1)
        self.m = nn.Sequential(*[FBottleneckHS(c_, c_, shortcut, e=1.0) for _ in range(n)])

    def forward(self, x):
        y1 = self.cv3(self.m(self.cv1(x)))
        y2 = self.cv2(x)
        return self.cv4(self.act(self.bn(torch.cat((y1, y2), 1))))


class FModelR31(nn.Module):
    """r3.1-era flat layout: Focus(hardswish) stem, BottleneckCSP stages,
    SPP tail at 8, first head block BottleneckCSP(False) at 9."""

    def __init__(self, nc=7, dm=0.33, wm=0.25, anchors=None):
        super().__init__()
        if anchors is None:
            anchors = [
                [10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326],
            ]

        def mdiv(v, d=8):
            nv = max(d, int(v + d / 2) // d * d)
            return nv + d if nv < 0.9 * v else nv

        def dg(n):
            return max(round(n * dm), 1)

        c = {k: mdiv(k * wm) for k in (64, 128, 256, 512, 1024)}
        hs = dict(act="hardswish")
        layers = [
            FFocusHS(3, c[64], 3),                        # 0
            FConv(c[64], c[128], 3, 2, **hs),             # 1
            FBottleneckCSP(c[128], c[128], dg(3)),        # 2
            FConv(c[128], c[256], 3, 2, **hs),            # 3
            FBottleneckCSP(c[256], c[256], dg(9)),        # 4
            FConv(c[256], c[512], 3, 2, **hs),            # 5
            FBottleneckCSP(c[512], c[512], dg(9)),        # 6
            FConv(c[512], c[1024], 3, 2, **hs),           # 7
            FSPPHS(c[1024], c[1024]),                     # 8
            FBottleneckCSP(c[1024], c[1024], dg(3), False),  # 9
            FConv(c[1024], c[512], 1, 1, **hs),           # 10
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 11
            FConcat(),                                    # 12
            FBottleneckCSP(c[1024], c[512], dg(3), False),   # 13
            FConv(c[512], c[256], 1, 1, **hs),            # 14
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 15
            FConcat(),                                    # 16
            FBottleneckCSP(c[512], c[256], dg(3), False),    # 17
            FConv(c[256], c[256], 3, 2, **hs),            # 18
            FConcat(),                                    # 19
            FBottleneckCSP(c[512], c[512], dg(3), False),    # 20
            FConv(c[512], c[512], 3, 2, **hs),            # 21
            FConcat(),                                    # 22
            FBottleneckCSP(c[1024], c[1024], dg(3), False),  # 23
            FDetect(nc, anchors, (c[256], c[512], c[1024])),  # 24
        ]
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0])
        with torch.no_grad():
            self.model[-1].anchors /= self.model[-1].stride.view(-1, 1, 1)
        self.stride = self.model[-1].stride
        self.yaml = {"nc": nc, "depth_multiple": dm, "width_multiple": wm, "anchors": anchors}

    # forward assigned below (shared r4.0-style graph walk)


class FFocusHS(nn.Module):
    def __init__(self, c1, c2, k=1):
        super().__init__()
        self.conv = FConv(c1 * 4, c2, k, 1, act="hardswish")

    def forward(self, x):
        return self.conv(
            torch.cat(
                [x[..., ::2, ::2], x[..., 1::2, ::2], x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1
            )
        )


class FSPPHS(nn.Module):
    def __init__(self, c1, c2, k=(5, 9, 13)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = FConv(c1, c_, 1, 1, act="hardswish")
        self.cv2 = FConv(c_ * (len(k) + 1), c2, 1, 1, act="hardswish")
        self.m = nn.ModuleList(
            nn.MaxPool2d(kernel_size=x, stride=1, padding=x // 2) for x in k
        )

    def forward(self, x):
        x = self.cv1(x)
        return self.cv2(torch.cat([x] + [m(x) for m in self.m], 1))


def _r40_style_forward(self, x):
    m = self.model
    x1 = m[2](m[1](m[0](x)))
    p3 = m[4](m[3](x1))
    p4 = m[6](m[5](p3))
    p5 = m[9](m[8](m[7](p4)))
    i10 = m[10](p5)
    x13 = m[13](m[12]([m[11](i10), p4]))
    i14 = m[14](x13)
    x17 = m[17](m[16]([m[15](i14), p3]))
    x20 = m[20](m[19]([m[18](x17), i14]))
    x23 = m[23](m[22]([m[21](x20), i10]))
    return m[24]([x17, x20, x23])


FModelR31.forward = _r40_style_forward


class FTransformerLayer(nn.Module):
    def __init__(self, c, num_heads):
        super().__init__()
        self.q = nn.Linear(c, c, bias=False)
        self.k = nn.Linear(c, c, bias=False)
        self.v = nn.Linear(c, c, bias=False)
        self.ma = nn.MultiheadAttention(embed_dim=c, num_heads=num_heads)
        self.fc1 = nn.Linear(c, c, bias=False)
        self.fc2 = nn.Linear(c, c, bias=False)

    def forward(self, x):
        x = self.ma(self.q(x), self.k(x), self.v(x))[0] + x
        x = self.fc2(self.fc1(x)) + x
        return x


class FTransformerBlock(nn.Module):
    def __init__(self, c1, c2, num_heads, num_layers):
        super().__init__()
        self.conv = None
        if c1 != c2:
            self.conv = FConv(c1, c2)
        self.linear = nn.Linear(c2, c2)
        self.tr = nn.Sequential(*[FTransformerLayer(c2, num_heads) for _ in range(num_layers)])
        self.c2 = c2

    def forward(self, x):
        if self.conv is not None:
            x = self.conv(x)
        b, _, w, h = x.shape
        p = x.flatten(2).unsqueeze(0).transpose(0, 3).squeeze(3)
        return self.tr(p + self.linear(p)).unsqueeze(3).transpose(0, 3).reshape(b, self.c2, w, h)


class FC3TR(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = FConv(c1, c_, 1, 1)
        self.cv2 = FConv(c1, c_, 1, 1)
        self.cv3 = FConv(2 * c_, c2, 1)
        self.m = FTransformerBlock(c_, c_, 4, n)

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class FModelP6(nn.Module):
    """Flat-Sequential DetectionModel lookalike (P6, r6.0 hub layout —
    yolov5s6.yaml: backbone 0-11 ending in SPPF, head 12-32, Detect @33)."""

    def __init__(self, nc=7, dm=0.33, wm=0.25, anchors=None):
        super().__init__()
        if anchors is None:
            anchors = [
                [19, 27, 44, 40, 38, 94],
                [96, 68, 86, 152, 180, 137],
                [140, 301, 303, 264, 238, 542],
                [436, 615, 739, 380, 925, 792],
            ]

        def mdiv(v, d=8):
            nv = max(d, int(v + d / 2) // d * d)
            return nv + d if nv < 0.9 * v else nv

        def dg(n):
            return max(round(n * dm), 1)

        c = {k: mdiv(k * wm) for k in (64, 128, 256, 512, 768, 1024)}
        layers = [
            FConv(3, c[64], 6, 2, 2),             # 0
            FConv(c[64], c[128], 3, 2),           # 1
            FC3(c[128], c[128], dg(3)),           # 2
            FConv(c[128], c[256], 3, 2),          # 3
            FC3(c[256], c[256], dg(6)),           # 4
            FConv(c[256], c[512], 3, 2),          # 5
            FC3(c[512], c[512], dg(9)),           # 6
            FConv(c[512], c[768], 3, 2),          # 7
            FC3(c[768], c[768], dg(3)),           # 8
            FConv(c[768], c[1024], 3, 2),         # 9
            FC3(c[1024], c[1024], dg(3)),         # 10
            FSPPF(c[1024], c[1024], 5),           # 11
            FConv(c[1024], c[768], 1, 1),         # 12
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 13
            FConcat(),                            # 14
            FC3(c[768] * 2, c[768], dg(3), False),    # 15
            FConv(c[768], c[512], 1, 1),          # 16
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 17
            FConcat(),                            # 18
            FC3(c[512] * 2, c[512], dg(3), False),    # 19
            FConv(c[512], c[256], 1, 1),          # 20
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 21
            FConcat(),                            # 22
            FC3(c[256] * 2, c[256], dg(3), False),    # 23
            FConv(c[256], c[256], 3, 2),          # 24
            FConcat(),                            # 25
            FC3(c[256] * 2, c[512], dg(3), False),    # 26
            FConv(c[512], c[512], 3, 2),          # 27
            FConcat(),                            # 28
            FC3(c[512] * 2, c[768], dg(3), False),    # 29
            FConv(c[768], c[768], 3, 2),          # 30
            FConcat(),                            # 31
            FC3(c[768] * 2, c[1024], dg(3), False),   # 32
            FDetect(nc, anchors, (c[256], c[512], c[768], c[1024])),  # 33
        ]
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0, 64.0])
        with torch.no_grad():
            self.model[-1].anchors /= self.model[-1].stride.view(-1, 1, 1)
        self.stride = self.model[-1].stride
        self.yaml = {"nc": nc, "depth_multiple": dm, "width_multiple": wm, "anchors": anchors}

    def forward(self, x):
        m = self.model
        x2 = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x2))
        p4 = m[6](m[5](p3))
        p5 = m[8](m[7](p4))
        p6 = m[11](m[10](m[9](p5)))
        i12 = m[12](p6)
        x15 = m[15](m[14]([m[13](i12), p5]))
        i16 = m[16](x15)
        x19 = m[19](m[18]([m[17](i16), p4]))
        i20 = m[20](x19)
        x23 = m[23](m[22]([m[21](i20), p3]))
        x26 = m[26](m[25]([m[24](x23), i20]))
        x29 = m[29](m[28]([m[27](x26), i16]))
        x32 = m[32](m[31]([m[30](x29), i12]))
        return m[33]([x23, x26, x29, x32])


class FModelTAN(FModelR40):
    """r4.0 TAN layout: flat 9 is C3TR instead of C3 (the dingyiwei
    yolov5-transformer PR the reference's tan_s_r40 weights come from)."""

    def __init__(self, nc=7, dm=0.33, wm=0.25, anchors=None):
        super().__init__(nc=nc, dm=dm, wm=wm, anchors=anchors)

        def mdiv(v, d=8):
            nv = max(d, int(v + d / 2) // d * d)
            return nv + d if nv < 0.9 * v else nv

        def dg(n):
            return max(round(n * dm), 1)

        c1024 = mdiv(1024 * wm)
        layers = list(self.model)
        layers[9] = FC3TR(c1024, c1024, n=dg(3))
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0])
        self.stride = self.model[-1].stride


# Full yaml rows (as real ultralytics checkpoints carry them) for the custom
# non-standard architecture below: gw=gd=1.0, narrow widths, and an EXTRA C3
# at flat index 14 — a layout the fixed P5/P6 index maps cannot express.
CUSTOM_YAML = {
    "nc": 7,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [32, 6, 2, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 2, "C3", [64]],
        [-1, 1, "Conv", [96, 3, 2]],
        [-1, 2, "C3", [96]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 1, "C3", [128]],
        [-1, 1, "Conv", [192, 3, 2]],
        [-1, 1, "C3", [192]],
        [-1, 1, "SPPF", [192, 5]],
    ],
    "head": [
        [-1, 1, "Conv", [128, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [-1, 1, "C3", [128, False]],  # 14: the extra block
        [-1, 1, "Conv", [96, 1, 1]],
        [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [96, False]],
        [-1, 1, "Conv", [96, 3, 2]],
        [[-1, 15], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [-1, 1, "Conv", [128, 3, 2]],
        [[-1, 10], 1, "Concat", [1]],
        [-1, 1, "C3", [192, False]],
        [[18, 21, 24], 1, "Detect", ["nc", "anchors"]],
    ],
}


class FModelCustom(nn.Module):
    """Non-standard flat layout matching CUSTOM_YAML (tests the generic
    yaml-DSL ingestion, not the fixed index maps)."""

    def __init__(self, nc=7):
        super().__init__()
        anchors = CUSTOM_YAML["anchors"]
        layers = [
            FConv(3, 32, 6, 2, 2),     # 0
            FConv(32, 64, 3, 2),       # 1
            FC3(64, 64, 2),            # 2
            FConv(64, 96, 3, 2),       # 3
            FC3(96, 96, 2),            # 4
            FConv(96, 128, 3, 2),      # 5
            FC3(128, 128, 1),          # 6
            FConv(128, 192, 3, 2),     # 7
            FC3(192, 192, 1),          # 8
            FSPPF(192, 192, 5),        # 9
            FConv(192, 128, 1, 1),     # 10
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 11
            FConcat(),                 # 12
            FC3(256, 128, 1, False),   # 13
            FC3(128, 128, 1, False),   # 14 extra
            FConv(128, 96, 1, 1),      # 15
            nn.Upsample(scale_factor=2.0, mode="nearest"),  # 16
            FConcat(),                 # 17
            FC3(192, 96, 1, False),    # 18 P3 out
            FConv(96, 96, 3, 2),       # 19
            FConcat(),                 # 20
            FC3(192, 128, 1, False),   # 21 P4 out
            FConv(128, 128, 3, 2),     # 22
            FConcat(),                 # 23
            FC3(256, 192, 1, False),   # 24 P5 out
            FDetect(nc, anchors, (96, 128, 192)),  # 25
        ]
        self.model = nn.Sequential(*layers)
        self.model[-1].stride = torch.tensor([8.0, 16.0, 32.0])
        with torch.no_grad():
            self.model[-1].anchors /= self.model[-1].stride.view(-1, 1, 1)
        self.stride = self.model[-1].stride
        import copy

        self.yaml = copy.deepcopy(CUSTOM_YAML)
        self.yaml["nc"] = nc

    def forward(self, x):
        m = self.model
        x2 = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x2))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        i10 = m[10](p5)
        x14 = m[14](m[13](m[12]([m[11](i10), p4])))
        i15 = m[15](x14)
        x18 = m[18](m[17]([m[16](i15), p3]))
        x21 = m[21](m[20]([m[19](x18), i15]))
        x24 = m[24](m[23]([m[22](x21), i10]))
        return m[25]([x18, x21, x24])


def make_custom_checkpoint(path, nc=7, seed=0, half=True):
    """Fabricate a non-standard-layout checkpoint carrying its full yaml."""
    torch.manual_seed(seed)
    model = FModelCustom(nc=nc)
    randomize_bn_stats(model, seed)
    model.eval()
    _spoof_ultralytics_modules()
    try:
        to_save = model.half() if half else model
        torch.save({"model": to_save, "epoch": -1}, path)
    finally:
        _unspoof()
    return model.float()


_SPOOF = {
    FConv: ("models.common", "Conv"),
    FBottleneck: ("models.common", "Bottleneck"),
    FC3: ("models.common", "C3"),
    FSPPF: ("models.common", "SPPF"),
    FConcat: ("models.common", "Concat"),
    FDetect: ("models.yolo", "Detect"),
    FModel: ("models.yolo", "DetectionModel"),
    FModelP6: ("models.yolo", "Model"),
    FFocus: ("models.common", "Focus"),
    FSPP: ("models.common", "SPP"),
    FModelR40: ("models.yolo", "SegmentationModel"),
    FTransformerLayer: ("models.common", "TransformerLayer"),
    FTransformerBlock: ("models.common", "TransformerBlock"),
    FC3TR: ("models.common", "C3TR"),
    FModelTAN: ("models.yolo", "ClassificationModel"),
    FBottleneckHS: ("models.common", "Bottleneck2"),
    FBottleneckCSP: ("models.common", "BottleneckCSP"),
    FFocusHS: ("models.common", "Focus2"),
    FSPPHS: ("models.common", "SPP2"),
    FModelR31: ("models.yolo", "BaseModel"),
    FModelCustom: ("models.yolo", "CustomModel"),
}


def _spoof_ultralytics_modules():
    """Point fixture classes at the ultralytics module paths and register
    matching fake modules so pickling succeeds; the fakes are removed before
    load so unpickling exercises the stub path."""
    import sys
    import types

    mods = {}
    for cls, (mod, name) in _SPOOF.items():
        cls.__module__ = mod
        cls.__qualname__ = name
        cls.__name__ = name
        m = mods.setdefault(mod, types.ModuleType(mod))
        setattr(m, name, cls)
    pkg = types.ModuleType("models")
    sys.modules["models"] = pkg
    for name, m in mods.items():
        sys.modules[name] = m
        setattr(pkg, name.split(".")[1], m)


def _unspoof():
    import sys

    for name in ("models", "models.common", "models.yolo"):
        sys.modules.pop(name, None)


def make_checkpoint(path, nc=7, dm=0.33, wm=0.25, seed=0, half=True, p6=False, version="r6.0",
                    head_cls_bias_noise=0.0):
    """Fabricate an ultralytics-layout checkpoint; returns the float oracle
    model (same fp16 round-trip as the saved weights when half=True).

    head_cls_bias_noise > 0 adds per-class gaussian noise to the Detect head
    class biases: random deep conv stacks otherwise produce an
    input-independent, single-class score landscape (every detection the
    same class within 5e-4 score), which is useless for harness selftests
    that need class-diverse detections (tools/regression.py --selftest)."""
    torch.manual_seed(seed)
    if p6:
        cls = FModelP6
    elif version == "tan":
        cls = FModelTAN
    elif version == "r4.0":
        cls = FModelR40
    elif version == "r3.1":
        cls = FModelR31
    else:
        cls = FModel
    model = cls(nc=nc, dm=dm, wm=wm)
    randomize_bn_stats(model, seed)
    if head_cls_bias_noise:
        g = torch.Generator().manual_seed(seed + 12345)
        with torch.no_grad():
            for mod in model.modules():
                if isinstance(mod, FDetect):
                    for conv in mod.m:
                        b = conv.bias.view(mod.na, mod.no)
                        b[:, 5:] += torch.randn(mod.na, mod.nc, generator=g) * head_cls_bias_noise
    model.eval()
    _spoof_ultralytics_modules()
    try:
        to_save = model.half() if half else model
        torch.save({"model": to_save, "epoch": -1}, path)
    finally:
        _unspoof()
    return model.float()
