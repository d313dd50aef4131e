"""PyTorch-CPU throughput baseline for the BASELINE.json north star
("~10x PyTorch-CPU frames/sec/chip").

The reference itself cannot run here (mmcv/imgaug/CUDA missing), so this
builds an equivalent-compute PyTorch model — same backbone (ResNet-18 at
384x768), same FPN widths, and a per-frame head with the same dominant
tensor contractions (anchor pooling, DynamicConv generator MLPs + bmm's,
two branch MLP stacks, 2-layer transformer decoder at d=128, router
depthwise convs + MLP) driven by the same sequential per-frame loop the
reference uses (``RouterV4.py:489-510``). Run once; the result is stored in
``BASELINE_TORCH_CPU.json`` and consumed by ``bench.py`` as the
``vs_baseline`` denominator.
"""

import json
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

A, P, C, O, STAGES = 240, 36, 64, 36, 3
H, W = 384, 768


def conv_bn(cin, cout, k=3, s=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, k // 2, bias=False),
        nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class Basic(nn.Module):
    def __init__(self, cin, cout, s=1):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, s, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.down = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, s, bias=False),
                          nn.BatchNorm2d(cout))
            if (s != 1 or cin != cout) else None)

    def forward(self, x):
        idn = self.down(x) if self.down else x
        y = F.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return F.relu(y + idn)


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
        self.l1 = nn.Sequential(Basic(64, 64), Basic(64, 64))
        self.l2 = nn.Sequential(Basic(64, 128, 2), Basic(128, 128))
        self.l3 = nn.Sequential(Basic(128, 256, 2), Basic(256, 256))
        self.l4 = nn.Sequential(Basic(256, 512, 2), Basic(512, 512))
        self.lat = nn.ModuleList([nn.Conv2d(c, C, 1) for c in (128, 256, 512)])
        self.out = nn.ModuleList([nn.Conv2d(C, C, 3, 1, 1) for _ in range(3)])

    def forward(self, x):
        x = self.stem(x)
        c2 = self.l2(self.l1(x))
        c3 = self.l3(c2)
        c4 = self.l4(c3)
        lats = [l(c) for l, c in zip(self.lat, (c2, c3, c4))]
        for i in (2, 1):
            lats[i - 1] = lats[i - 1] + F.interpolate(lats[i], size=lats[i - 1].shape[2:])
        return tuple(o(l) for o, l in zip(self.out, lats))


class FrameHead(nn.Module):
    def __init__(self):
        super().__init__()
        np_ = C * 2 * C
        self.gen1 = nn.Sequential(nn.Linear(C, np_ // 8), nn.Linear(np_ // 8, np_))
        self.gen2 = nn.Sequential(nn.Linear(2 * C * P, np_ // 8), nn.Linear(np_ // 8, np_))
        self.outl = nn.Sequential(nn.Linear(C * P, 6 * C), nn.Linear(6 * C, C))
        self.n1, self.n2, self.n3 = nn.LayerNorm(2 * C), nn.LayerNorm(C), nn.LayerNorm(C)
        self.cls = nn.Sequential(nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(), nn.Linear(C, 2))
        self.reg = nn.Sequential(nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(), nn.Linear(C, O + 5))
        self.cls2 = nn.Sequential(nn.Linear(2 * C, 2 * C), nn.ReLU(), nn.Linear(2 * C, 2 * C), nn.ReLU(), nn.Linear(2 * C, 2))
        self.reg2 = nn.Sequential(nn.Linear(2 * C, 2 * C), nn.ReLU(), nn.Linear(2 * C, 2 * C), nn.ReLU(), nn.Linear(2 * C, O + 5))
        dec = nn.TransformerDecoderLayer(2 * C, 8, 256, 0.0, "gelu", norm_first=True)
        self.dec = nn.TransformerDecoder(dec, 2)
        self.router_dw = nn.ModuleList(
            [nn.Conv2d(A, A, 3, 1, 1, groups=A) for _ in range(8)])
        self.router_mlp = nn.Sequential(
            nn.Linear(C * P, C * P // 4), nn.ReLU(), nn.Linear(C * P // 4, 1), nn.ReLU())

    def forward(self, feats, memory):
        pro = torch.zeros(A, C)
        outs = []
        for s in range(STAGES):
            f = feats[2 - s]
            grid = torch.rand(1, A, P, 2) * 2 - 1
            roi = F.grid_sample(f, grid, align_corners=True)[0].permute(1, 2, 0)  # A,P,C
            x = roi.reshape(A, C, P)
            for dw in self.router_dw:
                x = F.relu(dw(x.unsqueeze(0))[0] + x)
            diff = torch.sigmoid(self.router_mlp(x.reshape(A, -1)))
            w1 = self.gen1(pro).reshape(A, C, 2 * C)
            h = F.relu(self.n1(torch.bmm(roi, w1)))
            w2 = self.gen2(h.detach().reshape(A, -1)).reshape(A, 2 * C, C)
            h = F.relu(self.n2(torch.bmm(h, w2)))
            dec_feat = self.n3(self.outl(h.reshape(A, -1)))
            pro = dec_feat.detach()
            p1 = torch.cat([self.cls(dec_feat), self.reg(dec_feat)], -1)
            attn = torch.cat([dec_feat, torch.randn(A, C)], -1)
            g = self.dec(attn.unsqueeze(1), memory.unsqueeze(1))[:, 0]
            p2 = torch.cat([self.cls2(g), self.reg2(g)], -1)
            outs.append((1 - diff) * p1 + diff * p2)
        return outs[-1], attn


def main():
    torch.set_grad_enabled(False)
    import os
    torch.set_num_threads(os.cpu_count() or 1)
    bb, head = Backbone().eval(), FrameHead().eval()
    T = 8
    frames = torch.randn(T, 3, H, W)
    memory = torch.randn(5 * 9, 2 * C)
    # warmup
    feats = bb(frames[:1])
    head(feats, memory)
    t0 = time.time()
    feats = bb(frames)
    for t in range(T):
        ft = tuple(f[t:t + 1] for f in feats)
        head(ft, memory)
    dt = time.time() - t0
    fps = T / dt
    result = {
        "torch_cpu_fps": fps,
        "frames": T,
        "seconds": dt,
        "threads": torch.get_num_threads(),
        "note": "equivalent-compute PyTorch-CPU PHNet, per-frame loop, eval mode",
    }
    print(json.dumps(result))
    with open("BASELINE_TORCH_CPU.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
