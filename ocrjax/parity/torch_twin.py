"""Torch-CPU twins of the flax CRNN and DB models (SURVEY.md §4.2a).

These are independent PyTorch implementations of the same architectures as
ocrjax.models.crnn / ocrjax.models.db, written so that one set of weights —
mapped through the ocrjax.weights key converters — produces (numerically)
the same outputs in both frameworks. They exist to
  (1) prove the N8 torch→flax weight converter end-to-end, and
  (2) provide a cross-framework golden-parity oracle: identical decoded
      strings and near-identical prob maps / boxes on synthetic pages.

Semantics deliberately mirror the flax modules, not torch defaults:
  * SAME padding is XLA's asymmetric convention (pad_total split low/high =
    floor/ceil), NOT torch's symmetric `padding=`. `conv2d_same` reproduces
    it with an explicit F.pad.
  * nn.ConvTranspose in flax does not flip the kernel the way torch's
    conv_transpose2d expects; the weight converters store a spatially
    flipped copy (verified numerically, see tests/test_parity_torch.py).
  * The BiLSTM's length-aware reverse pass matches flax `nn.RNN(reverse=
    True, keep_order=True, seq_lengths=...)`: each sample's valid prefix is
    reversed, processed, and un-reversed; padded frames are zeros.

Torch state-dict naming defines the canonical checkpoint layout the
ocrjax.weights converters consume ("drop in a torch checkpoint").
"""

from __future__ import annotations

from typing import Sequence

import torch
import torch.nn as nn
import torch.nn.functional as F


def conv2d_same(x, weight, bias=None, stride=1):
    """Conv2d with XLA-style SAME padding (asymmetric: low=floor, high=ceil).

    x: (B, C, H, W); weight: (O, I, kh, kw). For odd kernels at stride 1
    this equals torch padding=(kh//2, kw//2); at stride 2 on even inputs XLA
    pads (0, 1) while torch's symmetric padding would pad (1, 1) and shift
    the grid by one pixel.
    """
    sh = sw = stride if isinstance(stride, int) else None
    if sh is None:
        sh, sw = stride
    _, _, kh, kw = weight.shape
    ih, iw = x.shape[2:]
    oh = -(-ih // sh)
    ow = -(-iw // sw)
    pad_h = max((oh - 1) * sh + kh - ih, 0)
    pad_w = max((ow - 1) * sw + kw - iw, 0)
    x = F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                  pad_h // 2, pad_h - pad_h // 2))
    return F.conv2d(x, weight, bias, stride=(sh, sw))


class ConvSame(nn.Module):
    """Conv2d module wrapper around conv2d_same."""

    def __init__(self, cin, cout, kernel=3, stride=1, bias=True):
        super().__init__()
        k = (kernel, kernel) if isinstance(kernel, int) else kernel
        self.weight = nn.Parameter(torch.randn(cout, cin, *k) * 0.05)
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None
        self.stride = stride

    def forward(self, x):
        return conv2d_same(x, self.weight, self.bias, self.stride)


class BiLSTMTwin(nn.Module):
    """Bidirectional LSTM with flax-RNN length-aware reverse semantics."""

    def __init__(self, input_size, hidden):
        super().__init__()
        self.fwd = nn.LSTM(input_size, hidden, batch_first=True)
        self.bwd = nn.LSTM(input_size, hidden, batch_first=True)

    @staticmethod
    def _flip_valid(x, lengths):
        out = x.clone()
        for i, L in enumerate(lengths.tolist()):
            L = int(L)
            if L > 1:
                out[i, :L] = x[i, :L].flip(0)
        return out

    def forward(self, x, lengths):
        yf, _ = self.fwd(x)
        xr = self._flip_valid(x, lengths)
        yr, _ = self.bwd(xr)
        yb = self._flip_valid(yr, lengths)
        return torch.cat([yf, yb], dim=-1)


class TorchCRNN(nn.Module):
    """Twin of ocrjax.models.crnn.CRNN (eval/inference mode).

    Input (B, 1, H, W) normalized grayscale; returns (logits (B, T, C),
    frame_lengths (B,)) with T = W // 4 — same contract as the flax model.
    """

    def __init__(self, num_classes: int, hidden: int = 256,
                 channels: Sequence[int] = (64, 128, 256, 512),
                 input_height: int = 32):
        super().__init__()
        c1, c2, c3, c4 = channels
        self.input_height = input_height
        self.conv0 = ConvSame(1, c1)
        self.conv1 = ConvSame(c1, c2)
        self.conv2 = ConvSame(c2, c3, bias=False)
        self.bn2 = nn.BatchNorm2d(c3)
        self.conv3 = ConvSame(c3, c3)
        self.conv4 = ConvSame(c3, c4, bias=False)
        self.bn4 = nn.BatchNorm2d(c4)
        self.conv5 = ConvSame(c4, c4)
        # collapse conv: VALID in H (kernel H/16), SAME (pad 1) in W
        self.conv6 = nn.Conv2d(c4, c4, (input_height // 16, 3),
                               padding=(0, 1), bias=False)
        self.bn6 = nn.BatchNorm2d(c4)
        self.lstm0 = BiLSTMTwin(c4, hidden)
        self.lstm1 = BiLSTMTwin(2 * hidden, hidden)
        self.fc = nn.Linear(2 * hidden, num_classes)

    def forward(self, images, widths=None):
        B, _, H, W = images.shape
        if widths is None:
            widths = torch.full((B,), W, dtype=torch.int32)
        x = F.relu(self.conv0(images))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(self.conv1(x))
        x = F.max_pool2d(x, 2, 2)
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.conv3(x))
        x = F.max_pool2d(x, (2, 1), (2, 1))
        x = F.relu(self.bn4(self.conv4(x)))
        x = F.relu(self.conv5(x))
        x = F.max_pool2d(x, (2, 1), (2, 1))
        x = F.relu(self.bn6(self.conv6(x)))                 # (B, C, 1, T)
        feats = x.squeeze(2).permute(0, 2, 1)               # (B, T, C)
        frame_lengths = torch.clamp(
            -(-widths // 4), max=feats.shape[1]).to(torch.int32)
        feats = self.lstm0(feats, frame_lengths)
        feats = self.lstm1(feats, frame_lengths)
        logits = self.fc(feats)
        return logits, frame_lengths


# ---------------------------------------------------------------------------
# Orientation-classifier twin (the rec_try_flip "cls" stage)
# ---------------------------------------------------------------------------

class TorchCLS(nn.Module):
    """Twin of ocrjax.models.cls.OrientationClassifier (eval mode).

    Input (B, 1, H, W) normalized grayscale + (B,) valid widths → (B,)
    logit of "flipped". Mirrors the flax module's width-masked mean∥max
    pooling over W (row axis survives into the head) and its H'-major
    flatten order.
    """

    def __init__(self, channels: Sequence[int] = (32, 64, 128),
                 input_height: int = 32):
        super().__init__()
        convs, cin = [], 1
        for ch in channels:
            convs.append(ConvSame(cin, ch, stride=2))
            cin = ch
        self.convs = nn.ModuleList(convs)
        self.stride = 2 ** len(channels)
        feat = (input_height // self.stride) * channels[-1] * 2
        self.fc1 = nn.Linear(feat, 64)
        self.fc2 = nn.Linear(64, 1)

    def forward(self, x, widths):
        for c in self.convs:
            x = F.relu(c(x))                                # (B, C, H', W')
        w_cols = torch.div(widths + self.stride - 1, self.stride,
                           rounding_mode="floor")
        cols = torch.arange(x.shape[3], device=x.device)
        m = (cols[None, :] < w_cols[:, None]).float()       # (B, W')
        m4 = m[:, None, None, :]
        mean = (x * m4).sum(3) / m4.sum(3).clamp(min=1.0)   # (B, C, H')
        mx = x.masked_fill(m4 == 0, float("-inf")).max(dim=3).values
        mx = torch.where(torch.isfinite(mx), mx, torch.zeros_like(mx))
        pooled = torch.cat([mean.permute(0, 2, 1),
                            mx.permute(0, 2, 1)], dim=2)    # (B, H', 2C)
        h = F.relu(self.fc1(pooled.reshape(pooled.shape[0], -1)))
        return self.fc2(h)[:, 0]


# ---------------------------------------------------------------------------
# DB detector twin
# ---------------------------------------------------------------------------

class ResBlockTwin(nn.Module):
    """Twin of ocrjax.models.db.ResBlock (eval mode)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = ConvSame(cin, cout, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = ConvSame(cout, cout, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.project = cin != cout or stride != 1
        if self.project:
            self.conv_p = ConvSame(cin, cout, kernel=1, stride=stride,
                                   bias=False)
            self.bn_p = nn.BatchNorm2d(cout)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        r = self.bn_p(self.conv_p(x)) if self.project else x
        return F.relu(y + r)


class BackboneTwin(nn.Module):
    def __init__(self, channels=(64, 128, 256, 512), blocks_per_stage=2):
        super().__init__()
        c1 = channels[0]
        self.stem0 = ConvSame(3, c1 // 2, stride=2, bias=False)
        self.bn_s0 = nn.BatchNorm2d(c1 // 2)
        self.stem1 = ConvSame(c1 // 2, c1, stride=2, bias=False)
        self.bn_s1 = nn.BatchNorm2d(c1)
        blocks = []
        cin = c1
        for i, ch in enumerate(channels):
            stage = [ResBlockTwin(cin, ch, stride=1 if i == 0 else 2)]
            for _ in range(blocks_per_stage - 1):
                stage.append(ResBlockTwin(ch, ch))
            blocks.append(nn.ModuleList(stage))
            cin = ch
        self.stages = nn.ModuleList(blocks)

    def forward(self, x):
        x = F.relu(self.bn_s0(self.stem0(x)))
        x = F.relu(self.bn_s1(self.stem1(x)))
        feats = []
        for stage in self.stages:
            for blk in stage:
                x = blk(x)
            feats.append(x)
        return feats


class FPNTwin(nn.Module):
    def __init__(self, channels=(64, 128, 256, 512), inner=96):
        super().__init__()
        self.lateral = nn.ModuleList([
            ConvSame(c, inner, kernel=1, bias=False) for c in channels])
        self.smooth = nn.ModuleList([
            ConvSame(inner, inner // 4, bias=False) for _ in channels])

    def forward(self, feats):
        lat = [l(f) for l, f in zip(self.lateral, feats)]
        p = [None] * len(lat)
        p[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            up = F.interpolate(p[i + 1], size=lat[i].shape[2:],
                               mode="nearest")
            p[i] = lat[i] + up
        outs = []
        for i, t in enumerate(p):
            t = self.smooth[i](t)
            if i > 0:
                t = F.interpolate(t, size=p[0].shape[2:], mode="nearest")
            outs.append(t)
        return torch.cat(outs, dim=1)


class DBHeadTwin(nn.Module):
    """Twin of the full-resolution (out_stride=1) DBHead."""

    def __init__(self, inner=96):
        super().__init__()
        q = inner // 4
        self.conv0 = ConvSame(inner, q, bias=False)
        self.bn0 = nn.BatchNorm2d(q)
        # ConvTranspose weights live in torch layout (in, out, kh, kw); the
        # converter writes the spatially flipped flax kernel here.
        self.up1 = nn.ConvTranspose2d(q, q, 2, stride=2)
        self.bn1 = nn.BatchNorm2d(q)
        self.up2 = nn.ConvTranspose2d(q, 1, 2, stride=2)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv0(x)))
        x = F.relu(self.bn1(self.up1(x)))
        return self.up2(x)[:, 0]                            # (B, S, S) logits


class TorchDB(nn.Module):
    """Twin of ocrjax.models.db.DBDetector (inference: prob map only)."""

    def __init__(self, channels=(64, 128, 256, 512), inner=96,
                 blocks_per_stage=2):
        super().__init__()
        self.backbone = BackboneTwin(channels, blocks_per_stage)
        self.fpn = FPNTwin(channels, inner)
        self.head = DBHeadTwin(inner)

    def forward(self, images):
        """images: (B, 3, S, S) normalized → prob (B, S, S) in [0, 1]."""
        feats = self.backbone(images)
        fused = self.fpn(feats)
        return torch.sigmoid(self.head(fused))
