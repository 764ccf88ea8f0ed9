"""Independent PyTorch implementation of the XFeat architecture for golden
tests (behavioral spec: /root/reference/src/XFeat.cc:30-173 and
/root/reference/src/XFextractor.cc:161-305). Test-only; the package itself
never imports torch.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def basic_layer(cin, cout, k, s, p):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride=s, padding=p, bias=False),
        nn.BatchNorm2d(cout, affine=False),
        nn.ReLU(inplace=True),
    )


class TorchXFeat(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm = nn.InstanceNorm2d(1)
        self.skip1 = nn.Sequential(nn.AvgPool2d(4, stride=4), nn.Conv2d(1, 24, 1))
        self.block1 = nn.Sequential(
            *[nn.Sequential(basic_layer(*s)) for s in
              [(1, 4, 3, 1, 1), (4, 8, 3, 2, 1), (8, 8, 3, 1, 1), (8, 24, 3, 2, 1)]]
        )
        self.block2 = nn.Sequential(
            *[nn.Sequential(basic_layer(*s)) for s in [(24, 24, 3, 1, 1)] * 2]
        )
        self.block3 = nn.Sequential(
            *[nn.Sequential(basic_layer(*s)) for s in
              [(24, 64, 3, 2, 1), (64, 64, 3, 1, 1), (64, 64, 1, 1, 0)]]
        )
        self.block4 = nn.Sequential(
            *[nn.Sequential(basic_layer(*s)) for s in
              [(64, 64, 3, 2, 1), (64, 64, 3, 1, 1), (64, 64, 3, 1, 1)]]
        )
        self.block5 = nn.Sequential(
            *[nn.Sequential(basic_layer(*s)) for s in
              [(64, 128, 3, 2, 1), (128, 128, 3, 1, 1), (128, 128, 3, 1, 1), (128, 64, 1, 1, 0)]]
        )
        self.block_fusion = nn.Sequential(
            nn.Sequential(basic_layer(64, 64, 3, 1, 1)),
            nn.Sequential(basic_layer(64, 64, 3, 1, 1)),
            nn.Conv2d(64, 64, 1),
        )
        self.heatmap_head = nn.Sequential(
            nn.Sequential(basic_layer(64, 64, 1, 1, 0)),
            nn.Sequential(basic_layer(64, 64, 1, 1, 0)),
            nn.Conv2d(64, 1, 1),
            nn.Sigmoid(),
        )
        self.keypoint_head = nn.Sequential(
            nn.Sequential(basic_layer(64, 64, 1, 1, 0)),
            nn.Sequential(basic_layer(64, 64, 1, 1, 0)),
            nn.Sequential(basic_layer(64, 64, 1, 1, 0)),
            nn.Conv2d(64, 65, 1),
        )
        self.fine_matcher = nn.Sequential(
            nn.Linear(128, 512), nn.BatchNorm1d(512, affine=False), nn.ReLU(True),
            nn.Linear(512, 512), nn.BatchNorm1d(512, affine=False), nn.ReLU(True),
            nn.Linear(512, 512), nn.BatchNorm1d(512, affine=False), nn.ReLU(True),
            nn.Linear(512, 512), nn.BatchNorm1d(512, affine=False), nn.ReLU(True),
            nn.Linear(512, 64),
        )

    @staticmethod
    def unfold2d(x, ws=8):
        B, C, H, W = x.shape
        x = x.unfold(2, ws, ws).unfold(3, ws, ws).reshape(B, C, H // ws, W // ws, ws * ws)
        return x.permute(0, 1, 4, 2, 3).reshape(B, -1, H // ws, W // ws)

    def forward(self, x):
        with torch.no_grad():
            x = x.mean(1, keepdim=True)
            x = self.norm(x)
        x1 = self.block1(x)
        x2 = self.block2(x1 + self.skip1(x))
        x3 = self.block3(x2)
        x4 = self.block4(x3)
        x5 = self.block5(x4)
        x4 = F.interpolate(x4, size=x3.shape[-2:], mode="bilinear", align_corners=False)
        x5 = F.interpolate(x5, size=x3.shape[-2:], mode="bilinear", align_corners=False)
        feats = self.block_fusion(x3 + x4 + x5)
        heatmap = self.heatmap_head(feats)
        keypoints = self.keypoint_head(self.unfold2d(x, 8))
        return feats, keypoints, heatmap


def state_dict_for_converter(model):
    """Rename test-module keys (block1.0.0.*) to reference keys
    (block1.0.layer.0.*)."""
    out = {}
    for k, v in model.state_dict().items():
        parts = k.split(".")
        if parts[0].startswith("block") or parts[0] in ("heatmap_head", "keypoint_head"):
            # blockX.i.0.j.param -> blockX.i.layer.j.param for wrapped layers
            if len(parts) >= 4 and parts[2] == "0":
                k = ".".join(parts[:2] + ["layer"] + parts[3:])
        out[k] = v
    return out


def randomize_bn_stats(model, seed=0):
    """Give BN layers nontrivial running stats so folding is actually tested."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.3
            m.running_var = torch.rand(m.running_var.shape, generator=g) * 2.0 + 0.2


# --- reference post-processing (XFextractor.cc:204-305) ---

def get_kpts_heatmap(kpts, softmax_temp=1.0):
    scores = F.softmax(kpts * softmax_temp, 1)[:, :64]
    B, _, H, W = scores.shape
    heatmap = scores.permute(0, 2, 3, 1).reshape(B, H, W, 8, 8)
    heatmap = heatmap.permute(0, 1, 3, 2, 4).reshape(B, 1, H * 8, W * 8)
    return heatmap


def nms(x, threshold=0.05, kernel_size=5):
    B, _, H, W = x.shape
    pad = kernel_size // 2
    local_max = F.max_pool2d(x, kernel_size, stride=1, padding=pad)
    pos = (x == local_max) & (x > threshold)
    pos_batched = [k.nonzero()[..., 1:].flip(-1) for k in pos]
    pad_val = max([len(p) for p in pos_batched])
    pos_t = torch.zeros((B, pad_val, 2), dtype=torch.long)
    for b in range(B):
        if len(pos_batched[b]) > 0:
            pos_t[b, : len(pos_batched[b])] = pos_batched[b]
    return pos_t


def interpolate_sparse2d(x, pos, H, W, mode):
    size = torch.tensor([W - 1, H - 1], dtype=x.dtype)
    grid = (2.0 * (pos / size) - 1.0).unsqueeze(-2).to(x.dtype)
    x = F.grid_sample(x, grid, mode=mode, align_corners=False)
    return x.permute(0, 2, 3, 1).squeeze(-2)


@torch.no_grad()
def reference_extract(model, x, top_k=1000):
    """Full reference post-processing pipeline on a preprocessed tensor x
    (B,1,H,W) with H,W divisible by 32. Returns (kpts, scores, desc)."""
    H1, W1 = x.shape[-2:]
    M1, K1, H1m = model(x)
    M1 = F.normalize(M1, dim=1)
    K1h = get_kpts_heatmap(K1)
    mkpts = nms(K1h, 0.05, 5)
    scores = (
        interpolate_sparse2d(K1h, mkpts.float(), H1, W1, "nearest")
        * interpolate_sparse2d(H1m, mkpts.float(), H1, W1, "bilinear")
    ).squeeze(-1)
    mask = torch.all(mkpts == 0, dim=-1)
    scores = scores.masked_fill(mask, -1)
    idxs = scores.neg().argsort(dim=-1)
    mkpts_x = mkpts[..., 0].gather(-1, idxs)[:, :top_k]
    mkpts_y = mkpts[..., 1].gather(-1, idxs)[:, :top_k]
    mkpts = torch.stack([mkpts_x, mkpts_y], -1)
    scores = scores.gather(-1, idxs)[:, :top_k]
    feats = interpolate_sparse2d(M1, mkpts.float(), H1, W1, "bilinear")
    feats = F.normalize(feats, dim=-1)
    return mkpts, scores, feats
