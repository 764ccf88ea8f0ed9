"""Torch-checkpoint -> JAX parameter conversion with BatchNorm folding.

The reference loads `weights/xfeat.pt` via torch::serialize
(/root/reference/src/XFextractor.cc:132-137); its module names produce
state-dict keys like `block1.0.layer.0.weight` (conv),
`block1.0.layer.1.running_mean` / `running_var` (affine-free BN). This
converter maps those to the folded inference params used by models/xfeat.py:

  BasicLayer: y = relu(BN(conv(x)))  with BN affine=False
     =>  w' = w * s,  b' = -mean * s,  s = 1/sqrt(var + eps)

Linear+BN1d pairs in fine_matcher fold the same way.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .xfeat import _BASIC_STACKS, _FINAL_CONVS, _FINE_MATCHER, BN_EPS

# torch Sequential indices of the plain convs that end each stack
_FINAL_TORCH_KEYS = {
    "skip1_conv": "skip1.1",
    "block_fusion_final": "block_fusion.2",
    "heatmap_final": "heatmap_head.2",
    "keypoint_final": "keypoint_head.3",
}


def _strip_prefix(sd):
    """Drop a leading 'net.' prefix if present (python-side wrappers)."""
    if any(k.startswith("net.") for k in sd):
        return {k[4:]: v for k, v in sd.items() if k.startswith("net.")}
    return sd


def from_torch_state_dict(sd) -> dict:
    """Convert a torch state_dict (tensors or ndarrays) to folded params."""
    sd = _strip_prefix(sd)

    def arr(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params = {}
    for name, layers in _BASIC_STACKS.items():
        stack = []
        for i, _spec in enumerate(layers):
            w = arr(f"{name}.{i}.layer.0.weight")  # OIHW
            mean = arr(f"{name}.{i}.layer.1.running_mean")
            var = arr(f"{name}.{i}.layer.1.running_var")
            s = 1.0 / np.sqrt(var + BN_EPS)
            w = np.transpose(w, (2, 3, 1, 0)) * s[None, None, None, :]
            b = -mean * s
            stack.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        params[name] = stack

    for name, tkey in _FINAL_TORCH_KEYS.items():
        w = np.transpose(arr(f"{tkey}.weight"), (2, 3, 1, 0))
        b = arr(f"{tkey}.bias")
        params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    fm = []
    lin_idx = [0, 3, 6, 9, 12]
    bn_idx = [1, 4, 7, 10, None]
    for (li, bi), _spec in zip(zip(lin_idx, bn_idx), _FINE_MATCHER):
        w = arr(f"fine_matcher.{li}.weight").T  # (in, out)
        b = arr(f"fine_matcher.{li}.bias")
        if bi is not None:
            mean = arr(f"fine_matcher.{bi}.running_mean")
            var = arr(f"fine_matcher.{bi}.running_var")
            s = 1.0 / np.sqrt(var + BN_EPS)
            w = w * s[None, :]
            b = (b - mean) * s
        fm.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    params["fine_matcher"] = fm
    return params


def load_torch(path: str) -> dict:
    """Load a .pt/.pth checkpoint (requires torch, CPU) and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return from_torch_state_dict(obj)


def save_npz(path: str, params: dict) -> None:
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) and "w" in node:
            flat[f"{prefix}.w"] = np.asarray(node["w"])
            flat[f"{prefix}.b"] = np.asarray(node["b"])
        elif isinstance(node, (list, tuple)):
            for i, sub in enumerate(node):
                walk(f"{prefix}.{i}", sub)
        elif isinstance(node, dict):
            for k, sub in node.items():
                walk(f"{prefix}.{k}" if prefix else k, sub)

    walk("", params)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    data = np.load(path)
    params: dict = {}
    for name, layers in _BASIC_STACKS.items():
        params[name] = [
            {"w": jnp.asarray(data[f"{name}.{i}.w"]), "b": jnp.asarray(data[f"{name}.{i}.b"])}
            for i in range(len(layers))
        ]
    for name in _FINAL_CONVS:
        params[name] = {"w": jnp.asarray(data[f"{name}.w"]), "b": jnp.asarray(data[f"{name}.b"])}
    params["fine_matcher"] = [
        {"w": jnp.asarray(data[f"fine_matcher.{i}.w"]), "b": jnp.asarray(data[f"fine_matcher.{i}.b"])}
        for i in range(len(_FINE_MATCHER))
    ]
    return params
