"""Torch-vs-JAX parity workbench.

Re-creation of the reference's signature test mechanism (tests/workbench.py,
tests/workbench.cpp, docs/model-implementation-guide.md): PyTorch modules
(re-implemented from the original model repos) are initialized with
deterministic pseudo-random weights, run in torch to produce `expected`, then
the vision_tpu implementation is invoked with the same state dict (tensor
names = dotted state-dict keys) and compared. No ctypes/process boundary is
needed — both sides are Python.

Conventions:
  * torch activations are NCHW; vision_tpu is NHWC. `to_nhwc`/`to_nchw`
    convert at the boundary (reference workbench.py:283-360 did the same
    for ggml's layouts).
  * state dicts pass through `state_dict_to_params` unchanged (torch-
    canonical weight shapes are the loader contract, see core/weights.py).
  * comparisons default to float32 CPU tolerances; image-level model tests
    use the reference's RMS thresholds instead.
"""

from __future__ import annotations

import numpy as np
import torch

from vision_tpu.core.params import Params

__all__ = [
    "randomize",
    "input_tensor",
    "to_nhwc",
    "to_nchw",
    "state_dict_to_params",
    "make_params",
    "tensors_match",
    "fuse_conv_bn",
]


def randomize(module: torch.nn.Module, seed: int = 93) -> torch.nn.Module:
    """Deterministic pseudo-random weights for every parameter/buffer
    (reference workbench.py randomize)."""
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=gen) * 0.5 + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=gen) * 0.1
    module.load_state_dict(sd)
    module.eval()
    return module


def input_tensor(*shape: int, seed: int = 17) -> torch.Tensor:
    gen = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=gen)


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    """(N,C,H,W) torch -> (N,H,W,C) numpy."""
    assert t.ndim == 4
    return t.detach().permute(0, 2, 3, 1).contiguous().numpy()


def to_nchw(a: np.ndarray) -> torch.Tensor:
    assert a.ndim == 4
    return torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2).contiguous()


def state_dict_to_params(sd: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if isinstance(v, torch.Tensor):
            out[prefix + k] = v.detach().cpu().numpy()
    return out


def make_params(module: torch.nn.Module, prefix: str = "") -> Params:
    return Params(state_dict_to_params(module.state_dict(), prefix))


def fuse_conv_bn(conv_w, conv_b, bn_w, bn_b, bn_mean, bn_var, eps=1e-5):
    """Conv+BN fusion identical to the converter (scripts/convert.py:157-197)."""
    scale = bn_w / torch.sqrt(bn_var + eps)
    w = conv_w * scale[:, None, None, None]
    b = (conv_b if conv_b is not None else torch.zeros_like(bn_b)) - bn_mean
    b = b * scale + bn_b
    return w, b


def tensors_match(expected: torch.Tensor, actual, rtol=1e-4, atol=1e-5, label=""):
    """allclose with a helpful diff report (reference workbench.py:371-388)."""
    e = expected.detach().cpu().numpy() if isinstance(expected, torch.Tensor) else np.asarray(expected)
    a = np.asarray(actual)
    assert e.shape == a.shape, f"{label} shape mismatch: {e.shape} vs {a.shape}"
    if not np.allclose(e, a.astype(e.dtype), rtol=rtol, atol=atol):
        diff = np.abs(e - a.astype(np.float64))
        denom = np.abs(e) + 1e-8
        raise AssertionError(
            f"{label} mismatch: max abs diff {diff.max():.3e} "
            f"(mean {diff.mean():.3e}, max rel {np.max(diff / denom):.3e}) "
            f"over {e.size} elements"
        )
    return True
