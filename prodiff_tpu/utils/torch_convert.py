"""torch-checkpoint -> flax-params converters.

Lets this framework load checkpoints released for the reference stack
(NSF-HiFiGAN vocoders etc.) and powers golden parity tests. Weight-norm is
folded exactly the way the reference does at load time
(``remove_weight_norm``, ``modules/nsf_hifigan/models.py:290-297``):
``w = g * v / ||v||`` with the norm over all dims except the output-channel
dim (torch ``weight_norm`` default dim=0).

torch is used only on the host to read the pickle; nothing torch touches the
compute path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # unwrap nested containers like {"state_dict": {"model": {...}}}
    unwrapped = True
    while isinstance(obj, dict) and unwrapped:
        unwrapped = False
        for key in ("generator", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                unwrapped = True
                break
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = dict(sd)
    for k in list(sd):
        if k.endswith(".weight_g"):
            base = k[: -len(".weight_g")]
            g = np.asarray(sd[k], np.float64)
            v = np.asarray(sd[base + ".weight_v"], np.float64)
            norm = np.sqrt(
                (v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True)
            )
            out[base + ".weight"] = (g * v / norm).astype(np.float32)
            del out[k], out[base + ".weight_v"]
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d [Cout, Cin, k] -> flax [k, Cin, Cout]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose1d [Cin, Cout, k] -> pre-flipped [k, Cin, Cout]
    (see ``models.nsf_hifigan.ConvTranspose1d``)."""
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax [in, out]."""
    return np.ascontiguousarray(w.T)


def convert_nsf_hifigan(sd: Dict[str, np.ndarray], h: dict) -> Dict[str, Any]:
    """Reference NSF-HiFiGAN generator state dict -> flax Generator params."""
    sd = fold_weight_norm(sd)
    p: Dict[str, Any] = {}

    def conv(dst: str, src: str):
        p[dst] = {
            "conv": {
                "kernel": _conv_kernel(sd[src + ".weight"]),
                "bias": sd[src + ".bias"].astype(np.float32),
            }
        }

    conv("conv_pre", "conv_pre")
    conv("conv_post", "conv_post")
    n_up = len(h["upsample_rates"])
    for i in range(n_up):
        p[f"ups_{i}"] = {
            "kernel": _convtranspose_kernel(sd[f"ups.{i}.weight"]),
            "bias": sd[f"ups.{i}.bias"].astype(np.float32),
        }
        conv(f"noise_convs_{i}", f"noise_convs.{i}")
    num_kernels = len(h["resblock_kernel_sizes"])
    for n in range(n_up * num_kernels):
        block: Dict[str, Any] = {}
        if str(h["resblock"]) == "1":
            for j in range(3):
                for group in ("convs1", "convs2"):
                    src = f"resblocks.{n}.{group}.{j}"
                    block[f"{group}_{j}"] = {
                        "conv": {
                            "kernel": _conv_kernel(sd[src + ".weight"]),
                            "bias": sd[src + ".bias"].astype(np.float32),
                        }
                    }
        else:
            for j in range(2):
                src = f"resblocks.{n}.convs.{j}"
                block[f"convs_{j}"] = {
                    "conv": {
                        "kernel": _conv_kernel(sd[src + ".weight"]),
                        "bias": sd[src + ".bias"].astype(np.float32),
                    }
                }
        p[f"resblocks_{n}"] = block
    p["m_source"] = {
        "l_linear": {
            "kernel": _dense_kernel(sd["m_source.l_linear.weight"]),
            "bias": sd["m_source.l_linear.bias"].astype(np.float32),
        }
    }
    return {"params": p}
