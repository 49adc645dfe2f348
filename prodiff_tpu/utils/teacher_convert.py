"""Reference ProDiffTeacher torch checkpoint -> flax params.

Maps the reference's state-dict names (``modules/svs/prodiff_teacher.py``,
``modules/commons/common_layers.py``, ``modules/decoder/wavenet.py``) onto
this framework's param tree, enabling (a) loading released SVS checkpoints and
(b) golden parity testing against the torch reference.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _dense(sd, src):
    out = {"kernel": np.ascontiguousarray(sd[f"{src}.weight"].T)}
    if f"{src}.bias" in sd:
        out["bias"] = sd[f"{src}.bias"]
    return out


def _linear(sd, src):
    """This framework's Linear module wraps an nn.Dense child named Dense_0."""
    return {"Dense_0": _dense(sd, src)}


def _conv1d(sd, src):
    out = {"kernel": np.ascontiguousarray(np.transpose(sd[f"{src}.weight"], (2, 1, 0)))}
    if f"{src}.bias" in sd:
        out["bias"] = sd[f"{src}.bias"]
    return out


def _layer_norm(sd, src):
    return {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}


def _embedding(sd, src):
    return {"embedding": sd[f"{src}.weight"]}


def convert_fastspeech_encoder(sd: Dict[str, np.ndarray], prefix: str, n_layers: int):
    p: Dict[str, Any] = {
        "embed_tokens": _embedding(sd, f"{prefix}.embed_tokens"),
    }
    blocks: Dict[str, Any] = {}
    for i in range(n_layers):
        op = f"{prefix}.layers.{i}.op"
        blocks[f"layers_{i}"] = {
            "layer_norm1": _layer_norm(sd, f"{op}.layer_norm1"),
            "self_attn": {
                "in_proj": {
                    "kernel": np.ascontiguousarray(sd[f"{op}.self_attn.in_proj_weight"].T)
                },
                "out_proj": {
                    "kernel": np.ascontiguousarray(sd[f"{op}.self_attn.out_proj.weight"].T)
                },
            },
            "layer_norm2": _layer_norm(sd, f"{op}.layer_norm2"),
            "ffn": {
                "ffn_1": _conv1d(sd, f"{op}.ffn.ffn_1"),
                "ffn_2": _linear(sd, f"{op}.ffn.ffn_2"),
            },
        }
    blocks["layer_norm"] = _layer_norm(sd, f"{prefix}.layer_norm")
    p["fft_blocks"] = blocks
    return p


def convert_wavenet(sd: Dict[str, np.ndarray], prefix: str, n_layers: int):
    p: Dict[str, Any] = {
        "input_projection": _conv1d(sd, f"{prefix}.input_projection"),
        "mlp_0": _linear(sd, f"{prefix}.mlp.0"),
        "mlp_1": _linear(sd, f"{prefix}.mlp.2"),
        "skip_projection": _conv1d(sd, f"{prefix}.skip_projection"),
        "output_projection": _conv1d(sd, f"{prefix}.output_projection"),
    }
    for i in range(n_layers):
        src = f"{prefix}.residual_layers.{i}"
        p[f"layers_{i}"] = {
            "dilated_conv": _conv1d(sd, f"{src}.dilated_conv"),
            "diffusion_projection": _linear(sd, f"{src}.diffusion_projection"),
            "output_projection": _conv1d(sd, f"{src}.output_projection"),
        }
        p[f"layers_{i}_conditioner_projection"] = _conv1d(
            sd, f"{src}.conditioner_projection"
        )
    return p


def convert_prodiff_teacher(sd: Dict[str, np.ndarray], hparams: dict) -> Dict[str, Any]:
    """Full teacher state dict -> flax variables {'params': ...}."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if hasattr(v, "__array__") or isinstance(v, np.ndarray)}
    p: Dict[str, Any] = {}
    p["encoder"] = convert_fastspeech_encoder(sd, "encoder", hparams["enc_layers"])
    if hparams.get("use_dur_embed", True):
        p["dur_embed"] = _linear(sd, "dur_embed")
    if hparams.get("use_spk_id", True):
        p["spk_embed"] = _embedding(sd, "spk_embed")
    if hparams.get("use_gender_id", False) and "gender_embed.weight" in sd:
        p["gender_embed"] = _embedding(sd, "gender_embed")
    if hparams.get("use_lang_id", True):
        p["lang_embed"] = _embedding(sd, "lang_embed")
    p["pitch_embed"] = _linear(sd, "pitch_embed")
    if hparams.get("use_voicing_embed", False):
        p["voicing_embed"] = _linear(sd, "voicing_embed")
    if hparams.get("use_breath_embed", False):
        p["breath_embed"] = _linear(sd, "breath_embed")
    # the torch reference names the net denoise_fn (prodiff) or velocity_fn
    # (reflow, ``modules/diffusion/reflow.py:13``); flax always: denoise_fn
    net = (
        "diffusion.denoise_fn"
        if "diffusion.denoise_fn.input_projection.weight" in sd
        else "diffusion.velocity_fn"
    )
    p["diffusion"] = {
        "denoise_fn": convert_wavenet(sd, net, hparams["residual_layers"])
    }
    return {"params": p}


def load_reference_teacher_ckpt(path: str, hparams: dict) -> Dict[str, Any]:
    """Load a reference ``model_ckpt_steps_*.ckpt`` (torch pickle with
    state_dict.model nesting) and convert."""
    from prodiff_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(path)
    return convert_prodiff_teacher(sd, hparams)
