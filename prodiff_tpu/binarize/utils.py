"""Binarizer feature utilities (mirrors ``component/binarizer/binarizer_utils.py``).

Map builders (phone/lang/spk/ph-category) write the same JSON artifacts with
the same semantics; signal features (mel, RMS energy, voicing/breath/tension,
k-th harmonic masking) run on device through the jittable ops instead of
torch/librosa.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prodiff_tpu.ops.mel import MelSpectrogram
from prodiff_tpu.ops.stft_extras import istft, nuttall_window, stft_complex
from prodiff_tpu.utils.pitch_utils import interp_f0
from prodiff_tpu.utils.text_encoder import TokenTextEncoder


# ---- vocab/map builders -----------------------------------------------------


def build_phone_encoder(
    data_dir: str, dictionary: dict, languages
) -> Tuple[Dict[str, str], TokenTextEncoder]:
    """Per-language phones with cross-lingual merging via global.csv; writes
    phone_set.json (the ph/lang -> global-phone map)."""
    ph2global = {}
    if dictionary.get("global", None) and os.path.exists(dictionary["global"]):
        with open(dictionary["global"]) as f:
            for label in csv.DictReader(f):
                for lang, ph in label.items():
                    if lang == "global":
                        continue
                    ph2global[f"{ph}/{lang}"] = label["global"]

    ph_map = {}
    for lang in languages:
        if lang == "global":
            continue
        ph_map[f"AP/{lang}"] = "AP"
        ph_map[f"SP/{lang}"] = "SP"
        with open(dictionary[lang]["phoneme"]) as f:
            for x in f.readlines():
                line = x.split("\n")[0].split(" ")
                ph = f"{line[0]}/{lang}"
                ph_map[ph] = ph2global.get(ph, ph)
    with open(f"{data_dir}/phone_set.json", "w") as f:
        json.dump(ph_map, f)
    ph_list = list(sorted(set(ph_map.values())))
    return ph_map, TokenTextEncoder(ph_list, replace_oov="SP")


def build_lang_map(data_dir: str, languages) -> Dict[str, int]:
    lang_map = {lang: i for i, lang in enumerate(languages, 1)}
    with open(f"{data_dir}/lang_map.json", "w") as f:
        json.dump(lang_map, f)
    return lang_map


def build_spk_map(data_dir: str, datasets: List[dict]) -> Dict[str, int]:
    spk_map = {ds["speaker"]: i for i, ds in enumerate(datasets)}
    with open(f"{data_dir}/spk_map.json", "w") as f:
        json.dump(spk_map, f)
    return spk_map


def build_ph_category_encoder(
    data_dir: str, dictionary: dict, languages
) -> Tuple[Dict[str, Dict], TokenTextEncoder]:
    """Phoneme -> articulatory category (used by the pitch predictor)."""
    ph2category: Dict[str, Dict] = {}
    ph_category_set = {"AP", "SP"}
    for lang in languages:
        ph2category[lang] = {"AP": "AP", "SP": "SP"}
        with open(dictionary[lang]["phoneme"]) as f:
            for x in f.readlines():
                line = x.split("\n")[0].split(" ")  # "a vowel vowel"
                ph, category = line[0], line[2]
                ph2category[lang][ph] = category
                ph_category_set.add(category)
    ph_category_list = list(sorted(ph_category_set))
    with open(f"{data_dir}/ph_category_list.json", "w") as f:
        json.dump(ph_category_list, f)
    return ph2category, TokenTextEncoder(ph_category_list, replace_oov="SP")


# ---- signal features -------------------------------------------------------


_MEL_CACHE: Dict[tuple, MelSpectrogram] = {}


def get_mel_spec(
    waveform: np.ndarray,
    samplerate,
    num_mels,
    fft_size,
    win_size,
    hop_size,
    fmin,
    fmax,
    keyshift=0,
    speed=1.0,
) -> np.ndarray:
    """-> [T, M] log10-mel (the framework training convention)."""
    key = (samplerate, num_mels, fft_size, win_size, hop_size, fmin, fmax)
    if key not in _MEL_CACHE:
        _MEL_CACHE[key] = MelSpectrogram(*key)
    mel = _MEL_CACHE[key].wav2mel_log10(
        jnp.asarray(waveform, jnp.float32)[None], keyshift=keyshift, speed=speed
    )
    return np.asarray(mel[0])


def get_energy(waveform, mel_len, hop_size, win_size, domain="db") -> np.ndarray:
    """Frame RMS (librosa.feature.rms semantics: centered, zero-padded)."""
    x = np.pad(np.asarray(waveform, np.float32), (win_size // 2, win_size // 2))
    n_frames = 1 + (len(x) - win_size) // hop_size
    idx = np.arange(n_frames)[:, None] * hop_size + np.arange(win_size)[None, :]
    energy = np.sqrt((x[idx] ** 2).mean(axis=1))
    if len(energy) < mel_len:
        energy = np.pad(energy, (0, mel_len - len(energy)))
    energy = energy[:mel_len]
    if domain == "db":
        energy = 20 * np.log10(np.maximum(energy, 1e-5))
    elif domain != "amplitude":
        raise ValueError(f"Unknown domain: {domain}")
    return energy


def sinusoidal_smooth(curve: np.ndarray, kernel_size: int) -> np.ndarray:
    """Half-sine smoothing kernel with replicate padding
    (``SinusoidalSmoothingConv1d``, ``common_layers.py:974-988``)."""
    if len(curve) == 0:
        return np.asarray(curve, np.float32)
    kernel = np.sin(np.linspace(0, 1, kernel_size) * np.pi)
    kernel /= kernel.sum()
    lpad = (kernel_size - 1) // 2
    rpad = kernel_size - 1 - lpad
    padded = np.concatenate(
        [np.full(lpad, curve[0]), curve, np.full(rpad, curve[-1])]
    )
    # torch conv = correlation; the kernel is symmetric anyway
    return np.convolve(padded, kernel[::-1], mode="valid").astype(np.float32)


def get_voicing(sp, mel_len, hop_size, win_size, smooth_kernel_size,
                norm=True, db_min=-96.0, db_max=-12.0) -> np.ndarray:
    voicing = get_energy(sp, mel_len, hop_size, win_size)
    voicing = sinusoidal_smooth(voicing, smooth_kernel_size)
    if norm:
        voicing = np.clip(voicing, db_min, db_max)
        voicing = (voicing - db_min) / (db_max - db_min)
    return voicing.astype(np.float32)


def get_breath(ap, mel_len, hop_size, win_size, smooth_kernel_size,
               norm=True, db_min=-96.0, db_max=-12.0) -> np.ndarray:
    return get_voicing(
        ap, mel_len, hop_size, win_size, smooth_kernel_size, norm, db_min, db_max
    )


def get_kth_harmonic(k, harmonic_part, f0, hop_size, win_size, samplerate,
                     half_width=3.5) -> np.ndarray:
    """Isolate the k-th harmonic by masking +/-half_width STFT bins around
    (k+1)*f0, Nuttall-window analysis/synthesis (``binarizer_utils.py:144-194``)."""
    waveform = np.asarray(harmonic_part, np.float32)[None]
    n_samples = waveform.shape[1]
    f0 = np.asarray(f0, np.float64) * (k + 1)
    pad_size = int(n_samples // hop_size) - len(f0) + 1
    if pad_size > 0:
        f0 = np.pad(f0, (0, pad_size), mode="constant", constant_values=(f0[0], f0[-1]))
    f0, _ = interp_f0(f0, uv=f0 == 0)

    # This helper round-trips the COMPLEX spec through numpy for the f0 bin
    # mask; run its FFT work on the host CPU backend: complex64 device->host
    # readback is UNIMPLEMENTED through the axon TPU relay (measured), and
    # this is the offline binarize path whose data lives on host anyway.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        window = jnp.asarray(nuttall_window(win_size))
        spec = stft_complex(
            jax.device_put(jnp.asarray(waveform), cpu), window, win_size,
            hop_size,
        )  # [1, F, Tf]
    spec = np.asarray(spec).transpose(0, 2, 1)  # [1, Tf, F]
    n_spec_frames, n_specs = spec.shape[1:]

    f0 = f0[None, :, None]  # [1, n_f0_frames, 1]
    idx = np.arange(n_specs)[None, None, :]
    center = f0 * win_size / samplerate
    start = np.clip(center - half_width, 0, None)
    end = np.clip(center + half_width, None, n_specs)
    mask = (center >= 1) & (idx >= start) & (idx < end)  # [1, n_f0, F]
    if mask.shape[1] < n_spec_frames:
        mask = np.pad(mask, [(0, 0), (0, n_spec_frames - mask.shape[1]), (0, 0)])
    spec = spec * mask[:, :n_spec_frames, :]

    with jax.default_device(cpu):
        wav = istft(
            jax.device_put(jnp.asarray(spec.transpose(0, 2, 1)), cpu),
            window, win_size, hop_size, n_samples,
        )
    return np.asarray(wav[0])


def get_tension(sp, mel_len, f0, hop_size, win_size, samplerate,
                smooth_kernel_size, half_width=3.5, domain="logit") -> np.ndarray:
    """sqrt(E_full^2 - E_base^2)/E_full of the harmonic part, in
    ratio/db/logit domain (``binarizer_utils.py:196-213``)."""
    base_sp = get_kth_harmonic(0, sp, f0, hop_size, win_size, samplerate, half_width)
    energy_full = get_energy(sp, mel_len, hop_size, win_size, domain="amplitude")
    energy_base = get_energy(base_sp, mel_len, hop_size, win_size, domain="amplitude")
    tension = np.sqrt(
        np.clip(energy_full ** 2 - energy_base ** 2, 0, None)
    ) / (energy_full + 1e-5)
    if domain == "ratio":
        tension = np.clip(tension, 0, 1)
    elif domain == "db":
        tension = np.clip(tension, 1e-5, 1)
        tension = 20 * np.log10(tension)
    elif domain == "logit":
        tension = np.clip(tension, 1e-4, 1 - 1e-4)
        tension = np.log(tension / (1 - tension))
    return sinusoidal_smooth(tension, smooth_kernel_size)
