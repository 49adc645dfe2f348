"""Vocoder registry (mirrors ``component/vocoder/base_vocoder.py:23-37``)."""

from __future__ import annotations

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(name: str):
    from prodiff_tpu.vocoders import nsf_hifigan  # noqa: F401

    try:
        from prodiff_tpu.vocoders import fastdiff  # noqa: F401
        from prodiff_tpu.vocoders import hifigan  # noqa: F401
    except ImportError:
        pass
    if name.lower() not in VOCODERS:
        raise ValueError(f"Vocoder {name} not found in {sorted(VOCODERS)}")
    return VOCODERS[name.lower()]


class BaseVocoder:
    def __init__(self, hparams: dict):
        self.hparams = hparams

    def spec2wav(self, mel, **kwargs):
        """mel: [T, M] log10-mel -> wav [T']"""
        raise NotImplementedError

    @staticmethod
    def wav2spec(wav_fn: str, hparams: dict, keyshift=0, speed=1):
        raise NotImplementedError
