"""Stub modules so the torch reference at /root/reference imports in this
environment (no librosa/chardet/skimage/webrtcvad/pyloudnorm; scipy>=1.13
dropped ``scipy.signal.kaiser``).

The stubs implement only what the exercised reference code paths actually
call; everything else is attribute-present-but-unused.
"""

import sys
import types

import numpy as np


def _note_to_midi(note: str, round_midi: bool = True) -> float:
    from prodiff_tpu.infer.handler import note_to_midi

    v = note_to_midi(note)
    return round(v) if round_midi else v


def _midi_to_hz(midi):
    return 440.0 * (2.0 ** ((np.asarray(midi, np.float64) - 69.0) / 12.0))


def install_reference_stubs():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    sys.modules.setdefault("chardet", types.ModuleType("chardet"))

    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        librosa.__path__ = []  # package, so `import librosa.filters` resolves
        sys.modules["librosa"] = librosa
    librosa = sys.modules["librosa"]
    if not hasattr(librosa, "filters"):
        filters = types.ModuleType("librosa.filters")
        from prodiff_tpu.ops.mel import mel_filterbank

        filters.mel = lambda sr, n_fft, n_mels, fmin, fmax, htk=False: mel_filterbank(
            sr, n_fft, n_mels, fmin, fmax, htk=htk
        )
        librosa.filters = filters
        sys.modules["librosa.filters"] = filters
    if not hasattr(librosa, "sequence"):
        librosa.sequence = types.SimpleNamespace(viterbi=None)
    if not hasattr(librosa, "feature"):
        def _rms(y=None, frame_length=2048, hop_length=512):
            x = np.pad(np.asarray(y, np.float32),
                       (frame_length // 2, frame_length // 2))
            n = 1 + (len(x) - frame_length) // hop_length
            idx = (np.arange(n)[:, None] * hop_length
                   + np.arange(frame_length)[None, :])
            return np.sqrt((x[idx] ** 2).mean(axis=1))[None]

        librosa.feature = types.SimpleNamespace(rms=_rms)
    if not hasattr(librosa, "amplitude_to_db"):
        # librosa semantics: 20*log10(max(|S|, amin)) - 20*log10(ref), with
        # top_db=80 flooring relative to the max
        def _amplitude_to_db(S, ref=1.0, amin=1e-5, top_db=80.0):
            db = 20.0 * np.log10(np.maximum(np.abs(S), amin) / ref)
            if top_db is not None:
                db = np.maximum(db, db.max() - top_db)
            return db

        librosa.amplitude_to_db = _amplitude_to_db
    librosa.note_to_midi = _note_to_midi
    librosa.midi_to_hz = _midi_to_hz

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        skimage.__path__ = []
        transform = types.ModuleType("skimage.transform")
        transform.resize = None  # data_gen_utils imports it; unused in infer
        skimage.transform = transform
        sys.modules["skimage"] = skimage
        sys.modules["skimage.transform"] = transform

    sys.modules.setdefault("webrtcvad", types.ModuleType("webrtcvad"))
    sys.modules.setdefault("pyloudnorm", types.ModuleType("pyloudnorm"))
    sys.modules.setdefault("textgrid", types.ModuleType("textgrid"))
    if "parselmouth" not in sys.modules:
        parselmouth = types.ModuleType("parselmouth")
        parselmouth.Sound = None  # PE registry imports it; unused in infer
        sys.modules["parselmouth"] = parselmouth

    if "torchaudio" not in sys.modules:
        torchaudio = types.ModuleType("torchaudio")
        torchaudio.__path__ = []
        transforms = types.ModuleType("torchaudio.transforms")
        transforms.Resample = None  # rmvpe PE imports it; unused in infer
        torchaudio.transforms = transforms
        sys.modules["torchaudio"] = torchaudio
        sys.modules["torchaudio.transforms"] = transforms

    import scipy.signal

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser

    # the reference hardcodes .cuda() in FastDiff's step embedding; run on cpu
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self

    # the reference's own imports use the lowercase package name, which breaks
    # on case-sensitive filesystems (SURVEY §2.11.1) — alias it
    import importlib

    if "modules.fastdiff" not in sys.modules:
        for lower, real in [
            ("modules.fastdiff", "modules.FastDiff"),
            ("modules.fastdiff.module", "modules.FastDiff.module"),
            ("modules.fastdiff.module.modules", "modules.FastDiff.module.modules"),
            ("modules.fastdiff.module.util", "modules.FastDiff.module.util"),
            ("modules.fastdiff.module.FastDiff_model",
             "modules.FastDiff.module.FastDiff_model"),
        ]:
            sys.modules.setdefault(lower, importlib.import_module(real))
