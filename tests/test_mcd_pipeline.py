"""Whole-pipeline MCD cross-check: the SAME .ds segment rendered text->mel->wav
by (a) the torch reference InferHandler (``handler/infer/handler.py:203-359``)
and (b) this framework's SVSInferHandler, both loaded with the SAME
randomly-initialised teacher + NSF-HiFiGAN weights and collapsed to the same
deterministic noise (zeros), must produce audio whose mel cepstral distortion
is ~0 dB (BASELINE.json's quality axis, closing VERDICT round-1 missing #4).
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import install_reference_stubs  # noqa: E402

HP = {
    "audio_num_mel_bins": 16,
    "hidden_size": 32,
    "enc_layers": 2,
    "enc_ffn_kernel_size": 9,
    "dropout": 0.1,
    "num_heads": 2,
    "use_dur_embed": True,
    "use_spk_id": True,
    "num_spk": 2,
    "use_lang_id": True,
    "languages": {"zh": 1},
    "use_gender_id": False,
    "use_voicing_embed": False,
    "use_breath_embed": False,
    "diff_type": "prodiff",
    "timesteps": 4,
    "timescale": 1,
    "schedule_type": "vpsde",
    "max_beta": 40,
    "spec_min": [-12],
    "spec_max": [0],
    "residual_layers": 3,
    "residual_channels": 16,
    "dilation_cycle_length": 1,
    "rel_pos": False,
    "hop_size": 64,
    "win_size": 512,
    "fft_size": 512,
    "audio_sample_rate": 44100,
    "fmin": 40,
    "fmax": 16000,
    "vocoder": "nsfhifigan",
    "seed": 1234,
}

VOCODER_H = {
    "num_mels": 16,
    "sampling_rate": 44100,
    "upsample_initial_channel": 32,
    "upsample_rates": [4, 4, 4],
    "upsample_kernel_sizes": [8, 8, 8],
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "n_fft": 512,
    "win_size": 512,
    "hop_size": 64,
    "fmin": 40,
    "fmax": 16000,
}

PH_MAP = {"SP/zh": "SP", "a/zh": "a", "b/zh": "b", "c/zh": "c"}

SEGMENT = {
    "ph_seq": "a b c SP",
    "ph_dur": "0.20 0.30 0.25 0.05",
    "f0_seq": " ".join(f"{220.0 * 2 ** (i / 96):.2f}" for i in range(16)),
    "f0_timestep": "0.05",
    "lang": "zh",
    "spk_name": "spk0:0.6|spk1:0.4",
    "keyshift": 0,
    "gender": 0.0,
}


def _write_maps(work_dir):
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "phone_set.json"), "w") as f:
        json.dump(PH_MAP, f)
    with open(os.path.join(work_dir, "spk_map.json"), "w") as f:
        json.dump({"spk0": 0, "spk1": 1}, f)
    with open(os.path.join(work_dir, "lang_map.json"), "w") as f:
        json.dump({"zh": 1}, f)


def _make_vocoder_ckpt(dirname):
    import importlib

    models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    torch.manual_seed(7)
    gen = models.Generator(env.AttrDict(VOCODER_H))
    os.makedirs(dirname, exist_ok=True)
    path = os.path.join(dirname, "model")
    torch.save({"generator": gen.state_dict()}, path)
    with open(os.path.join(dirname, "config.json"), "w") as f:
        json.dump(VOCODER_H, f)
    return path


@pytest.mark.slow
def test_whole_pipeline_mcd_vs_reference(tmp_path, monkeypatch):
    install_reference_stubs()
    import importlib

    teacher_mod = importlib.import_module("modules.svs.prodiff_teacher")
    ref_encoder_mod = importlib.import_module("utils.text_encoder")

    hp = dict(HP)
    hp["vocoder_ckpt"] = _make_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))

    # one random-init teacher, shared by both sides
    ph_list = list(sorted(set(PH_MAP.values())))
    ref_enc = ref_encoder_mod.TokenTextEncoder(None, vocab_list=ph_list, replace_oov="SP")
    vocab = len(ref_enc)
    torch.manual_seed(3)
    teacher = teacher_mod.ProDiffTeacher(vocab, hp)
    teacher.eval()
    teacher_sd = teacher.state_dict()

    # ---- reference side: checkpoints/{exp}/svs layout under its own cwd ----
    ref_root = tmp_path / "ref"
    ref_work = ref_root / "checkpoints" / "x" / "svs"
    _write_maps(str(ref_work))
    with open(ref_work / "config.yaml", "w") as f:
        yaml.dump(hp, f)
    torch.save({"state_dict": {"model": teacher_sd}},
               str(ref_work / "model_ckpt_steps_100.ckpt"))

    handler_mod = importlib.import_module("handler.infer.handler")
    monkeypatch.chdir(ref_root)
    # the reference's pred_pitch default (False) is truthy under its own
    # `pred_pitch != ""` check — pass "" as its CLI does
    ref_handler = handler_mod.InferHandler("x", pred_pitch="")

    # collapse all torch randomness to zeros: diffusion x_init (torch.rand),
    # posterior step noise (torch.randn), SineGen phases/noise
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))
    want_wav = ref_handler.infer(dict(SEGMENT))[0]
    monkeypatch.undo()
    monkeypatch.chdir(tmp_path)

    # ---- this framework: same weights converted, deterministic render ----
    from prodiff_tpu.infer.handler import SVSInferHandler
    from prodiff_tpu.utils import ckpt_utils
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    my_work = str(tmp_path / "mine" / "checkpoints" / "x" / "svs")
    _write_maps(my_work)
    with open(os.path.join(my_work, "config.yaml"), "w") as f:
        yaml.dump(hp, f)
    sd_np = {k: v.numpy() for k, v in teacher_sd.items()}
    params = convert_prodiff_teacher(sd_np, hp)
    ckpt_utils.save_checkpoint(
        my_work, 100, {"global_step": 100, "state_dict": params}
    )

    mine = SVSInferHandler(
        "x", checkpoints_root=str(tmp_path / "mine" / "checkpoints"),
        deterministic=True,
    )
    got_wav = mine.infer(dict(SEGMENT))[0]

    assert got_wav.shape == want_wav.shape, (got_wav.shape, want_wav.shape)
    assert np.isfinite(got_wav).all() and np.isfinite(want_wav).all()
    # non-degenerate render (an all-silence pair would trivially pass MCD)
    assert np.abs(want_wav).max() > 1e-3

    # MCD between the two renders (same mel analysis on both)
    import jax.numpy as jnp

    from prodiff_tpu.ops.mel import LOG10_TO_LN, MelSpectrogram
    from prodiff_tpu.ops.metrics import mel_cepstral_distortion

    mel_fn = MelSpectrogram(
        sr=hp["audio_sample_rate"], n_mels=hp["audio_num_mel_bins"],
        n_fft=hp["fft_size"], win_size=hp["win_size"],
        hop_length=hp["hop_size"], fmin=hp["fmin"], fmax=hp["fmax"],
    )
    mel_a = np.asarray(mel_fn.get_mel(jnp.asarray(want_wav[None])))[0].T / LOG10_TO_LN
    mel_b = np.asarray(mel_fn.get_mel(jnp.asarray(got_wav[None])))[0].T / LOG10_TO_LN
    mcd = float(mel_cepstral_distortion(jnp.asarray(mel_a), jnp.asarray(mel_b)))
    print(f"whole-pipeline MCD vs reference: {mcd:.4f} dB")
    assert mcd < 0.5, f"MCD {mcd} dB >= 0.5 dB"
