"""End-to-end CLI test: train svs -> infer a .ds project -> wav on disk.

Covers the minimum end-to-end slice of SURVEY.md §7.3 (given ph_dur/f0, no aux
predictors) including the torch-vocoder-checkpoint conversion path.
"""

import json
import os
import sys

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

torch = pytest.importorskip("torch")

from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams

VOCODER_H = {
    "num_mels": 16,
    "sampling_rate": 44100,
    "upsample_initial_channel": 32,
    "upsample_rates": [4, 4, 2],
    "upsample_kernel_sizes": [8, 8, 4],
    "resblock": "1",
    "resblock_kernel_sizes": [3, 7],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
    "n_fft": 512,
    "win_size": 512,
    "hop_size": 32,
    "fmin": 40,
    "fmax": 16000,
}


def _make_torch_vocoder_ckpt(dirname):
    sys.path.insert(0, "/root/reference")
    import importlib

    models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    torch.manual_seed(0)
    gen = models.Generator(env.AttrDict(VOCODER_H))
    os.makedirs(dirname, exist_ok=True)
    path = os.path.join(dirname, "model")
    torch.save({"generator": gen.state_dict()}, path)
    with open(os.path.join(dirname, "config.json"), "w") as f:
        json.dump(VOCODER_H, f)
    return path


@pytest.mark.slow
def test_train_then_infer_cli(tmp_path, monkeypatch):
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs")
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))

    hp = small_hparams(data_dir, "svs")
    hp.update(
        max_updates=8,
        val_check_interval=8,
        hop_size=32,  # matches the tiny vocoder's upsample product
        audio_sample_rate=44100,
        vocoder_ckpt=voc_path,
        num_valid_plots=1,
    )
    hp.pop("work_dir")
    hp.pop("task")
    cfg_fn = str(tmp_path / "config.yaml")
    with open(cfg_fn, "w") as f:
        yaml.dump(hp, f)

    runner = CliRunner()
    res = runner.invoke(
        cli, ["train", "svs", "--config", cfg_fn, "--exp_name", "t1"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert os.path.exists("checkpoints/t1/svs/model_ckpt_steps_8.ckpt")

    # minimal .ds: two segments with given durations and pitch
    seg = {
        "ph_seq": "a b c SP",
        "ph_dur": "0.2 0.3 0.25 0.1",
        "f0_seq": " ".join(["220.0"] * 18),
        "f0_timestep": "0.05",
        "offset": 0.0,
    }
    seg2 = dict(seg, offset=1.2)
    proj_fn = str(tmp_path / "song.ds")
    with open(proj_fn, "w") as f:
        json.dump([seg, seg2], f)

    res = runner.invoke(
        cli,
        [
            "infer", proj_fn, "--exp_name", "t1",
            "--spk_name", "spk0:0.5|spk1:0.5", "--lang", "zh",
            "--keyshift", "2",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    outs = os.listdir("infer_out")
    assert len(outs) == 1 and outs[0].endswith(".wav")
    from scipy.io import wavfile

    sr, wav = wavfile.read(os.path.join("infer_out", outs[0]))
    assert sr == 44100
    # 2 segments: second offset at 1.2s plus its duration (0.85s)
    assert len(wav) >= int(1.2 * sr)
    assert np.isfinite(wav).all()

    # batched-segment serving parity: same-bucket segments rendered in ONE
    # acoustic+vocoder dispatch must match per-segment renders
    from prodiff_tpu.infer.handler import SVSInferHandler

    h = SVSInferHandler("t1", deterministic=True)
    segs = [
        dict(seg, lang="zh", spk_name="spk0", keyshift=0),
        dict(seg2, lang="zh", spk_name="spk1", keyshift=0),
    ]
    prepared = [h.prepare(s) for s in segs]
    batched = h.render_batch(prepared)
    singles = [h.render_batch([p])[0] for p in prepared]
    assert len(batched) == 2
    for got, want in zip(batched, singles):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_vocode_wav2wav_cli(tmp_path, monkeypatch):
    """`vocode wav2wav` copy-synthesis: wav -> mel+f0 -> vocoder -> wav on
    disk (reference ``main.py:70-101``), including the keyshift path."""
    from main import main as cli
    from prodiff_tpu.utils.audio import save_wav

    monkeypatch.chdir(tmp_path)
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))

    sr = 44100
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav_fn = str(tmp_path / "in.wav")
    save_wav(wav, wav_fn, sr)

    cfg = {
        "audio_sample_rate": sr,
        "audio_num_mel_bins": VOCODER_H["num_mels"],
        "fft_size": VOCODER_H["n_fft"],
        "win_size": VOCODER_H["win_size"],
        "hop_size": VOCODER_H["hop_size"],
        "fmin": VOCODER_H["fmin"],
        "fmax": VOCODER_H["fmax"],
        "vocoder": "nsfhifigan",
        "vocoder_ckpt": voc_path,
        "pitch_extractor": "parselmouth",  # exercises the ACF fallback
        "interp_uv": True,
    }
    cfg_fn = str(tmp_path / "voc_config.yaml")
    with open(cfg_fn, "w") as f:
        yaml.dump(cfg, f)

    out_dir = str(tmp_path / "out")
    runner = CliRunner()
    res = runner.invoke(
        cli,
        ["vocode", "wav2wav", wav_fn, "--config", cfg_fn,
         "--keyshift", "2", "--output_dir", out_dir],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    out_fn = os.path.join(out_dir, "in.wav")
    assert os.path.exists(out_fn)
    from prodiff_tpu.utils.audio import load_wav

    out_wav, out_sr = load_wav(out_fn, sr=sr)
    assert out_sr == sr
    assert len(out_wav) > sr // 2 and np.isfinite(out_wav).all()
