"""infer --isolate_aspiration/--isolate_base_harmonic through a synthesized
VR checkpoint (covers separation.py + k-th-harmonic isolation end-to-end)."""

import json
import os
import sys

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

torch = pytest.importorskip("torch")

from tests.test_cli_e2e import _make_torch_vocoder_ckpt

from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


def _make_torch_vr_ckpt(dirname):
    sys.path.insert(0, "/root/reference")
    import importlib

    vr_nets = importlib.import_module("modules.vr.nets")
    torch.manual_seed(0)
    n_fft, hop = 256, 128
    model = vr_nets.CascadedNet(
        n_fft, hop, nout=8, nout_lstm=16, is_complex=True, is_mono=True
    )
    os.makedirs(dirname, exist_ok=True)
    path = os.path.join(dirname, "model.pt")
    torch.save(model.state_dict(), path)
    with open(os.path.join(dirname, "config.yaml"), "w") as f:
        yaml.dump(
            {"n_fft": n_fft, "hop_length": hop, "n_out": 8, "n_out_lstm": 16,
             "is_mono": True},
            f,
        )
    return path


@pytest.mark.slow
def test_infer_isolate_aspiration(tmp_path, monkeypatch):
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs")
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))
    vr_path = _make_torch_vr_ckpt(str(tmp_path / "vr"))

    hp = small_hparams(data_dir, "svs")
    hp.update(max_updates=4, val_check_interval=100, hop_size=32,
              vocoder_ckpt=voc_path, vr_ckpt=vr_path, win_size=256)
    hp.pop("work_dir"); hp.pop("task")
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)
    runner = CliRunner()
    r = runner.invoke(cli, ["train", "svs", "--config", cfg, "--exp_name", "iso"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output

    seg = {
        "ph_seq": "a b SP",
        "ph_dur": "0.3 0.3 0.1",
        "f0_seq": " ".join(["220.0"] * 15),
        "f0_timestep": "0.05",
        "offset": 0.0,
    }
    with open("song.ds", "w") as f:
        json.dump([seg], f)
    r = runner.invoke(
        cli,
        ["infer", "song.ds", "--exp_name", "iso", "--spk_name", "spk0",
         "--lang", "zh", "--isolate_aspiration", "--isolate_base_harmonic"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    outs = sorted(os.listdir("infer_out"))
    # three tracks: harmonic-minus-base (sp), aperiodic (ap), base harmonic (bh)
    suffixes = {f.split("【")[0].split("_")[-1] for f in outs}
    assert suffixes == {"sp", "ap", "bh"}
    from scipy.io import wavfile

    tracks = [wavfile.read(os.path.join("infer_out", f))[1] for f in outs]
    assert all(np.isfinite(t).all() for t in tracks)
    assert len({len(t) for t in tracks}) == 1  # equal lengths


@pytest.mark.slow
def test_vari_binarize_and_train(tmp_path, monkeypatch, rng):
    """The vari task end-to-end: VR separation -> voicing/breath/tension curves
    -> multi-feature diffusion training (needs a VR ckpt, synthesized here)."""
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    from scipy.io import wavfile

    raw_dir = tmp_path / "raw"
    (raw_dir / "wav").mkdir(parents=True)
    labels = {}
    sr = 44100
    for i in range(6):
        t = np.arange(int(sr * 0.6)) / sr
        wav = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        wavfile.write(str(raw_dir / "wav" / f"it{i}.wav"), sr, (wav * 32767).astype(np.int16))
        labels[f"it{i}"] = {
            "ph_seq": "SP a b",
            "ph_dur": "0.2 0.2 0.2",
            "note_seq": "A3 rest",
            "note_dur": "0.4 0.2",
        }
    with open(raw_dir / "label.json", "w") as f:
        json.dump(labels, f)
    dict_dir = tmp_path / "dictionary"
    dict_dir.mkdir()
    (dict_dir / "zh_phones.txt").write_text("a vowel vowel\nb consonant stop\n")
    vr_path = _make_torch_vr_ckpt(str(tmp_path / "vr"))

    hp = small_hparams(str(tmp_path / "data"), "vari")
    hp.update(
        datasets=[{"data_dir": str(raw_dir), "speaker": "s0", "language": "zh"}],
        dictionary={"zh": {"phoneme": str(dict_dir / "zh_phones.txt")}},
        languages={"zh": 1},
        test_num=1, valid_num=1,
        pitch_extractor="acf",
        vr_ckpt=vr_path,
        win_size=256,
        max_updates=3, val_check_interval=100,
        use_voicing_embed=True, use_breath_embed=True, use_tension_embed=True,
        binarization_args=dict(
            with_phoneme=True, with_note=True, with_spk_id=True,
            with_lang_id=True, with_voicing=True, with_breath=True,
            with_tension=True, shuffle=False,
        ),
        vari_prediction_args=dict(
            repeat_bins=12,
            encoder_args=dict(hidden_size=16, num_layers=1, ffn_kernel_size=9, num_heads=2),
            denoise_args=dict(dilation_cycle_length=1, residual_layers=2, residual_channels=8),
            timesteps=4, timescale=1, loss_type="l1:0.5|ssim:0.5",
        ),
    )
    hp.pop("work_dir"); hp.pop("task")
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)
    runner = CliRunner()
    r = runner.invoke(cli, ["binarize", "vari", "--config", cfg, "--exp_name", "v"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    from prodiff_tpu.utils.indexed_datasets import IndexedDataset

    ds = IndexedDataset(str(tmp_path / "data" / "vari"), "train")
    item = ds[0]
    for key in ["voicing", "breath", "tension", "note_midi", "mel2note", "f0"]:
        assert key in item, key
        assert np.isfinite(np.asarray(item[key], np.float64)).all(), key
    r = runner.invoke(cli, ["train", "vari", "--config", cfg, "--exp_name", "v"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    assert os.path.exists("checkpoints/v/vari/model_ckpt_steps_3.ckpt")
