"""Progressive-distillation loop: teacher -> svs_rectified binarize ->
student train -> merge_rectified (SURVEY §3.5)."""

import json
import os

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


def _write_raw_dataset(tmp_path, rng, n=8):
    from scipy.io import wavfile

    raw_dir = tmp_path / "raw_spk0"
    (raw_dir / "wav").mkdir(parents=True)
    labels = {}
    sr = 44100
    for i in range(n):
        name = f"item{i}"
        dur = float(rng.uniform(0.5, 0.8))
        t = np.arange(int(sr * dur)) / sr
        wav = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        wavfile.write(str(raw_dir / "wav" / f"{name}.wav"), sr, (wav * 32767).astype(np.int16))
        d1, d2 = dur * 0.3, dur * 0.4
        labels[name] = {
            "ph_seq": "SP a b",
            "ph_dur": f"{d1:.4f} {d2:.4f} {dur - d1 - d2:.4f}",
        }
    with open(raw_dir / "label.json", "w") as f:
        json.dump(labels, f)
    dict_dir = tmp_path / "dictionary"
    dict_dir.mkdir(exist_ok=True)
    (dict_dir / "zh_phones.txt").write_text("a vowel vowel\nb consonant stop\n")
    return raw_dir, dict_dir


@pytest.mark.slow
def test_full_distillation_loop(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    raw_dir, dict_dir = _write_raw_dataset(tmp_path, rng)
    base = small_hparams(str(tmp_path / "data"), "svs")
    base.update(
        datasets=[{"data_dir": str(raw_dir), "speaker": "spk0", "language": "zh"}],
        dictionary={"zh": {"phoneme": str(dict_dir / "zh_phones.txt")}},
        languages={"zh": 1},
        test_num=1,
        valid_num=1,
        pitch_extractor="acf",
        audio_num_mel_bins=16,
        max_updates=4,
        val_check_interval=100,
        num_spk=1,
    )
    base.pop("work_dir"); base.pop("task")
    cfg = str(tmp_path / "config.yaml")
    with open(cfg, "w") as f:
        yaml.dump(base, f)

    from main import main as cli

    runner = CliRunner()
    # 1. binarize + train the teacher
    r = runner.invoke(cli, ["binarize", "svs", "--config", cfg, "--exp_name", "t"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    r = runner.invoke(cli, ["train", "svs", "--config", cfg, "--exp_name", "t"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    teacher_dir = "checkpoints/t/svs"

    # 2. distillation dataset from the frozen teacher
    distill_cfg = dict(base, teacher_ckpt=teacher_dir, timesteps=1)
    cfg2 = str(tmp_path / "config_rect.yaml")
    with open(cfg2, "w") as f:
        yaml.dump(distill_cfg, f)
    r = runner.invoke(cli, ["binarize", "svs_rectified", "--config", cfg2,
                            "--exp_name", "t"], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    from prodiff_tpu.utils.indexed_datasets import IndexedDataset

    ds = IndexedDataset(str(tmp_path / "data" / "svs_rectified"), "train")
    item = ds[0]
    assert item["condition"].shape[1] == base["hidden_size"]
    assert item["x_T"].shape == item["x_0"].shape == item["mel"].shape

    # 3. train the 1-step student on the pairs
    r = runner.invoke(cli, ["train", "svs_rectified", "--config", cfg2,
                            "--exp_name", "t"], catch_exceptions=False)
    assert r.exit_code == 0, r.output

    # 4. splice the student diffusion back into the teacher ckpt
    from prodiff_tpu.utils.ckpt_utils import get_last_checkpoint_path, load_checkpoint_file

    tgt = get_last_checkpoint_path(teacher_dir)
    comp = get_last_checkpoint_path("checkpoints/t/svs_rectified")
    r = runner.invoke(cli, ["merge_rectified", tgt, comp], catch_exceptions=False)
    assert r.exit_code == 0, r.output
    merged = load_checkpoint_file(tgt + ".merged.ckpt")
    student = load_checkpoint_file(comp)
    got = merged["state_dict"]["params"]["diffusion"]["denoise_fn"]["mlp_0"]["Dense_0"]["kernel"]
    want = student["state_dict"]["params"]["denoise_fn"]["mlp_0"]["Dense_0"]["kernel"]
    np.testing.assert_array_equal(got, want)
