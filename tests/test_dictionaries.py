"""Shipped-dictionary tests: generator parity, preprocess --lang zh on real
pinyin, and the web pred_dur route driven by the shipped zh table.

The reference ships these tables in ``dictionary/`` and consumes them in
preprocess (``handler/preprocess/handler.py:34-60``), phone-map building
(``component/binarizer/binarizer_utils.py:16-60``) and web pred_dur
(``handler/web/handler.py:80-128``).
"""

import json
import os
import subprocess
import sys
import threading

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DICT = os.path.join(REPO, "dictionary")


def test_generator_reproduces_shipped_tables(tmp_path):
    """dictionary/ is generated data: the generator must reproduce it."""
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_dictionaries.py"),
         "--out", str(tmp_path)],
        check=True, cwd=REPO,
    )
    for fn in ["zh.txt", "jp.txt", "zh_phones.txt", "jp_phones.txt",
               "en_phones.txt", "global.csv"]:
        with open(os.path.join(DICT, fn), "rb") as a, \
                open(tmp_path / fn, "rb") as b:
            assert a.read() == b.read(), f"{fn} drifted from its generator"


def test_zh_table_contents():
    entries = {}
    with open(os.path.join(DICT, "zh.txt")) as f:
        for line in f:
            w, _, p = line.rstrip("\n").partition("\t")
            entries[w] = p
    assert len(entries) == 429
    # the opencpop-extension conventions
    assert entries["zhi"] == "zh ir" and entries["si"] == "s i0"
    assert entries["ye"] == "y E" and entries["yan"] == "y En"
    assert entries["ju"] == "j v" and entries["jv"] == "j v"
    assert entries["lve"] == "l ve"
    # every phone is in the typed inventory
    phones = set()
    with open(os.path.join(DICT, "zh_phones.txt")) as f:
        for line in f:
            phones.add(line.split()[0])
    used = {ph for pron in entries.values() for ph in pron.split()}
    assert used <= phones


def test_en_table_contents():
    phones = set()
    with open(os.path.join(DICT, "en_phones.txt")) as f:
        for line in f:
            phones.add(line.split()[0])
    phones |= {"_r"}  # affrication residual, intentionally absent from typing
    n = 0
    with open(os.path.join(DICT, "en.txt")) as f:
        for line in f:
            w, _, p = line.rstrip("\n").partition("\t")
            assert p and set(p.split()) <= phones, line
            n += 1
    assert n > 130_000
    # spot-check the conventions
    table = dict(
        line.rstrip("\n").split("\t")
        for line in open(os.path.join(DICT, "en.txt"))
        if line.split("\t")[0] in ("tree", "butter", "a", "singing")
    )
    assert table["tree"] == "ch _r iy"
    assert table["butter"] == "b ah dx er"
    assert table["a"] == "ax"


def test_cmudict_converter_rules():
    from tools.build_dictionaries import convert_cmudict_pron

    assert convert_cmudict_pron("T R IY1".split()) == ["ch", "_r", "iy"]
    assert convert_cmudict_pron("D R AY1 V".split()) == ["jh", "_r", "ay", "v"]
    assert convert_cmudict_pron("B AH1 T ER0".split()) == ["b", "ah", "dx", "er"]
    assert convert_cmudict_pron("AH0 B AE1 N D AH0 N".split()) == \
        ["ax", "b", "ae", "n", "d", "ax", "n"]
    # no flap after an unstressed vowel or a consonant r
    assert convert_cmudict_pron("EH1 D AH0 T ER0".split()) == \
        ["eh", "dx", "ax", "t", "er"]
    assert convert_cmudict_pron("P AA1 R T IY0".split()) == \
        ["p", "aa", "r", "t", "iy"]


TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phone"
        xmin = 0
        xmax = 1.0
        intervals: size = 6
        intervals [1]:
            xmin = 0.0
            xmax = 0.2
            text = "SP"
        intervals [2]:
            xmin = 0.2
            xmax = 0.3
            text = "n"
        intervals [3]:
            xmin = 0.3
            xmax = 0.5
            text = "i"
        intervals [4]:
            xmin = 0.5
            xmax = 0.6
            text = "h"
        intervals [5]:
            xmin = 0.6
            xmax = 0.9
            text = "ao"
        intervals [6]:
            xmin = 0.9
            xmax = 1.0
            text = "SP"
"""


def test_preprocess_with_shipped_zh_dictionary(tmp_path):
    """preprocess --lang zh runs out of the box with the shipped typing table
    (full path: TextGrid -> ph_num from zh_phones.txt -> notes from .rawmid)."""
    import pickle

    from prodiff_tpu.preprocess import PreprocessHandler

    data_dir = tmp_path / "raw"
    (data_dir / "TextGrid").mkdir(parents=True)
    (data_dir / "midi").mkdir()
    (data_dir / "TextGrid" / "ni_hao.TextGrid").write_text(TEXTGRID)
    with open(data_dir / "midi" / "ni_hao.rawmid", "wb") as f:
        pickle.dump(
            {"note_midi": [57.0, 57.0, 0.0], "note_rest": [False, False, True],
             "note_dur": [0.5, 0.4, 0.1]},
            f,
        )
    PreprocessHandler(str(data_dir), "zh", dictionary_root=DICT).handle(
        extract_note=True, override_ori_label=True
    )
    with open(data_dir / "label.json") as f:
        label = json.load(f)["ni_hao"]
    assert label["ph_seq"] == "SP n i h ao SP"
    # consonants attach to the previous word: SP+n | i+h | ao | SP
    assert label["ph_num"] == "2 2 1 1"
    assert label["note_seq"] == "A3 A3 rest"
    assert label["note_dur"] == "0.5000 0.4000 0.1000"


@pytest.mark.slow
def test_web_pred_dur_with_shipped_dictionaries(tmp_path, monkeypatch, rng):
    """binarize + train dur with the real zh dictionary, then serve pred_dur
    for real pinyin words through the web API."""
    from click.testing import CliRunner
    from scipy.io import wavfile

    from main import main as cli
    from prodiff_tpu.utils.synthetic import small_hparams
    from tests.test_cli_e2e import _make_torch_vocoder_ckpt
    from tests.test_web import _request

    monkeypatch.chdir(tmp_path)
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))

    raw_dir = tmp_path / "raw"
    (raw_dir / "wav").mkdir(parents=True)
    labels = {}
    sr = 44100
    for i in range(8):
        t = np.arange(int(sr * 1.0)) / sr
        wav = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        wavfile.write(str(raw_dir / "wav" / f"it{i}.wav"), sr,
                      (wav * 32767).astype(np.int16))
        labels[f"it{i}"] = {
            "ph_seq": "SP n i h ao SP",
            "ph_dur": "0.2 0.1 0.2 0.1 0.3 0.1",
            "ph_num": "2 2 1 1",
            "note_seq": "A3 A3 A3 rest",
            "note_dur": "0.3 0.3 0.3 0.1",
        }
    with open(raw_dir / "label.json", "w") as f:
        json.dump(labels, f)

    data_dir = str(tmp_path / "data")
    common = dict(
        datasets=[{"data_dir": str(raw_dir), "speaker": "spk0", "language": "zh"}],
        dictionary={
            "global": os.path.join(DICT, "global.csv"),
            "zh": {
                "word": os.path.join(DICT, "zh.txt"),
                "phoneme": os.path.join(DICT, "zh_phones.txt"),
            },
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
    # binarize the svs task from the REAL zh phones so the exp's
    # phone_set.json contains the shipped inventory, then train svs + dur
    for task in ["svs", "dur"]:
        r = runner.invoke(cli, ["binarize", task, "--config", cfg,
                                "--exp_name", "dict1"], catch_exceptions=False)
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["train", task, "--config", cfg,
                                "--exp_name", "dict1"], catch_exceptions=False)
        assert r.exit_code == 0, r.output

    from prodiff_tpu.serve.handler import WebHandler

    handler = WebHandler("dict1", port=0)
    server = handler.make_server()
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        code, out = _request(
            f"http://localhost:{port}/api/pred_dur",
            {
                "language": "zh",
                "word_list": ["ni", "hao", "SP"],
                "word_dur_list": [0.4, 0.5, 0.1],
                "start_time": 1.0,
            },
        )
        assert code == 200, out
        phones = [p["ph"] for grp in out["note_ph_list"] for p in grp]
        # the shipped zh.txt expanded the words (ni -> n i, hao -> h ao);
        # n/i are merged to global symbols via global.csv, h/ao stay
        # language-qualified — the same mapped ph_text the reference returns
        assert phones == ["SP", "n", "i", "h/zh", "ao/zh", "SP"]
        # timings are contiguous and non-negative
        times = [(p["start_time"], p["end_time"])
                 for grp in out["note_ph_list"] for p in grp]
        assert all(e >= s for s, e in times)
        assert all(abs(times[i + 1][0] - times[i][1]) < 1e-6
                   for i in range(len(times) - 1))
    finally:
        server.shutdown()
