"""Serving warm-start: ``SVSInferHandler.precompile`` compiles the bucket
programs up front so the FIRST real request triggers no new XLA compile
(round-4 verdict #8; reference analogue: WebHandler builds everything at init,
``handler/web/handler.py:27-128`` — torch is eager so it pays no per-shape
compile, here the bucket set is compiled ahead instead)."""

import os

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

torch = pytest.importorskip("torch")

from tests.test_cli_e2e import _make_torch_vocoder_ckpt

from prodiff_tpu.data.collate import round_up
from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


def test_precompile_first_request_no_compile(tmp_path, monkeypatch):
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs")
    voc = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))
    hp = small_hparams(data_dir, "svs")
    hp.update(max_updates=2, val_check_interval=100, hop_size=32,
              num_sanity_val_steps=0, vocoder_ckpt=voc)
    hp.pop("work_dir")
    hp.pop("task")
    cfg = str(tmp_path / "config.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)
    r = CliRunner().invoke(
        cli, ["train", "svs", "--config", cfg, "--exp_name", "p"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output

    from prodiff_tpu.infer.handler import SVSInferHandler

    h = SVSInferHandler("p", deterministic=True)
    seg = {
        "ph_seq": "a b c SP",
        "ph_dur": "0.2 0.3 0.25 0.1",
        "f0_seq": " ".join(["220.0"] * 18),
        "f0_timestep": "0.05",
        "lang": "zh",
        "spk_name": "spk0",
        "keyshift": 0,
    }
    p = h.prepare(seg)
    bucket = (round_up(p["t_ph"], 16), round_up(p["mel_len"], h.mel_bucket))
    compiled = h.precompile(buckets=[bucket])
    assert compiled == [(1, bucket[0], bucket[1])]

    # the first request after a warm precompile must hit ONLY cached programs
    n_ac = h._acoustic_fn._cache_size()
    n_voc = h.vocoder._jitted._cache_size()
    assert n_ac >= 1 and n_voc >= 1
    wav = h.render_batch([p])[0]
    assert np.isfinite(wav).all()
    assert wav.shape[0] == p["mel_len"] * h.hop_size
    assert h._acoustic_fn._cache_size() == n_ac
    assert h.vocoder._jitted._cache_size() == n_voc

    # a different bucket DOES compile (sanity that the counter detects misses)
    p2 = h.prepare(dict(seg, ph_dur="0.9 1.1 0.9 0.6",
                        f0_seq=" ".join(["220.0"] * 70)))
    bucket2 = (round_up(p2["t_ph"], 16), round_up(p2["mel_len"], h.mel_bucket))
    assert bucket2 != bucket
    h.render_batch([p2])
    assert h._acoustic_fn._cache_size() == n_ac + 1
