"""Web-serving tests: train a tiny model, start the HTTP server, hit the API."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest
import yaml
from click.testing import CliRunner

torch = pytest.importorskip("torch")

from tests.test_cli_e2e import VOCODER_H, _make_torch_vocoder_ckpt

from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


def _request(url, payload=None):
    if payload is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.slow
def test_web_api(tmp_path, monkeypatch):
    from main import main as cli

    monkeypatch.chdir(tmp_path)
    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs")
    voc_path = _make_torch_vocoder_ckpt(str(tmp_path / "nsf_hifigan"))
    hp = small_hparams(data_dir, "svs")
    hp.update(max_updates=4, val_check_interval=100, hop_size=32,
              vocoder_ckpt=voc_path)
    hp.pop("work_dir"); hp.pop("task")
    cfg = str(tmp_path / "config.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)
    runner = CliRunner()
    r = runner.invoke(cli, ["train", "svs", "--config", cfg, "--exp_name", "w"],
                      catch_exceptions=False)
    assert r.exit_code == 0, r.output

    from prodiff_tpu.serve.handler import WebHandler

    handler = WebHandler("w", port=0)  # ephemeral port
    server = handler.make_server()
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://localhost:{port}"
    try:
        code, info = _request(f"{base}/api/basic_info")
        assert code == 200
        assert info["samplerate"] == hp["audio_sample_rate"]
        assert set(info["speakers"]) == {"spk0", "spk1"}
        assert "zh" in info["languages"]

        # infer: 3 phonemes, flat pitch
        code, out = _request(
            f"{base}/api/infer",
            {
                "speaker": "spk0",
                "language": "zh",
                "ph_text_list": ["a", "b", "SP"],
                "ph_dur_list": [0.2, 0.2, 0.1],
                "pitch_list": [57.0] * 43,
            },
        )
        assert code == 200, out
        wav = np.asarray(out["wav"])
        assert len(wav) > 0 and np.isfinite(wav).all()

        # missing field -> 400 with a clear message
        code, err = _request(f"{base}/api/infer", {"speaker": "spk0"})
        assert code == 400
        assert "required" in err["error"]

        # unknown route -> 404
        code, err = _request(f"{base}/api/nope", {})
        assert code == 404
    finally:
        server.shutdown()
