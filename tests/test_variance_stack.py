"""Variance-predictor stack: models, binarizers, tasks, inferers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from click.testing import CliRunner

from prodiff_tpu.utils.synthetic import small_hparams

HP_SMALL = dict(
    hidden_size=32,
    enc_layers=1,
    enc_ffn_kernel_size=9,
    num_heads=2,
    dropout=0.1,
    use_dur_embed=True,
    use_spk_id=True,
    num_spk=2,
    datasets=[{"speaker": "a"}, {"speaker": "b"}],
    sampling_algorithm="euler",
    schedule_type="vpsde",
    max_beta=40,
    dur_prediction_args=dict(
        num_layers=2, hidden_size=32, dropout=0.1, kernel_size=3,
        log_offset=1.0, loss_type="mse",
        lambda_pdur_loss=0.3, lambda_wdur_loss=1.0, lambda_sdur_loss=0.1,
    ),
    f0_prediction_args=dict(
        spec_min=-8.0, spec_max=8.0, clamp_min=-12.0, clamp_max=12.0,
        repeat_bins=16,
        encoder_args=dict(hidden_size=16, num_layers=1, ffn_kernel_size=9, num_heads=2),
        denoise_args=dict(dilation_cycle_length=1, residual_layers=2, residual_channels=8),
        timesteps=4, timescale=1000, loss_type="mse",
    ),
    vari_prediction_args=dict(
        repeat_bins=16,
        encoder_args=dict(hidden_size=16, num_layers=1, ffn_kernel_size=9, num_heads=2),
        denoise_args=dict(dilation_cycle_length=1, residual_layers=2, residual_channels=8),
        timesteps=4, timescale=1, loss_type="l1:0.5|ssim:0.5",
    ),
    use_voicing_embed=True,
    use_breath_embed=True,
    use_tension_embed=False,
    voicing_db_min=-96.0, voicing_db_max=-12.0,
    breath_db_min=-96.0, breath_db_max=-20.0,
    tension_logit_min=-10.0, tension_logit_max=10.0,
)


def _note_batch(rng, B=2, T_note=4, T_mel=24):
    note_midi = rng.uniform(50, 70, (B, T_note)).astype(np.float32)
    note_rest = np.zeros((B, T_note), bool)
    mel2note = np.repeat(np.arange(1, T_note + 1), T_mel // T_note)[None].repeat(B, 0)
    return jnp.asarray(note_midi), jnp.asarray(note_rest), jnp.asarray(mel2note)


def test_dur_predictor_model(rng):
    from prodiff_tpu.models.duration import DurPredictor

    model = DurPredictor(vocab_size=10, hparams=HP_SMALL)
    tokens = jnp.asarray([[3, 4, 5, 0]])
    onset = jnp.asarray([[1, 0, 1, 0]])
    word_dur = jnp.asarray([[0.5, 0.5, 0.3, 0.0]])
    params = model.init({"params": jax.random.PRNGKey(0)}, tokens, onset, word_dur)
    dur = model.apply(params, tokens, onset, word_dur, infer=True)
    assert dur.shape == (1, 4)
    assert np.all(np.asarray(dur) >= 0)  # clamped at infer
    dur_train = model.apply(
        params, tokens, onset, word_dur, infer=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, deterministic=False,
    )
    assert np.asarray(dur_train).shape == (1, 4)


def test_pitch_predictor_model(rng):
    from prodiff_tpu.models.pitch_predictor import PitchPredictor

    model = PitchPredictor(vocab_size=8, hparams=HP_SMALL)
    B, T_ph, T_mel = 2, 5, 24
    tokens = jnp.asarray(rng.integers(3, 8, (B, T_ph)))
    mel2ph = jnp.asarray(
        np.repeat(np.arange(1, T_ph + 1), T_mel // T_ph)[: T_mel - 4][None].repeat(B, 0)
    )
    mel2ph = jnp.pad(mel2ph, ((0, 0), (0, T_mel - mel2ph.shape[1])))
    note_midi, note_rest, mel2note = _note_batch(rng, B, 4, T_mel)
    pitch = jnp.asarray(rng.uniform(50, 70, (B, T_mel)).astype(np.float32))
    base = jnp.asarray(rng.uniform(50, 70, (B, T_mel)).astype(np.float32))
    retake = jnp.asarray(rng.integers(0, 2, (B, T_mel)).astype(np.int32))
    spk = jnp.zeros((B,), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, tokens, mel2ph, note_midi, note_rest, mel2note, base,
        pitch=pitch, pitch_retake=retake, spk_id=spk,
    )
    v_pred, v_gt, t = model.apply(
        params, tokens, mel2ph, note_midi, note_rest, mel2note, base,
        pitch=pitch, pitch_retake=retake, spk_id=spk,
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    assert v_pred.shape == (B, 1, T_mel, 16)
    delta = model.apply(
        params, tokens, mel2ph, note_midi, note_rest, mel2note, base,
        pitch_expr=jnp.full((B, 1), 0.7), spk_id=spk, infer=True, infer_step=3,
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert delta.shape == (B, T_mel)
    assert np.abs(np.asarray(delta)).max() <= 12.0  # clamped


def test_vari_predictor_model(rng):
    from prodiff_tpu.models.vari_predictor import VariPredictor

    model = VariPredictor(vocab_size=8, hparams=HP_SMALL)
    B, T_ph, T_mel = 1, 4, 24
    tokens = jnp.asarray(rng.integers(3, 8, (B, T_ph)))
    mel2ph = jnp.asarray(np.repeat(np.arange(1, T_ph + 1), T_mel // T_ph)[None])
    note_midi, note_rest, mel2note = _note_batch(rng, B, 4, T_mel)
    f0 = jnp.asarray(rng.uniform(100, 400, (B, T_mel)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-90, -20, (B, 2, T_mel)).astype(np.float32))
    spk = jnp.zeros((B,), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, tokens, mel2ph, note_midi, note_rest, mel2note, f0,
        spk_embed_id=spk, gt_curves=gt,
    )
    x0_pred, x0 = model.apply(
        params, tokens, mel2ph, note_midi, note_rest, mel2note, f0,
        spk_embed_id=spk, gt_curves=gt, rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    # repeat_bins // 2 features = 8
    assert x0_pred.shape == (B, 2, T_mel, 8)
    out = model.apply(
        params, tokens, mel2ph, note_midi, note_rest, mel2note, f0,
        spk_embed_id=spk, infer=True, rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert set(out) == {"voicing", "breath"}
    assert out["voicing"].shape == (B, T_mel)
    # clamped to the voicing db range
    v = np.asarray(out["voicing"])
    assert v.min() >= -96.0 - 1e-4 and v.max() <= -12.0 + 1e-4


def test_dur_inferer_bucket_parity(rng):
    """The jitted dur inferer pads t_ph to a 16-bucket; the encoder masks
    padding end to end, so real-region durations must match the unpadded
    apply exactly (the model is deterministic at infer)."""
    from prodiff_tpu.models.duration import DurPredictor

    model = DurPredictor(vocab_size=10, hparams=HP_SMALL)
    t_ph = 5
    tokens = jnp.asarray(rng.integers(3, 10, (1, t_ph)).astype(np.int32))
    onset = jnp.asarray([[1, 0, 1, 0, 1]])
    word_dur = jnp.asarray([[0.5, 0.5, 0.3, 0.3, 0.2]], jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, tokens, onset, word_dur)
    want = np.asarray(model.apply(params, tokens, onset, word_dur, infer=True))[0]

    pad = 16 - t_ph
    got = np.asarray(
        model.apply(
            params,
            jnp.pad(tokens, ((0, 0), (0, pad))),
            jnp.pad(onset, ((0, 0), (0, pad))),
            jnp.pad(word_dur, ((0, 0), (0, pad))),
            infer=True,
        )
    )[0][:t_ph]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_inferer_jitted_bucketed(tmp_path, rng):
    """Inferer.run pads to buckets and dispatches ONE jitted call (the TPU
    serving contract): same-bucket inputs must not recompile."""
    from prodiff_tpu.infer.inferers import DurPredictorInferer
    from prodiff_tpu.utils.text_encoder import TokenTextEncoder

    hp = dict(HP_SMALL, work_dir=str(tmp_path), data_dir=str(tmp_path),
              task="dur")
    enc = TokenTextEncoder(["SP", "a", "b", "c"], replace_oov="SP")
    inferer = DurPredictorInferer.__new__(DurPredictorInferer)
    inferer.hparams = hp
    inferer.ph_encoder = enc
    from prodiff_tpu.models.duration import DurPredictor

    inferer.model = DurPredictor(len(enc), hp)
    tokens = jnp.zeros((1, 16), jnp.int32)
    inferer.params = inferer.model.init(
        {"params": jax.random.PRNGKey(0)}, tokens,
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 16), jnp.float32),
    )
    d1 = inferer.run(np.array([3, 4, 5], np.int32), [2, 1], [0.5, 0.4])
    n = inferer._jitted_apply._cache_size()
    # different t_ph, same 16-bucket -> no recompile
    d2 = inferer.run(np.array([3, 4, 5, 3, 4], np.int32), [2, 3], [0.5, 0.4])
    assert inferer._jitted_apply._cache_size() == n
    assert d1.shape == (3,) and d2.shape == (5,)
    assert np.isfinite(d1).all() and np.isfinite(d2).all()


def test_force_align_pdur():
    from prodiff_tpu.infer.inferers import DurPredictorInferer

    ph_num = np.array([2, 1])
    ph_dur = np.array([0.2, 0.2, 0.5], np.float64)
    note_dur = np.array([0.8, 1.0])
    out = DurPredictorInferer.force_align_pdur(ph_num, ph_dur, note_dur)
    np.testing.assert_allclose(out[:2].sum(), 0.8, rtol=1e-5)
    np.testing.assert_allclose(out[2], 1.0, rtol=1e-5)


@pytest.mark.slow
def test_dur_and_pitch_binarize_train_cli(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    from scipy.io import wavfile

    raw_dir = tmp_path / "raw"
    (raw_dir / "wav").mkdir(parents=True)
    labels = {}
    sr = 44100
    for i in range(8):
        name = f"it{i}"
        dur = 0.7
        t = np.arange(int(sr * dur)) / sr
        wav = 0.4 * np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))
        wavfile.write(str(raw_dir / "wav" / f"{name}.wav"), sr, (wav * 32767).astype(np.int16))
        labels[name] = {
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

    hp = small_hparams(str(tmp_path / "data"), "dur")
    hp.update(
        datasets=[{"data_dir": str(raw_dir), "speaker": "s0", "language": "zh"}],
        dictionary={"zh": {"phoneme": str(dict_dir / "zh_phones.txt")}},
        languages={"zh": 1},
        test_num=1, valid_num=1,
        pitch_extractor="acf",
        max_updates=3, val_check_interval=100,
        dur_prediction_args=HP_SMALL["dur_prediction_args"],
        f0_prediction_args=HP_SMALL["f0_prediction_args"],
        use_pitch_retake=True,
    )
    hp.pop("work_dir"); hp.pop("task")
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.dump(hp, f)

    from main import main as cli

    runner = CliRunner()
    for task in ["dur", "pitch"]:
        r = runner.invoke(cli, ["binarize", task, "--config", cfg, "--exp_name", "v"],
                          catch_exceptions=False)
        assert r.exit_code == 0, r.output
        r = runner.invoke(cli, ["train", task, "--config", cfg, "--exp_name", "v"],
                          catch_exceptions=False)
        assert r.exit_code == 0, r.output
        assert os.path.exists(f"checkpoints/v/{task}/model_ckpt_steps_3.ckpt")

    # drive the inferers from the trained checkpoints
    from prodiff_tpu.infer.inferers import DurPredictorInferer, PitchPredictorInferer
    from prodiff_tpu.utils.text_encoder import TokenTextEncoder

    with open("data/dur/phone_set.json") as f:
        ph_map = json.load(f)
    enc = TokenTextEncoder(sorted(set(ph_map.values())), replace_oov="SP")
    dur_inf = DurPredictorInferer.from_workdir("v", "checkpoints", enc)
    ph_tokens = np.asarray(enc.encode(["SP", "a", "b"]), np.int32)
    ph_dur = dur_inf.run(ph_tokens, [1, 2], [0.5, 0.2])
    assert ph_dur.shape == (3,)
    np.testing.assert_allclose(ph_dur[0], 0.5, rtol=1e-4)
    np.testing.assert_allclose(ph_dur[1:].sum(), 0.2, rtol=1e-4)

    pitch_inf = PitchPredictorInferer.from_workdir("v", "checkpoints")
    note_midi = np.array([57.0, 57.0])
    note_rest = np.array([False, True])
    f0_midi = pitch_inf.run(note_midi, note_rest, np.array([0.5, 0.2]), 60,
                            512 / 44100, spk_id=0)
    assert f0_midi.shape == (60,)
    assert np.isfinite(f0_midi).all()
