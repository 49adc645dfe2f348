"""Shape/behaviour tests for the flax model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.diffusion import GaussianDiffusion
from prodiff_tpu.models.encoder import FastspeechEncoder, NoteEncoder
from prodiff_tpu.models.prodiff import ProDiffTeacher
from prodiff_tpu.models.reflow import RectifiedFlow
from prodiff_tpu.models.wavenet import WaveNet

HP = {
    "audio_num_mel_bins": 16,
    "hidden_size": 32,
    "enc_layers": 2,
    "enc_ffn_kernel_size": 9,
    "dropout": 0.1,
    "num_heads": 2,
    "use_dur_embed": True,
    "use_spk_id": True,
    "num_spk": 3,
    "use_lang_id": True,
    "languages": {"zh": 1, "jp": 2},
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
}


def _batch(rng, B=2, T_ph=6, T_mel=20):
    tokens = rng.integers(3, 10, size=(B, T_ph))
    tokens[:, -1] = 0  # padding
    dur = rng.integers(1, 5, size=(B, T_ph))
    dur[:, -1] = 0
    cum = np.cumsum(dur, 1)
    mel2ph = np.zeros((B, T_mel), np.int32)
    for b in range(B):
        pos = 0
        for k in range(T_ph):
            mel2ph[b, pos : min(pos + dur[b, k], T_mel)] = k + 1
            pos += dur[b, k]
    f0 = rng.uniform(100, 400, size=(B, T_mel)).astype(np.float32)
    mel = rng.normal(size=(B, T_mel, HP["audio_num_mel_bins"])).astype(np.float32)
    lang = np.ones((B, T_ph), np.int32) * (tokens > 0)
    spk = np.zeros((B,), np.int32)
    return (
        jnp.asarray(tokens),
        jnp.asarray(mel2ph),
        jnp.asarray(f0),
        jnp.asarray(mel),
        jnp.asarray(lang),
        jnp.asarray(spk),
    )


def test_fastspeech_encoder_shapes_and_padding(rng):
    enc = FastspeechEncoder(vocab_size=12, hidden_size=32, num_layers=2)
    tokens = jnp.asarray([[3, 4, 5, 0, 0], [6, 7, 8, 9, 0]])
    params = enc.init(jax.random.PRNGKey(0), tokens)
    out = enc.apply(params, tokens)
    assert out.shape == (2, 5, 32)
    # padded positions are exactly zero
    assert np.all(np.asarray(out)[0, 3:] == 0)
    assert np.all(np.asarray(out)[1, 4:] == 0)
    assert np.any(np.asarray(out)[0, :3] != 0)


def test_note_encoder(rng):
    enc = NoteEncoder(hidden_size=32, num_layers=1)
    midi = jnp.asarray([[60.0, 62.0, -1.0]])
    rest = jnp.asarray([[False, True, False]])
    dur = jnp.asarray([[0.5, 0.25, 0.0]])
    params = enc.init(jax.random.PRNGKey(0), midi, rest, dur)
    out = enc.apply(params, midi, rest, dur)
    assert out.shape == (1, 3, 32)
    assert np.all(np.asarray(out)[0, 2] == 0)  # padding (midi<0) masked


def test_wavenet_shapes(rng):
    net = WaveNet(in_dims=16, hidden_size=32, residual_layers=3, residual_channels=8)
    x = jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
    t = jnp.asarray([0, 3])
    cond = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, t, cond)
    out = net.apply(params, x, t, cond)
    assert out.shape == (2, 10, 16)
    # zero-init output conv -> output is exactly zero at init
    assert np.all(np.asarray(out) == 0)


def _make_diffusion(**kw):
    net = WaveNet(in_dims=kw.get("out_dims", 16) * kw.get("num_features", 1),
                  hidden_size=32, residual_layers=2, residual_channels=8)
    defaults = dict(denoise_fn=net, out_dims=16, timesteps=4,
                    schedule_type="vpsde", max_beta=40.0)
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


def test_gaussian_diffusion_train_and_infer(rng):
    diff = _make_diffusion()
    cond = jnp.asarray(rng.normal(size=(2, 12, 32)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(2, 1, 12, 16)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = diff.init(rngs, cond, gt_spec=gt, infer=False)
    x0_pred, x0 = diff.apply(
        params, cond, gt_spec=gt, infer=False, rngs={"diffusion": jax.random.PRNGKey(2)}
    )
    assert x0_pred.shape == gt.shape and x0.shape == gt.shape
    sample = diff.apply(
        params, cond, infer=True, infer_step=4,
        rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert sample.shape == (2, 1, 12, 16)
    assert np.isfinite(np.asarray(sample)).all()


def test_multivari_diffusion_clamp_and_repeat(rng):
    diff = _make_diffusion(
        out_dims=8,
        num_features=2,
        repeat_bins=8,
        clamp_ranges=((-1.0, 1.0), (None, None)),
    )
    cond = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
    curves = jnp.asarray(rng.normal(size=(1, 2, 10)).astype(np.float32) * 3)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = diff.init(rngs, cond, gt_spec=curves, infer=False)
    x0_pred, x0 = diff.apply(
        params, cond, gt_spec=curves, infer=False,
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    assert x0.shape == (1, 2, 10, 8)
    assert np.asarray(x0)[:, 0].max() <= 1.0  # clamped feature
    out = diff.apply(
        params, cond, infer=True, rngs={"diffusion": jax.random.PRNGKey(3)}
    )
    assert out.shape == (1, 2, 10)


def test_reflow_train_and_sampling_algorithms(rng):
    cond = jnp.asarray(rng.normal(size=(1, 8, 32)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(1, 1, 8, 16)).astype(np.float32) * -6)
    for algo in ["euler", "rk2", "rk4", "rk5"]:
        net = WaveNet(in_dims=16, hidden_size=32, residual_layers=2, residual_channels=8)
        flow = RectifiedFlow(
            denoise_fn=net, out_dims=16, sampling_algorithm=algo,
            spec_min=(-12.0,), spec_max=(0.0,),
        )
        rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
        params = flow.init(rngs, cond, gt_spec=gt, infer=False)
        v_pred, v_gt, t = flow.apply(
            params, cond, gt_spec=gt, infer=False,
            rngs={"diffusion": jax.random.PRNGKey(2)},
        )
        assert v_pred.shape == (1, 1, 8, 16)
        assert t.shape == (1,)
        out = flow.apply(
            params, cond, infer=True, infer_step=3,
            rngs={"diffusion": jax.random.PRNGKey(3)},
        )
        assert out.shape == (1, 1, 8, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_reflow_norm_denorm_roundtrip(rng):
    net = WaveNet(in_dims=16, hidden_size=8, residual_layers=1, residual_channels=4)
    flow = RectifiedFlow(denoise_fn=net, out_dims=16, spec_min=(-12.0,), spec_max=(0.0,))
    x = jnp.asarray(rng.uniform(-12, 0, size=(1, 1, 5, 16)).astype(np.float32))
    normed = flow.norm_spec(x)
    assert np.asarray(normed).min() >= -1.001 and np.asarray(normed).max() <= 1.001
    np.testing.assert_allclose(np.asarray(flow.denorm_spec(normed)), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("diff_type", ["prodiff", "reflow"])
def test_prodiff_teacher_end_to_end(rng, diff_type):
    hp = dict(HP, diff_type=diff_type)
    model = ProDiffTeacher(vocab_size=12, hparams=hp)
    tokens, mel2ph, f0, mel, lang, spk = _batch(rng)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, gt_spec=mel
    )
    if diff_type == "prodiff":
        x0_pred, x0 = model.apply(
            params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            gt_spec=mel, rngs={"diffusion": jax.random.PRNGKey(2)},
        )
        assert x0_pred.shape == (2, 1, 20, 16)
    else:
        v_pred, v_gt, t = model.apply(
            params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            gt_spec=mel, rngs={"diffusion": jax.random.PRNGKey(2)},
        )
        assert v_pred.shape == (2, 1, 20, 16)
    out = model.apply(
        params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
        infer=True, rngs={"diffusion": jax.random.PRNGKey(3)},
    )
    assert out.shape == (2, 20, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_teacher_under_jit(rng):
    model = ProDiffTeacher(vocab_size=12, hparams=HP)
    tokens, mel2ph, f0, mel, lang, spk = _batch(rng)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, gt_spec=mel
    )

    @jax.jit
    def infer_fn(params, tokens, mel2ph, f0, lang, spk, rng):
        return model.apply(
            params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            infer=True, rngs={"diffusion": rng},
        )

    out = infer_fn(params, tokens, mel2ph, f0, lang, spk, jax.random.PRNGKey(9))
    assert out.shape == (2, 20, 16)


def test_gender_conditioning(rng):
    """gender_embed_id reads the gender table (reference bug §2.11.9 fixed) and
    the mix-embedding path works."""
    hp = dict(HP, use_gender_id=True)
    model = ProDiffTeacher(vocab_size=12, hparams=hp)
    tokens, mel2ph, f0, mel, lang, spk = _batch(rng)
    gender = jnp.zeros((2,), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    params = model.init(
        rngs, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
        gender_embed_id=gender, gt_spec=mel,
    )
    assert "gender_embed" in params["params"]
    cond_m = model.apply(
        params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
        gender_embed_id=jnp.zeros((2,), jnp.int32),
        method=ProDiffTeacher.forward_condition,
    )
    cond_f = model.apply(
        params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
        gender_embed_id=jnp.ones((2,), jnp.int32),
        method=ProDiffTeacher.forward_condition,
    )
    assert not np.allclose(np.asarray(cond_m), np.asarray(cond_f))
    # id path must equal the equivalent one-hot mix (proves the right table)
    table = np.asarray(params["params"]["gender_embed"]["embedding"])
    mix = jnp.asarray(table[1][None, None, :])
    cond_mix = model.apply(
        params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
        gender_mix_embed=mix,
        method=ProDiffTeacher.forward_condition,
    )
    np.testing.assert_allclose(
        np.asarray(cond_f), np.asarray(cond_mix), atol=1e-6
    )
