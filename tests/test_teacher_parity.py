"""Golden parity: flax ProDiffTeacher vs the torch reference with converted
weights — covers the full deterministic compute path (encoder + length
regulation + conditioning, and the WaveNet denoiser on fixed inputs)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
    "rel_pos": False,
}
VOCAB = 12


@pytest.fixture(scope="module")
def torch_teacher():
    sys.path.insert(0, "/root/reference")
    sys.modules.setdefault("chardet", types.ModuleType("chardet"))
    import importlib

    mod = importlib.import_module("modules.svs.prodiff_teacher")
    torch.manual_seed(0)
    teacher = mod.ProDiffTeacher(VOCAB, HP)
    teacher.eval()
    return teacher


def _inputs(rng, B=2, T_ph=6, T_mel=20):
    tokens = rng.integers(3, VOCAB, (B, T_ph)).astype(np.int64)
    tokens[:, -1] = 0
    dur = rng.integers(1, 5, (B, T_ph))
    dur[:, -1] = 0
    mel2ph = np.zeros((B, T_mel), np.int64)
    for b in range(B):
        pos = 0
        for k in range(T_ph):
            mel2ph[b, pos : min(pos + dur[b, k], T_mel)] = k + 1
            pos += dur[b, k]
    f0 = rng.uniform(100, 400, (B, T_mel)).astype(np.float32)
    lang = (np.ones((B, T_ph)) * (tokens > 0)).astype(np.int64)
    spk = np.zeros((B,), np.int64)
    return tokens, mel2ph, f0, lang, spk


def test_forward_condition_parity(torch_teacher, rng):
    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    sd = {k: v.numpy() for k, v in torch_teacher.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_prodiff_teacher(sd, HP))
    jteacher = ProDiffTeacher(VOCAB, HP)

    tokens, mel2ph, f0, lang, spk = _inputs(rng)
    with torch.no_grad():
        want = torch_teacher.forward_condition(
            torch.from_numpy(tokens), torch.from_numpy(mel2ph),
            torch.from_numpy(f0), lang_seq=torch.from_numpy(lang),
            spk_embed_id=torch.from_numpy(spk),
        ).numpy()
    got = np.asarray(
        jteacher.apply(
            params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
            lang_seq=jnp.asarray(lang), spk_embed_id=jnp.asarray(spk),
            method=ProDiffTeacher.forward_condition,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_denoiser_parity(torch_teacher, rng):
    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    sd = {k: v.numpy() for k, v in torch_teacher.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_prodiff_teacher(sd, HP))
    jteacher = ProDiffTeacher(VOCAB, HP)

    B, T, M = 2, 20, HP["audio_num_mel_bins"]
    x_t = rng.normal(size=(B, 1, M, T)).astype(np.float32)  # torch layout
    t = np.array([1, 3], np.int64)
    cond = rng.normal(size=(B, HP["hidden_size"], T)).astype(np.float32)
    with torch.no_grad():
        want = torch_teacher.diffusion.denoise_fn(
            torch.from_numpy(x_t), torch.from_numpy(t), torch.from_numpy(cond)
        ).numpy()  # [B, 1, M, T]

    def run_denoiser(module, x_flat, tt, cc):
        return module.diffusion.denoise_fn(x_flat, tt, cc)

    got = np.asarray(
        jteacher.apply(
            params,
            jnp.asarray(x_t[:, 0].transpose(0, 2, 1)),  # [B, T, M]
            jnp.asarray(t),
            jnp.asarray(cond.transpose(0, 2, 1)),  # [B, T, H]
            method=run_denoiser,
        )
    )  # [B, T, M]
    np.testing.assert_allclose(
        got, want[:, 0].transpose(0, 2, 1), atol=2e-4, rtol=1e-3
    )


def test_q_posterior_coefficients_parity(torch_teacher):
    """Schedule buffers must match the torch reference bit-for-bit-ish."""
    from prodiff_tpu.ops.schedules import DiffusionCoefficients

    coefs = DiffusionCoefficients(
        timesteps=HP["timesteps"], schedule_type=HP["schedule_type"],
        max_beta=HP["max_beta"], min_beta=0.1,
    )
    tdiff = torch_teacher.diffusion
    np.testing.assert_allclose(coefs.betas, tdiff.betas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        coefs.posterior_mean_coef1, tdiff.posterior_mean_coef1.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        coefs.posterior_mean_coef2, tdiff.posterior_mean_coef2.numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        coefs.posterior_log_variance_clipped,
        tdiff.posterior_log_variance_clipped.numpy(), rtol=1e-5,
    )


def test_full_sampling_loop_parity(torch_teacher, rng, monkeypatch):
    """End-to-end 4-step sampling produces the same mel as the torch reference
    when both consume identical noise draws — the 'bit-comparable mels'
    criterion of BASELINE.json."""
    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.ops.schedules import DiffusionCoefficients
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    sd = {k: v.numpy() for k, v in torch_teacher.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_prodiff_teacher(sd, HP))
    jteacher = ProDiffTeacher(VOCAB, HP)

    tokens, mel2ph, f0, lang, spk = _inputs(rng)
    B, T_mel, M = tokens.shape[0], mel2ph.shape[1], HP["audio_num_mel_bins"]

    # common noise: uniform init + one gaussian per step
    steps = HP["timesteps"]
    x_init = rng.uniform(0, 1, (B, 1, M, T_mel)).astype(np.float32)  # torch layout
    noises = [rng.normal(size=(B, 1, M, T_mel)).astype(np.float32) for _ in range(steps)]

    # torch side: reference sampling with injected noise
    draws = iter([torch.from_numpy(n) for n in noises])
    monkeypatch.setattr(
        torch, "rand", lambda *s, **k: torch.from_numpy(x_init)
    )
    monkeypatch.setattr(
        torch, "randn", lambda *s, **k: next(draws)
    )
    with torch.no_grad():
        want = torch_teacher(
            torch.from_numpy(np.asarray(tokens)),
            torch.from_numpy(np.asarray(mel2ph)),
            torch.from_numpy(np.asarray(f0)),
            lang_seq=torch.from_numpy(np.asarray(lang)),
            spk_embed_id=torch.from_numpy(np.asarray(spk)),
            infer=True,
        ).numpy()  # [B, T, M]

    # jax side: the same posterior loop with the same noise, via the module's
    # own denoiser and schedule coefficients
    cond = jteacher.apply(
        params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
        lang_seq=jnp.asarray(lang), spk_embed_id=jnp.asarray(spk),
        method=ProDiffTeacher.forward_condition,
    )
    coefs = DiffusionCoefficients(
        timesteps=HP["timesteps"], schedule_type=HP["schedule_type"],
        max_beta=HP["max_beta"], min_beta=0.1,
    )
    x = jnp.asarray(x_init[:, 0].transpose(0, 2, 1))  # [B, T, M]
    for i in range(steps - 1, -1, -1):
        t = np.full((B,), i, np.int32)
        x0_pred = jteacher.apply(
            params, x, jnp.asarray(t), cond,
            method=lambda m, xx, tt, cc: m.diffusion.denoise_fn(xx, tt, cc),
        )
        mean = (
            coefs.posterior_mean_coef1[i] * x0_pred
            + coefs.posterior_mean_coef2[i] * x
        )
        noise = jnp.asarray(noises[steps - 1 - i][:, 0].transpose(0, 2, 1))
        nonzero = float(i != 0)
        x = mean + nonzero * np.exp(0.5 * coefs.posterior_log_variance_clipped[i]) * noise

    got = np.asarray(x)  # [B, T, M]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_module_scan_sampling_parity(torch_teacher, rng, monkeypatch):
    """Drive the ACTUAL inference path — ProDiffTeacher.__call__(infer=True),
    whose GaussianDiffusion runs its own jitted lax.scan — against the torch
    reference with identical injected noise. Unlike the hand-rewritten loop
    above, a bug in the scan's noise ordering or init branch fails here."""
    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    sd = {k: v.numpy() for k, v in torch_teacher.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_prodiff_teacher(sd, HP))
    jteacher = ProDiffTeacher(VOCAB, HP)

    tokens, mel2ph, f0, lang, spk = _inputs(rng)
    B, T_mel, M = tokens.shape[0], mel2ph.shape[1], HP["audio_num_mel_bins"]
    steps = HP["timesteps"]
    x_init = rng.uniform(0, 1, (B, 1, M, T_mel)).astype(np.float32)
    noises = [rng.normal(size=(B, 1, M, T_mel)).astype(np.float32)
              for _ in range(steps)]

    draws = iter([torch.from_numpy(n) for n in noises])
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.from_numpy(x_init))
    monkeypatch.setattr(torch, "randn", lambda *s, **k: next(draws))
    with torch.no_grad():
        want = torch_teacher(
            torch.from_numpy(np.asarray(tokens)),
            torch.from_numpy(np.asarray(mel2ph)),
            torch.from_numpy(np.asarray(f0)),
            lang_seq=torch.from_numpy(np.asarray(lang)),
            spk_embed_id=torch.from_numpy(np.asarray(spk)),
            infer=True,
        ).numpy()  # [B, T, M]

    # [B, 1, M, T] torch layout -> [B, 1, T, M]
    init_j = jnp.asarray(x_init.transpose(0, 1, 3, 2))
    steps_j = jnp.asarray(
        np.stack([n.transpose(0, 1, 3, 2) for n in noises], axis=0)
    )

    @jax.jit
    def run(params, tokens, mel2ph, f0, lang, spk, init_noise, step_noises):
        return jteacher.apply(
            params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            infer=True, infer_step=steps,
            init_noise=init_noise, step_noises=step_noises,
        )

    got = np.asarray(run(
        params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
        jnp.asarray(lang), jnp.asarray(spk), init_j, steps_j,
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("alg", ["euler", "rk2", "rk4", "rk5"])
def test_reflow_ode_sampling_parity(rng, alg):
    """The RectifiedFlow module's own scanned ODE steppers vs the reference's
    sample_euler/rk2/rk4/rk5 (``modules/diffusion/reflow.py:48-101``) with the
    same injected start noise, through the full teacher infer path."""
    import importlib

    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    hp = dict(HP)
    hp.update(diff_type="reflow", sampling_algorithm=alg, timescale=1000,
              infer_step=4)
    sys.path.insert(0, "/root/reference")
    sys.modules.setdefault("chardet", types.ModuleType("chardet"))
    mod = importlib.import_module("modules.svs.prodiff_teacher")
    torch.manual_seed(1)
    tt = mod.ProDiffTeacher(VOCAB, hp)
    tt.eval()

    sd = {k: v.numpy() for k, v in tt.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_prodiff_teacher(sd, hp))
    jteacher = ProDiffTeacher(VOCAB, hp)

    tokens, mel2ph, f0, lang, spk = _inputs(rng)
    B, T_mel, M = tokens.shape[0], mel2ph.shape[1], hp["audio_num_mel_bins"]
    x_init = rng.normal(size=(B, 1, M, T_mel)).astype(np.float32)

    # the reference teacher never plumbs infer_step; reflow defaults to 20
    # ODE steps (``modules/diffusion/reflow.py:32``). NB: the reference's
    # steppers mutate x in place (``x += v*dt``), so the injected tensor must
    # NOT share memory with the numpy array the jax side reads.
    real_randn = torch.randn
    torch.randn = lambda *s, **k: torch.from_numpy(x_init.copy())
    try:
        with torch.no_grad():
            want = tt(
                torch.from_numpy(np.asarray(tokens)),
                torch.from_numpy(np.asarray(mel2ph)),
                torch.from_numpy(np.asarray(f0)),
                lang_seq=torch.from_numpy(np.asarray(lang)),
                spk_embed_id=torch.from_numpy(np.asarray(spk)),
                infer=True,
            ).numpy()
    finally:
        torch.randn = real_randn

    @jax.jit
    def run(params, tokens, mel2ph, f0, lang, spk, init_noise):
        return jteacher.apply(
            params, tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk,
            infer=True, infer_step=20, init_noise=init_noise,
        )

    got = np.asarray(run(
        params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
        jnp.asarray(lang), jnp.asarray(spk),
        jnp.asarray(x_init.transpose(0, 1, 3, 2)),
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
