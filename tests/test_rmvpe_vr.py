"""Golden parity tests: flax RMVPE E2E0 and VR CascadedNet vs the torch
reference with converted random weights (eval mode)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, "/root/reference")
    # rmvpe's package __init__ imports librosa (absent); stub it as a package
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        librosa.__path__ = []  # mark as package so submodule imports resolve
        librosa.sequence = types.SimpleNamespace(viterbi=None)
        filters = types.ModuleType("librosa.filters")
        from prodiff_tpu.ops.mel import mel_filterbank

        filters.mel = lambda sr, n_fft, n_mels, fmin, fmax, htk=False: mel_filterbank(
            sr, n_fft, n_mels, fmin, fmax, htk=htk
        )
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    import importlib

    rmvpe_model = importlib.import_module("modules.rmvpe.model")
    vr_nets = importlib.import_module("modules.vr.nets")
    return rmvpe_model, vr_nets


@pytest.mark.slow
def test_rmvpe_e2e0_matches_torch(ref_modules, rng):
    rmvpe_model, _ = ref_modules
    torch.manual_seed(0)
    tmodel = rmvpe_model.E2E0(4, 1, (2, 2)).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from prodiff_tpu.models.rmvpe import E2E0, convert_rmvpe

    params = jax.tree.map(jnp.asarray, convert_rmvpe(sd))
    jmodel = E2E0(4, 1, (2, 2))

    mel = rng.normal(size=(1, 32, 128)).astype(np.float32)  # [B, T, M], T % 32 == 0
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(mel)))
    assert got.shape == want.shape == (1, 32, 360)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_rmvpe_decode():
    from prodiff_tpu.models.rmvpe import CONST, to_local_average_f0

    hidden = np.zeros((4, 360), np.float32)
    hidden[:, 100] = 1.0  # all mass at bin 100
    f0 = to_local_average_f0(hidden)
    want = 10 * 2 ** ((100 * 20 + CONST) / 1200)
    np.testing.assert_allclose(f0, want, rtol=1e-5)
    # below-threshold frames are unvoiced
    hidden2 = np.full((2, 360), 0.001, np.float32)
    assert np.all(to_local_average_f0(hidden2) == 0)


@pytest.mark.slow
def test_vr_cascadednet_matches_torch(ref_modules, rng):
    _, vr_nets = ref_modules
    n_fft, hop = 256, 128
    torch.manual_seed(0)
    tmodel = vr_nets.CascadedNet(
        n_fft, hop, nout=8, nout_lstm=16, is_complex=True, is_mono=True
    ).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from prodiff_tpu.models.vr import CascadedNet, convert_vr

    params = jax.tree.map(jnp.asarray, convert_vr(sd))
    jmodel = CascadedNet(n_fft, hop, nout=8, nout_lstm=16, is_mono=True)

    F_bins, T = n_fft // 2 + 1, 64
    spec = (
        rng.normal(size=(1, 1, F_bins, T)) + 1j * rng.normal(size=(1, 1, F_bins, T))
    ).astype(np.complex64)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(spec)).numpy()[0, 0]  # [F, T] complex

    x = jnp.stack(
        [jnp.asarray(spec.real[0, 0]), jnp.asarray(spec.imag[0, 0])], axis=-1
    )[None]  # [1, F, T, 2]
    got = np.asarray(jmodel.apply(params, x))[0]
    got_c = got[..., 0] + 1j * got[..., 1]
    assert got_c.shape == want.shape
    np.testing.assert_allclose(np.abs(got_c), np.abs(want), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_c.real, want.real, atol=2e-4, rtol=1e-3)


def test_vr_separation_roundtrip(ref_modules, rng, tmp_path):
    """Full predict_from_audio path vs the torch reference."""
    _, vr_nets = ref_modules
    n_fft, hop = 256, 128
    torch.manual_seed(1)
    tmodel = vr_nets.CascadedNet(
        n_fft, hop, nout=8, nout_lstm=16, is_complex=True, is_mono=True
    ).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    from prodiff_tpu.models.vr import SeparationModel, convert_vr

    params = jax.tree.map(jnp.asarray, convert_vr(sd))
    sep = SeparationModel(params, n_fft, hop, nout=8, nout_lstm=16)

    wav = (rng.normal(size=20000) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = (
            tmodel.predict_from_audio(torch.from_numpy(wav).reshape(1, 1, -1))
            .numpy()
            .squeeze()
        )
    got = sep.predict_from_audio(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-2)
