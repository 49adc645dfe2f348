"""Released-checkpoint parity harness (skipped-when-absent; VERDICT r3 #7).

Zero egress blocks downloading the reference's released weights, so the
standing parity story is random-init/converted-weight equivalence. This
harness closes the "if weights ever appear" gap: drop released torch
checkpoints under ``$REAL_WEIGHTS_DIR`` (default ``checkpoints/real/``) in
the reference's own layouts and the parity claim upgrades with zero new code.

Expected layout (matching the reference loaders):

  nsf_hifigan/model + nsf_hifigan/config.json
      openvpi NSF-HiFiGAN release — reference loader
      ``modules/nsf_hifigan/models.py:21-36`` via
      ``component/vocoder/nsf_hifigan.py:11-28``
  fastdiff/model.ckpt + fastdiff/config.yaml
      FastDiff release — reference loader ``component/vocoder/fastdiff.py:17-60``
  acoustic/model_ckpt_steps_*.ckpt + acoustic/config.yaml + acoustic/phone_set.json
      trained ProDiffTeacher work dir — reference loader
      ``utils/ckpt_utils.py:28-69``

The ``*_fabricated`` self-tests always run: they write random-weight
checkpoints in these exact layouts and drive the SAME harness functions, so
the harness is known-working even while the real-weight tests skip.
"""

import json
import os
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import install_reference_stubs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS_DIR = os.environ.get(
    "REAL_WEIGHTS_DIR", os.path.join(REPO, "checkpoints", "real")
)

RNG = np.random.default_rng(11)


def _require(*rel):
    path = os.path.join(WEIGHTS_DIR, *rel)
    if not os.path.exists(path):
        pytest.skip(
            f"no released weights at {path} — drop the reference checkpoint "
            f"there (see module docstring) to run real-weight parity"
        )
    return path


# ---- harness functions (shared by real-weight tests and self-tests) --------


def nsf_hifigan_parity(model_path: str, t_mel: int = 12):
    """Converted flax NSF-HiFiGAN == torch reference net from the SAME ckpt.

    Deterministic comparison: the stochastic SineGen source is bypassed by
    feeding an identical har_source to both sides (the golden-test rig)."""
    install_reference_stubs()
    import importlib

    ref_models = importlib.import_module("modules.nsf_hifigan.models")
    tgen, h = ref_models.load_model(pathlib.Path(model_path))
    H = dict(h)

    from prodiff_tpu.models.nsf_hifigan import Generator
    from prodiff_tpu.utils.torch_convert import convert_nsf_hifigan

    sd = {k: v.numpy() for k, v in tgen.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_nsf_hifigan(sd, H))
    jgen = Generator.from_config(H, use_packed=False)

    mel = RNG.normal(size=(1, t_mel, H["num_mels"])).astype(np.float32) * 2 - 6
    upp = int(np.prod(H["upsample_rates"]))
    har = (RNG.normal(size=(1, t_mel * upp, 1)) * 0.1).astype(np.float32)

    with torch.no_grad():
        x = tgen.conv_pre(torch.from_numpy(mel).transpose(1, 2))
        hs = torch.from_numpy(har).transpose(1, 2)
        for i in range(tgen.num_upsamples):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = tgen.ups[i](x)
            x = x + tgen.noise_convs[i](hs)
            xs = None
            for j in range(tgen.num_kernels):
                r = tgen.resblocks[i * tgen.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / tgen.num_kernels
        x = torch.nn.functional.leaky_relu(x)
        want = torch.tanh(tgen.conv_post(x))[:, 0].numpy()

    got = np.asarray(
        jgen.apply(params, jnp.asarray(mel), har_source=jnp.asarray(har))
    )
    assert got.shape == want.shape == (1, t_mel * upp)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999
    return got, want


def fastdiff_parity(ckpt_path: str, config_path: str, t_mel: int = 6):
    """Converted flax FastDiff denoiser forward == torch reference from the
    SAME ckpt (one (x, c, step) evaluation — deterministic)."""
    install_reference_stubs()
    import importlib

    torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = importlib.import_module("modules.FastDiff")
    sys.modules.setdefault("modules.fastdiff", pkg)
    for sub in ("module", "module.modules", "module.util"):
        m = importlib.import_module(f"modules.FastDiff.{sub}")
        sys.modules.setdefault(f"modules.fastdiff.{sub}", m)
    fm = importlib.import_module("modules.FastDiff.module.FastDiff_model")

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    tnet = fm.FastDiff(
        audio_channels=cfg["audio_channels"],
        inner_channels=cfg["inner_channels"],
        cond_channels=cfg["cond_channels"],
        upsample_ratios=cfg["upsample_ratios"],
        lvc_layers_each_block=cfg["lvc_layers_each_block"],
        lvc_kernel_size=cfg["lvc_kernel_size"],
        kpnet_hidden_channels=cfg["kpnet_hidden_channels"],
        kpnet_conv_size=cfg["kpnet_conv_size"],
        dropout=cfg.get("dropout", 0.0),
        diffusion_step_embed_dim_in=cfg["diffusion_step_embed_dim_in"],
        diffusion_step_embed_dim_mid=cfg["diffusion_step_embed_dim_mid"],
        diffusion_step_embed_dim_out=cfg["diffusion_step_embed_dim_out"],
        use_weight_norm=cfg.get("use_weight_norm", True),
    )
    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    tnet.load_state_dict(obj["state_dict"]["model"], strict=True)
    tnet.remove_weight_norm()
    tnet.eval()

    from prodiff_tpu.models.fastdiff import FastDiff, convert_fastdiff
    from prodiff_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(ckpt_path)
    params = jax.tree.map(jnp.asarray, convert_fastdiff(sd, cfg))
    jnet = FastDiff(
        audio_channels=cfg["audio_channels"],
        inner_channels=cfg["inner_channels"],
        cond_channels=cfg["cond_channels"],
        upsample_ratios=tuple(cfg["upsample_ratios"]),
        lvc_layers_each_block=cfg["lvc_layers_each_block"],
        lvc_kernel_size=cfg["lvc_kernel_size"],
        kpnet_hidden_channels=cfg["kpnet_hidden_channels"],
        kpnet_conv_size=cfg["kpnet_conv_size"],
        diffusion_step_embed_dim_in=cfg["diffusion_step_embed_dim_in"],
        diffusion_step_embed_dim_mid=cfg["diffusion_step_embed_dim_mid"],
        diffusion_step_embed_dim_out=cfg["diffusion_step_embed_dim_out"],
    )
    hop = int(np.prod(cfg["upsample_ratios"]))
    audio = RNG.normal(size=(1, t_mel * hop, 1)).astype(np.float32)
    cond = RNG.normal(size=(1, t_mel, cfg["cond_channels"])).astype(np.float32)
    steps = np.array([[2.5]], np.float32)
    with torch.no_grad():
        want = tnet(
            (
                torch.from_numpy(audio.transpose(0, 2, 1)),
                torch.from_numpy(cond.transpose(0, 2, 1)),
                torch.from_numpy(steps),
            )
        ).numpy()[:, 0]
    got = np.asarray(
        jnet.apply(params, jnp.asarray(audio), jnp.asarray(cond), jnp.asarray(steps))
    )[..., 0]
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    return got, want


def teacher_parity(ckpt_path: str, config_path: str, phone_set_path: str,
                   monkeypatch):
    """Converted flax ProDiffTeacher == torch reference from the SAME ckpt:
    forward_condition exactly, and the full 4-step diffusion render with all
    randomness collapsed to zeros on both sides."""
    install_reference_stubs()
    import importlib

    mod = importlib.import_module("modules.svs.prodiff_teacher")
    with open(config_path) as f:
        hp = yaml.safe_load(f)
    with open(phone_set_path) as f:
        vocab = len(json.load(f))

    tteacher = mod.ProDiffTeacher(vocab, hp)
    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = obj["state_dict"]["model"]
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    tteacher.load_state_dict(sd, strict=True)
    tteacher.eval()

    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from prodiff_tpu.utils.teacher_convert import convert_prodiff_teacher

    params = jax.tree.map(
        jnp.asarray,
        convert_prodiff_teacher({k: v.numpy() for k, v in sd.items()}, hp),
    )
    jteacher = ProDiffTeacher(vocab, hp)

    B, T_ph, T_mel = 1, 5, 16
    tokens = RNG.integers(3, vocab, (B, T_ph)).astype(np.int64)
    dur = RNG.integers(2, 5, (B, T_ph))
    mel2ph = np.zeros((B, T_mel), np.int64)
    pos = 0
    for k in range(T_ph):
        mel2ph[0, pos : min(pos + dur[0, k], T_mel)] = k + 1
        pos += dur[0, k]
    mel2ph[0, pos:] = T_ph
    f0 = RNG.uniform(100, 400, (B, T_mel)).astype(np.float32)
    lang = np.ones((B, T_ph), np.int64)
    spk = np.zeros((B,), np.int64)

    with torch.no_grad():
        want_cond = tteacher.forward_condition(
            torch.from_numpy(tokens), torch.from_numpy(mel2ph),
            torch.from_numpy(f0), lang_seq=torch.from_numpy(lang),
            spk_embed_id=torch.from_numpy(spk),
        ).numpy()
    got_cond = np.asarray(
        jteacher.apply(
            params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
            lang_seq=jnp.asarray(lang), spk_embed_id=jnp.asarray(spk),
            method=ProDiffTeacher.forward_condition,
        )
    )
    np.testing.assert_allclose(got_cond, want_cond, atol=5e-4, rtol=1e-3)

    # full render, zero-noise both sides (the mcd-pipeline rig)
    monkeypatch.setattr(torch, "rand", lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.zeros(*s))
    monkeypatch.setattr(
        torch, "randn_like", lambda x, **k: torch.zeros_like(x)
    )
    with torch.no_grad():
        want_mel = tteacher(
            torch.from_numpy(tokens), torch.from_numpy(mel2ph),
            torch.from_numpy(f0), lang_seq=torch.from_numpy(lang),
            spk_embed_id=torch.from_numpy(spk), infer=True,
        ).numpy()
    monkeypatch.undo()
    got_mel = np.asarray(
        jteacher.apply(
            params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
            lang_seq=jnp.asarray(lang), spk_embed_id=jnp.asarray(spk),
            infer=True, deterministic=True,
            rngs={"diffusion": jax.random.PRNGKey(0)},
        )
    )
    np.testing.assert_allclose(got_mel, want_mel, atol=2e-3, rtol=1e-2)
    return got_mel, want_mel


# ---- real-weight tests (skip until checkpoints are provided) ---------------


def test_real_nsf_hifigan_parity():
    nsf_hifigan_parity(_require("nsf_hifigan", "model"), t_mel=24)


def test_real_fastdiff_parity():
    fastdiff_parity(
        _require("fastdiff", "model.ckpt"),
        _require("fastdiff", "config.yaml"),
        t_mel=12,
    )


def test_real_acoustic_teacher_parity(monkeypatch):
    import glob

    cfg = _require("acoustic", "config.yaml")
    phs = _require("acoustic", "phone_set.json")
    ckpts = sorted(
        glob.glob(os.path.join(WEIGHTS_DIR, "acoustic", "model_ckpt_steps_*.ckpt"))
    )
    if not ckpts:
        pytest.skip("no acoustic model_ckpt_steps_*.ckpt under " + WEIGHTS_DIR)
    teacher_parity(ckpts[-1], cfg, phs, monkeypatch)


# ---- fabricated-checkpoint self-tests (always run) --------------------------


def test_harness_nsf_hifigan_fabricated(tmp_path):
    install_reference_stubs()
    import importlib

    ref_models = importlib.import_module("modules.nsf_hifigan.models")
    env = importlib.import_module("modules.nsf_hifigan.env")
    H = {
        "num_mels": 16, "sampling_rate": 44100,
        "upsample_initial_channel": 32, "upsample_rates": [4, 4, 2],
        "upsample_kernel_sizes": [8, 8, 4], "resblock": "1",
        "resblock_kernel_sizes": [3, 7],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5]],
        "n_fft": 512, "win_size": 512, "hop_size": 32,
        "fmin": 40, "fmax": 16000,
    }
    torch.manual_seed(3)
    gen = ref_models.Generator(env.AttrDict(H))
    d = tmp_path / "nsf_hifigan"
    d.mkdir()
    torch.save({"generator": gen.state_dict()}, d / "model")
    (d / "config.json").write_text(json.dumps(H))
    nsf_hifigan_parity(str(d / "model"))


def test_harness_fastdiff_fabricated(tmp_path):
    install_reference_stubs()
    import importlib

    torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = importlib.import_module("modules.FastDiff")
    sys.modules.setdefault("modules.fastdiff", pkg)
    for sub in ("module", "module.modules", "module.util"):
        m = importlib.import_module(f"modules.FastDiff.{sub}")
        sys.modules.setdefault(f"modules.fastdiff.{sub}", m)
    fm = importlib.import_module("modules.FastDiff.module.FastDiff_model")
    cfg = {
        "audio_channels": 1, "inner_channels": 8, "cond_channels": 16,
        "upsample_ratios": [4, 4, 2], "lvc_layers_each_block": 2,
        "lvc_kernel_size": 3, "kpnet_hidden_channels": 8,
        "kpnet_conv_size": 3, "dropout": 0.0,
        "diffusion_step_embed_dim_in": 16,
        "diffusion_step_embed_dim_mid": 32,
        "diffusion_step_embed_dim_out": 32, "use_weight_norm": True,
        "beta_0": 1e-6, "beta_T": 0.01, "T": 1000,
    }
    torch.manual_seed(4)
    tnet = fm.FastDiff(
        audio_channels=1, inner_channels=8, cond_channels=16,
        upsample_ratios=[4, 4, 2], lvc_layers_each_block=2,
        lvc_kernel_size=3, kpnet_hidden_channels=8, kpnet_conv_size=3,
        dropout=0.0, diffusion_step_embed_dim_in=16,
        diffusion_step_embed_dim_mid=32, diffusion_step_embed_dim_out=32,
        use_weight_norm=True,
    )
    d = tmp_path / "fastdiff"
    d.mkdir()
    torch.save({"state_dict": {"model": tnet.state_dict()}}, d / "model.ckpt")
    (d / "config.yaml").write_text(yaml.safe_dump(cfg))
    fastdiff_parity(str(d / "model.ckpt"), str(d / "config.yaml"))


def test_harness_teacher_fabricated(tmp_path, monkeypatch):
    install_reference_stubs()
    import importlib

    mod = importlib.import_module("modules.svs.prodiff_teacher")
    hp = {
        "audio_num_mel_bins": 16, "hidden_size": 32, "enc_layers": 2,
        "enc_ffn_kernel_size": 9, "dropout": 0.1, "num_heads": 2,
        "use_dur_embed": True, "use_spk_id": True, "num_spk": 2,
        "use_lang_id": True, "languages": {"zh": 1},
        "use_gender_id": False, "use_voicing_embed": False,
        "use_breath_embed": False, "diff_type": "prodiff", "timesteps": 4,
        "timescale": 1, "schedule_type": "vpsde", "max_beta": 40,
        "spec_min": [-12], "spec_max": [0], "residual_layers": 3,
        "residual_channels": 16, "dilation_cycle_length": 1,
        "rel_pos": False,
    }
    torch.manual_seed(5)
    teacher = mod.ProDiffTeacher(8, hp)
    d = tmp_path / "acoustic"
    d.mkdir()
    torch.save(
        {"state_dict": {"model": teacher.state_dict()}},
        d / "model_ckpt_steps_1000.ckpt",
    )
    (d / "config.yaml").write_text(yaml.safe_dump(hp))
    (d / "phone_set.json").write_text(
        json.dumps({f"p{i}": i for i in range(8)})
    )
    teacher_parity(
        str(d / "model_ckpt_steps_1000.ckpt"),
        str(d / "config.yaml"),
        str(d / "phone_set.json"),
        monkeypatch,
    )


def test_skip_paths_visible():
    """The skip markers must show in a default run (verdict done-criterion)."""
    if os.path.isdir(WEIGHTS_DIR):
        pytest.skip("weights dir exists; real tests decide for themselves")
    assert not os.path.isdir(WEIGHTS_DIR)
