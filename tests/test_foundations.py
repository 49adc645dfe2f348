"""Unit tests for config, text encoder, indexed datasets, pitch math."""

import os

import numpy as np
import pytest
import yaml

from prodiff_tpu.config import apply_overrides, load_base_config, load_config, set_hparams
from prodiff_tpu.utils.indexed_datasets import IndexedDataset, IndexedDatasetBuilder
from prodiff_tpu.utils.pitch_utils import (
    denorm_f0,
    f0_to_coarse,
    interp_f0,
    norm_f0,
    resample_align_curve,
    shift_pitch,
)
from prodiff_tpu.utils.text_encoder import PAD_ID, UNK_ID, TokenTextEncoder


def test_base_config_defaults():
    cfg = load_base_config()
    assert cfg["audio_num_mel_bins"] == 128
    assert cfg["hop_size"] == 512
    assert cfg["timesteps"] == 4
    assert cfg["schedule_type"] == "vpsde"
    assert cfg["max_beta"] == 40
    assert cfg["vocoder"] == "nsfhifigan"


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    base.write_text(yaml.dump({"a": 1, "b": 2}))
    child.write_text(yaml.dump({"base_config": str(base), "b": 3, "c": 4}))
    cfg = load_config(str(child))
    assert cfg["a"] == 1 and cfg["b"] == 3 and cfg["c"] == 4


def test_set_hparams_work_dir(tmp_path):
    cfg_fn = tmp_path / "config.yaml"
    cfg_fn.write_text(yaml.dump({"lr": 0.1}))
    hp = set_hparams(
        str(cfg_fn),
        exp_name="expA",
        task="svs",
        checkpoints_root=str(tmp_path / "ckpts"),
    )
    assert hp["work_dir"].endswith(os.path.join("expA", "svs"))
    assert os.path.exists(os.path.join(hp["work_dir"], "config.yaml"))
    # config-free resolution from the work dir
    hp2 = set_hparams(
        None, exp_name="expA", task="svs", checkpoints_root=str(tmp_path / "ckpts")
    )
    assert hp2["lr"] == 0.1


def test_overrides():
    cfg = {"a": 1, "b": {"c": 2}}
    apply_overrides(cfg, "a=5,b.c=7,b.d=true")
    assert cfg == {"a": 5, "b": {"c": 7, "d": True}}


def test_text_encoder_roundtrip():
    enc = TokenTextEncoder(["SP", "a", "b"], replace_oov="SP")
    assert enc.encode("a b SP") == [4, 5, 3]
    assert enc.encode("a zz") == [4, 3]  # OOV -> SP
    assert enc.decode([0, 4, 5], strip_padding=True) == "a b"
    assert enc.id("<pad>") == PAD_ID and enc.id("<UNK>") == UNK_ID


def test_indexed_dataset_roundtrip(tmp_path, rng):
    items = [
        {"mel": rng.normal(size=(np.int64(10 + i), 4)).astype(np.float32), "i": i}
        for i in range(25)
    ]
    builder = IndexedDatasetBuilder(str(tmp_path), "train", segment_size=10)
    for it in items:
        builder.add_item(it)
    builder.finalize()
    # 25 items @ 10/seg -> 3 shards
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".idx")]) == 3
    ds = IndexedDataset(str(tmp_path), "train", segment_size=10)
    assert len(ds) == 25
    for i in [0, 9, 10, 24, 3]:
        np.testing.assert_array_equal(ds[i]["mel"], items[i]["mel"])
        assert ds[i]["i"] == i
    with pytest.raises(IndexError):
        _ = ds[25]


def test_f0_math():
    f0 = np.array([0.0, 100.0, 200.0, 0.0, 400.0])
    coarse = f0_to_coarse(f0.copy())
    assert coarse.min() >= 1 and coarse.max() <= 255
    interp, uv = interp_f0(f0.copy())
    np.testing.assert_array_equal(uv, f0 == 0)
    assert np.all(interp > 0)
    np.testing.assert_allclose(interp[[1, 2, 4]], [100, 200, 400], rtol=1e-6)
    # norm/denorm roundtrip on voiced frames
    nf = norm_f0(f0.copy(), f0 == 0)
    back = denorm_f0(nf, uv=f0 == 0)
    np.testing.assert_allclose(back, f0, rtol=1e-6)
    np.testing.assert_allclose(shift_pitch(np.array([440.0]), 12), [880.0])


def test_resample_align_curve():
    pts = np.linspace(0, 1, 11).astype(np.float32)  # 10ms grid
    out = resample_align_curve(pts, 0.01, 0.005, 25)
    assert len(out) == 25
    # arange excludes t_max, so 20 interpolated points then constant fill
    np.testing.assert_allclose(out[:20], np.arange(20) * 0.05, atol=1e-6)
    assert np.all(out[20:] == out[19])


def test_indexed_dataset_cross_compat_with_reference(tmp_path):
    """Byte-format compatibility proven both directions against the reference
    implementation (``/root/reference/utils/indexed_datasets.py:7-94``)."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ref_indexed_datasets", "/root/reference/utils/indexed_datasets.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(7)
    items = [
        {"mel": rng.normal(size=(8 + i, 4)).astype(np.float32), "name": f"it{i}"}
        for i in range(25)
    ]

    # reference writer -> our reader (multi-shard)
    ref_dir = tmp_path / "ref_written"
    ref_dir.mkdir()
    b = ref.IndexedDatasetBuilder(str(ref_dir), "train", segment_size=10)
    for it in items:
        b.add_item(it)
    b.finalize()
    ds = IndexedDataset(str(ref_dir), "train", segment_size=10)
    assert len(ds) == 25
    for i in [0, 9, 10, 24]:
        np.testing.assert_array_equal(ds[i]["mel"], items[i]["mel"])
        assert ds[i]["name"] == items[i]["name"]

    # our writer -> reference reader
    our_dir = tmp_path / "our_written"
    our_dir.mkdir()
    b2 = IndexedDatasetBuilder(str(our_dir), "train", segment_size=10)
    for it in items:
        b2.add_item(it)
    b2.finalize()
    ref_ds = ref.IndexedDataset(str(our_dir), "train", segment_size=10)
    assert ref_ds.total_size == 25
    for i in [0, 9, 10, 24]:
        np.testing.assert_array_equal(ref_ds[i]["mel"], items[i]["mel"])
        assert ref_ds[i]["name"] == items[i]["name"]
