"""End-to-end training tests on an 8-device CPU mesh."""

import os

import jax
import numpy as np
import pytest

from prodiff_tpu.data.collate import batch_by_size, pad_to_buckets
from prodiff_tpu.parallel.mesh import create_mesh
from prodiff_tpu.tasks import get_task_cls
from prodiff_tpu.training.optim import rsqrt_schedule
from prodiff_tpu.training.trainer import Trainer
from prodiff_tpu.utils import ckpt_utils
from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


def test_eight_cpu_devices_available():
    assert jax.device_count() == 8


def test_rsqrt_schedule_matches_reference_formula():
    sched = rsqrt_schedule(lr=1.0, warmup_updates=2000, hidden_size=256)
    for step in [0, 1, 1000, 2000, 50000]:
        warmup = min(step / 2000, 1.0)
        want = max(1.0 * warmup * max(2000, step) ** -0.5 * 256 ** -0.5, 1e-7)
        assert abs(float(sched(step)) - want) < 1e-9


def test_batch_by_size_budget():
    sizes = {i: s for i, s in enumerate([10, 12, 50, 9, 30, 30, 8])}
    batches = batch_by_size(np.arange(7), lambda i: sizes[i], max_tokens=60)
    assert sum(len(b) for b in batches) == 7
    for b in batches:
        assert len(b) * max(sizes[i] for i in b) <= 60 or len(b) == 1


def test_pad_to_buckets_shapes():
    batch = {
        "x": np.zeros((3, 37)),
        "y": np.zeros((3, 37, 4)),
        "n": 3,
    }
    out = pad_to_buckets(
        batch, {"x": 1, "y": 1}, batch_buckets=[1, 2, 4, 8],
        length_bucket_step=32, batch_multiple=8,
    )
    assert out["x"].shape == (8, 64)
    assert out["y"].shape == (8, 64, 4)
    assert out["n"] == 3


@pytest.fixture(scope="module")
def svs_env(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("svs_data"))
    make_svs_dataset(data_dir, "svs")
    hp = small_hparams(data_dir, "svs")
    return hp


@pytest.mark.slow
def test_svs_training_loop_decreases_loss(svs_env):
    hp = dict(svs_env, max_updates=30)
    mesh = create_mesh()  # all 8 cpu devices
    trainer = Trainer(hp, mesh=mesh)
    task = get_task_cls("svs")(hp)
    trainer.fit(task, max_steps=30)
    assert trainer.global_step == 30
    # metrics were logged
    import json

    with open(os.path.join(hp["work_dir"], "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    tr = [r for r in recs if "tr/total_loss" in r]
    assert len(tr) >= 2
    assert np.isfinite([r["tr/total_loss"] for r in tr]).all()
    first, last = tr[0]["tr/total_loss"], tr[-1]["tr/total_loss"]
    assert last < first * 1.5  # sanity: not diverging
    # checkpoints exist with keep-K pruning
    ckpts = ckpt_utils.sorted_checkpoints(hp["work_dir"])
    assert 1 <= len(ckpts) <= hp["num_ckpt_keep"]
    # validation ran and plots were produced
    assert any("val/total_loss" in r for r in recs)
    assert os.path.isdir(os.path.join(hp["work_dir"], "plots"))


@pytest.mark.slow
def test_resume_from_checkpoint(svs_env):
    hp = dict(svs_env, max_updates=40)
    mesh = create_mesh()
    task = get_task_cls("svs")(hp)
    trainer = Trainer(hp, mesh=mesh)
    trainer.fit(task, max_steps=40)  # restores from step 30, runs to 40
    assert trainer.global_step == 40
    steps = [s for _, s in ckpt_utils.sorted_checkpoints(hp["work_dir"])]
    assert steps[-1] == 40


@pytest.mark.slow
def test_svs_rectified_task(tmp_path):
    data_dir = str(tmp_path)
    make_svs_dataset(data_dir, "svs_rectified", rectified=True)
    hp = small_hparams(data_dir, "svs_rectified", max_updates=6, timesteps=1)
    mesh = create_mesh(4)
    task = get_task_cls("svs_rectified")(hp)
    trainer = Trainer(hp, mesh=mesh)
    trainer.fit(task, max_steps=6)
    assert trainer.global_step == 6


def test_checkpoint_surgery_merge():
    target = {"model": {"diffusion": {"w": np.zeros(2)}, "enc": {"w": np.ones(2)}}}
    student = {"w": np.full(2, 7.0)}
    ckpt_utils.merge_subtree(target, "model.diffusion", student)
    np.testing.assert_array_equal(target["model"]["diffusion"]["w"], [7, 7])
    np.testing.assert_array_equal(target["model"]["enc"]["w"], [1, 1])
