"""f32 vs bf16-compute-policy convergence comparison (verdict r3 #3).

The bf16 compute policy (params f32, matmuls bf16) is the TPU-native
replacement of the reference's opt-in fp16 AMP
(``handler/train/handler.py:254,272-274``; default ``amp: false``
``handler/base_config.yaml:61``). A short loss-parity check is not enough to
make it the TPU default — this runs a few-hundred-step training on structured
synthetic data with IDENTICAL batches and per-step rng (the trainer folds the
global seed with state.step) in both precisions and asserts the loss CURVES
agree, not just one value.
"""

import json
import os

import numpy as np
import pytest

from prodiff_tpu.parallel.mesh import create_mesh
from prodiff_tpu.tasks import get_task_cls
from prodiff_tpu.training.trainer import Trainer
from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams

N_STEPS = 250


def _loss_curve(work_dir):
    with open(os.path.join(work_dir, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    tr = {r["step"]: r["tr/total_loss"] for r in recs if "tr/total_loss" in r}
    steps = sorted(tr)
    return np.asarray(steps), np.asarray([tr[s] for s in steps])


@pytest.mark.slow
def test_bf16_training_convergence_matches_f32(tmp_path):
    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs", n_train=24, structured=True, seed=5)
    base = small_hparams(
        data_dir, "svs",
        max_updates=N_STEPS,
        val_check_interval=10**6,  # train-only; curves are the subject
        num_sanity_val_steps=0,
        tb_log_interval=1,
        num_ckpt_keep=1,
    )
    curves = {}
    for name, force in [("f32", False), ("bf16", True)]:
        hp = dict(base, bf16=force,
                  work_dir=os.path.join(str(tmp_path), "work_" + name))
        trainer = Trainer(hp, mesh=create_mesh())
        trainer.fit(get_task_cls("svs")(hp), max_steps=N_STEPS)
        assert trainer.global_step == N_STEPS
        steps, losses = _loss_curve(hp["work_dir"])
        assert len(losses) == N_STEPS and np.isfinite(losses).all()
        curves[name] = losses

    f32, b16 = curves["f32"], curves["bf16"]
    # both converge on the structured data (mels are a function of phoneme id)
    head = f32[:10].mean()
    assert f32[-50:].mean() < 0.6 * head, (f32[-50:].mean(), head)
    assert b16[-50:].mean() < 0.6 * head, (b16[-50:].mean(), head)
    # smoothed curves agree pointwise throughout training (windows of 25
    # steps): identical data + rng, so the only difference is precision
    for lo in range(0, N_STEPS, 25):
        wf, wb = f32[lo : lo + 25].mean(), b16[lo : lo + 25].mean()
        assert abs(wb - wf) / wf < 0.08, (lo, wf, wb)
    # final tails agree tightly
    tf, tb = f32[-50:].mean(), b16[-50:].mean()
    assert abs(tb - tf) / tf < 0.05, (tf, tb)
