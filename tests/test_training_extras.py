"""Gradient accumulation, bf16 training, noise-init compat flag."""

import numpy as np
import pytest

from prodiff_tpu.parallel.mesh import create_mesh
from prodiff_tpu.tasks import get_task_cls
from prodiff_tpu.training.trainer import Trainer
from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


@pytest.mark.slow
def test_grad_accumulation_and_bf16(tmp_path):
    data_dir = str(tmp_path)
    make_svs_dataset(data_dir, "svs")
    hp = small_hparams(
        data_dir, "svs",
        accumulate_grad_batches=2,
        bf16=True,
        max_updates=6,
        val_check_interval=100,
    )
    task = get_task_cls("svs")(hp)
    trainer = Trainer(hp, mesh=create_mesh(2))
    trainer.fit(task, max_steps=6)
    assert trainer.global_step == 6
    import json
    import os

    with open(os.path.join(hp["work_dir"], "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["tr/total_loss"] for r in recs if "tr/total_loss" in r]
    assert losses and np.isfinite(losses).all()


def test_noise_init_flag(rng):
    import jax
    import jax.numpy as jnp

    from prodiff_tpu.models.prodiff import ProDiffTeacher
    from tests.test_models import HP, _batch

    tokens, mel2ph, f0, mel, lang, spk = _batch(rng)
    # the flag must reach the diffusion submodule (the sampling output itself
    # cannot distinguish inits: posterior_mean_coef2 is 0 at t=0, so the
    # initial noise is fully discarded — the same reason the reference's
    # uniform-init quirk is inaudible)
    for init in ["uniform", "gaussian"]:
        model = ProDiffTeacher(
            vocab_size=12, hparams=dict(HP, diff_noise_init=init)
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            tokens, mel2ph, f0, lang_seq=lang, spk_embed_id=spk, gt_spec=mel,
        )
        bound = model.bind(params, rngs={"diffusion": jax.random.PRNGKey(2)})
        assert bound.diffusion.noise_init == init


@pytest.mark.slow
def test_training_actually_learns(tmp_path):
    """On structured data (mel = f(phoneme) + noise) the x0-prediction loss
    must drop substantially — a real learning check, not just 'not diverging'."""
    import json
    import os

    data_dir = str(tmp_path)
    make_svs_dataset(data_dir, "svs", n_train=16, structured=True)
    hp = small_hparams(data_dir, "svs", max_updates=120, val_check_interval=1000,
                       tb_log_interval=10, lr=0.2, warmup_updates=20)
    task = get_task_cls("svs")(hp)
    trainer = Trainer(hp, mesh=create_mesh(4))
    trainer.fit(task, max_steps=120)
    with open(os.path.join(hp["work_dir"], "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["tr/total_loss"] for r in recs if "tr/total_loss" in r]
    first = np.mean(losses[:2])
    last = np.mean(losses[-2:])
    assert last < first * 0.6, (first, last)


def test_resolve_train_bf16_tristate():
    """bf16: null = auto (platform-dependent; False on this CPU rig);
    explicit true/false and amp always win (round-4 default flip)."""
    from prodiff_tpu.models.prodiff import resolve_train_bf16

    # auto on CPU -> resolved to False, key becomes a concrete bool
    hp = resolve_train_bf16({"bf16": None})
    assert hp["bf16"] is False
    # explicit settings pass through untouched
    assert resolve_train_bf16({"bf16": True})["bf16"] is True
    assert resolve_train_bf16({"bf16": False})["bf16"] is False
    # reference-compat amp: true forces the policy in the model; resolve
    # leaves it alone
    hp_amp = {"bf16": None, "amp": True}
    assert resolve_train_bf16(hp_amp) == hp_amp
