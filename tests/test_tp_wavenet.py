"""Tensor-parallel WaveNet: numerical parity with the single-chip XLA path
and an end-to-end 2-step training run on a (data=4, model=2) mesh — the
scale-out beyond the reference's DP-only design (SURVEY §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prodiff_tpu.models.wavenet import WaveNet
from prodiff_tpu.parallel.mesh import create_mesh


@pytest.fixture
def setup(rng):
    net = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                  residual_channels=128, dilation_cycle_length=1,
                  use_pallas=False)
    B, T = 4, 24
    x = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    t = jnp.asarray([0, 1, 2, 3])
    cond = jnp.asarray(rng.normal(size=(B, T, 32)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x, t, cond)
    params = jax.tree.map(
        lambda a: a if a.ndim == 0 else a + 0.01 * np.random.default_rng(1)
        .normal(size=a.shape).astype(np.float32),
        params,
    )
    return net, params, x, t, cond


def test_tp_matches_single_chip(setup):
    net, params, x, t, cond = setup
    want = np.asarray(net.apply(params, x, t, cond))

    mesh = create_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    tp_net = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                     residual_channels=128, dilation_cycle_length=1,
                     use_pallas=False, tp_axis="model", tp_size=2)
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(tp_net.apply)(params, x, t, cond))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_tp_grads_match_single_chip(setup):
    net, params, x, t, cond = setup
    probe = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 24, 16)).astype(np.float32)
    )

    def loss(p, module):
        return jnp.sum(module.apply(p, x, t, cond) * probe)

    want = jax.grad(lambda p: loss(p, net))(params)
    mesh = create_mesh(8, model_parallel=2)
    tp_net = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                     residual_channels=128, dilation_cycle_length=1,
                     use_pallas=False, tp_axis="model", tp_size=2)
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(lambda p: loss(p, tp_net)))(params)
    for (path, gw), gg in zip(
        jax.tree.flatten_with_path(want)[0], jax.tree.leaves(got)
    ):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), atol=1e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_trainer_dp_tp_mesh(tmp_path):
    """Full trainer fit on a (data=4, model=2) mesh via model_parallel=2."""
    from prodiff_tpu.tasks import get_task_cls
    from prodiff_tpu.training.trainer import Trainer
    from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams

    data_dir = str(tmp_path / "data")
    make_svs_dataset(data_dir, "svs", n_train=8, n_valid=2)
    hp = small_hparams(
        data_dir, "svs", max_updates=2, val_check_interval=1000,
        num_sanity_val_steps=0,
    )
    hp["work_dir"] = str(tmp_path / "work")
    hp["model_parallel"] = 2
    task = get_task_cls("svs")(hp)
    trainer = Trainer(hp)
    assert trainer.mesh.shape == {"data": 4, "model": 2}
    state = trainer.fit(task, max_steps=2)
    assert int(state["step"]) == 2


def test_sp_sequence_sharding_matches(setup):
    """Sequence-parallel denoiser (T sharded over the model axis; GSPMD conv
    halos) matches the unsharded forward."""
    net, params, x, t, cond = setup
    want = np.asarray(net.apply(params, x, t, cond))
    mesh = create_mesh(8, model_parallel=2)
    sp_net = WaveNet(in_dims=16, hidden_size=32, residual_layers=4,
                     residual_channels=128, dilation_cycle_length=1,
                     use_pallas=False, sp_axis="model")
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(sp_net.apply)(params, x, t, cond))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
