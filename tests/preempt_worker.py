"""Subprocess worker for the preemption test: trains until SIGTERM'd.

Run as: python tests/preempt_worker.py DATA_DIR
Prints "STEP <n>" markers so the parent knows when to send SIGTERM, and
"EXITED <global_step>" after the (signal-triggered) fit() returns.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import prodiff_tpu.training.trainer as trainer_mod  # noqa: E402
from prodiff_tpu.parallel.mesh import create_mesh  # noqa: E402
from prodiff_tpu.tasks import get_task_cls  # noqa: E402
from prodiff_tpu.utils.synthetic import small_hparams  # noqa: E402


class EchoWriter(trainer_mod.MetricsWriter):
    """tb_log_interval=1 -> one marker per finished train step."""

    def add_scalars(self, metrics, step, prefix=""):
        super().add_scalars(metrics, step, prefix)
        if prefix == "tr/":
            print(f"STEP {step}", flush=True)


def main():
    data_dir = sys.argv[1]
    # huge val_check_interval: the ONLY checkpoint can come from the signal
    hp = small_hparams(
        data_dir, "svs", max_updates=10000, val_check_interval=100000,
        num_sanity_val_steps=0, tb_log_interval=1,
    )
    task = get_task_cls("svs")(hp)
    trainer_mod.MetricsWriter = EchoWriter
    trainer = trainer_mod.Trainer(hp, mesh=create_mesh(1))
    trainer.fit(task)
    print(f"EXITED {trainer.global_step}", flush=True)


if __name__ == "__main__":
    main()
