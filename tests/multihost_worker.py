"""Worker for the 2-process jax.distributed test (run via subprocess).

Each process owns 2 virtual CPU devices; together they form a 4-device
``data`` mesh spanning both processes — the CPU stand-in for multi-host TPU
over DCN. Exercises the real multi-host input path: ``shard_batch`` must
build a global jax.Array from process-local rows (the SPMD analogue of the
reference's per-rank ``batches[rank::world]`` slicing,
``component/train_task/base_task.py:123-126``).

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from prodiff_tpu.parallel.mesh import create_mesh, replicate, shard_batch  # noqa: E402


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * num_processes

    mesh = create_mesh()  # global mesh over all 4 devices
    assert mesh.devices.size == 2 * num_processes

    # identical host-global batch on every process (same seed), as the
    # trainer's iterators guarantee
    rng = np.random.default_rng(1234)
    batch = {
        "x": rng.standard_normal((8, 16, 4)).astype(np.float32),
        "w": rng.standard_normal((8,)).astype(np.float32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].shape == (8, 16, 4)
    # fully-addressable is False on a multi-process mesh; the array is global
    assert not sharded["x"].is_fully_addressable

    params = replicate({"scale": jnp.float32(3.0)}, mesh)

    @jax.jit
    def step(params, batch):
        # a global mean over the sharded batch -> XLA inserts the cross-host
        # psum, exactly like the trainer's loss
        return jnp.mean(batch["x"] * params["scale"]) + jnp.mean(batch["w"])

    out = step(params, sharded)
    expect = float(3.0 * batch["x"].mean() + batch["w"].mean())
    got = float(jax.device_get(out))
    assert abs(got - expect) < 1e-5, (got, expect)

    # gradient of the global-mean loss must equal the single-host gradient
    grad = jax.jit(jax.grad(lambda p, b: step(p, b)))(params, sharded)
    g = float(jax.device_get(grad["scale"]))
    assert abs(g - float(batch["x"].mean())) < 1e-5, g

    print(f"MULTIHOST_OK process={process_id} value={got:.6f}")

    if len(sys.argv) > 4:
        data_dir = sys.argv[4]
        run_local_loading(mesh, process_id, data_dir)


def run_local_loading(mesh, process_id, data_dir):
    """Per-process input pipeline: each host loads ONLY its shard's items, and
    shard_batch assembles a correct global array from the local rows."""
    from prodiff_tpu.parallel.mesh import process_data_blocks
    from prodiff_tpu.tasks import get_task_cls
    from prodiff_tpu.utils.synthetic import small_hparams

    hp = small_hparams(data_dir, "svs", max_tokens=100000, max_sentences=8)
    task = get_task_cls("svs")(hp)
    lb = process_data_blocks(mesh)

    it = task.train_iterator(mesh.devices.size, local_block=lb)
    loaded = []
    orig_getitem = type(it.dataset).__getitem__

    def counting(ds, i, _orig=orig_getitem):
        loaded.append(int(i))
        return _orig(ds, i)

    type(it.dataset).__getitem__ = counting
    checks = []
    for batch in it:
        row0, b_global = batch["_local_rows"]
        sharded = shard_batch(batch, mesh)
        x = sharded["mel"]
        assert x.shape[0] == b_global
        # row-position-sensitive checksum of the GLOBAL array, computed by a
        # jitted global reduction (both processes must agree)
        w = jnp.arange(1, b_global + 1, dtype=jnp.float32)
        chk = jax.jit(
            lambda x, w: jnp.sum(jnp.sum(x, axis=(1, 2)) * w)
        )(x, replicate(w, mesh))
        checks.append(float(jax.device_get(chk)))
    type(it.dataset).__getitem__ = orig_getitem

    # every loaded item index must belong to a row this process owns; print
    # them so the parent can assert disjointness + full coverage
    print(
        f"LOCALLOAD_OK process={process_id} "
        f"loaded={sorted(set(loaded))} checks={[round(c, 3) for c in checks]}"
    )


if __name__ == "__main__":
    main()
