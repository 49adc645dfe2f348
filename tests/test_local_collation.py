"""Per-process (multi-host) input pipeline: local collation must reproduce
exactly the rows of the single-host global batch, loading only its own items
(the index-level ``batches[rank::world]`` analogue,
``component/train_task/base_task.py:123-126``)."""

import numpy as np
import pytest

from prodiff_tpu.tasks import get_task_cls
from prodiff_tpu.utils.synthetic import make_svs_dataset, small_hparams


class _CountingDataset:
    """Wrap a BaseDataset to record which item indices get loaded."""

    def __init__(self, ds):
        self._ds = ds
        self.loaded = []

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        self.loaded.append(int(i))
        return self._ds[i]


@pytest.fixture(scope="module")
def svs_data(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("lc_data"))
    make_svs_dataset(data_dir, "svs", n_train=16, n_valid=6)
    return data_dir


def _iter_with_block(task, n_devices, local_block):
    # train iterator: multi-sentence batches (val defaults to 1/batch); its
    # shuffle is seeded per-instance, so repeated iterators see identical
    # batches — the property the multi-host contract relies on
    it = task.train_iterator(n_devices, local_block=local_block)
    counting = _CountingDataset(it.dataset)
    it.dataset = counting
    return list(it), counting.loaded


def test_local_shards_reassemble_global_batch(svs_data):
    # big token budget: items form multi-row batches, so each simulated
    # process owns a disjoint non-empty row range
    hp = small_hparams(svs_data, "svs", max_tokens=100000, max_sentences=8)
    task = get_task_cls("svs")(hp)
    n_dev = 4
    global_batches, all_loaded = _iter_with_block(task, n_dev, None)
    # two simulated processes, each owning 2 of the 4 data blocks
    parts = []
    loads = []
    for lo, hi in [(0, 2), (2, 4)]:
        batches, loaded = _iter_with_block(task, n_dev, (lo, hi, n_dev))
        parts.append(batches)
        loads.append(set(loaded))
    assert len(parts[0]) == len(parts[1]) == len(global_batches)

    for gb, b0, b1 in zip(global_batches, parts[0], parts[1]):
        row0_a, b_pad_a = b0.pop("_local_rows")
        row0_b, b_pad_b = b1.pop("_local_rows")
        assert b_pad_a == b_pad_b
        assert row0_a == 0 and row0_b == b_pad_a // 2
        nsamples = gb.pop("nsamples")
        assert b0.pop("nsamples") == nsamples and b1.pop("nsamples") == nsamples
        for k, gv in gb.items():
            lv = np.concatenate([b0[k], b1[k]], axis=0)
            assert lv.shape == gv.shape, (k, lv.shape, gv.shape)
            np.testing.assert_array_equal(lv, gv, err_msg=k)

    # each simulated process touched ONLY its own rows; together they loaded
    # every item exactly as the global path did
    assert loads[0].isdisjoint(loads[1])
    assert loads[0] | loads[1] <= set(all_loaded)


def test_local_collation_requires_sidecar(tmp_path):
    import os

    data_dir = str(tmp_path)
    make_svs_dataset(data_dir, "svs")
    os.remove(os.path.join(data_dir, "svs", "valid_item_lengths.npz"))
    hp = small_hparams(data_dir, "svs")
    task = get_task_cls("svs")(hp)
    with pytest.raises(ValueError, match="item_lengths"):
        task.val_iterator(4, local_block=(0, 2, 4))


def test_local_shards_all_padding_process(svs_data):
    """A process whose rows are all padding yields typed zero arrays."""
    hp = small_hparams(svs_data, "svs", max_tokens=100000, max_sentences=3)
    task = get_task_cls("svs")(hp)
    # batches of 3 rows pad to 4; blocks (3,4) of 4 own only padding rows
    batches, _ = _iter_with_block(task, 4, (3, 4, 4))
    assert batches
    for b in batches:
        row0, b_pad = b.pop("_local_rows")
        n_local = b_pad // 4
        if row0 >= b.pop("nsamples"):
            assert (b["mel"] == 0).all()
        assert b["mel"].shape[0] == n_local
