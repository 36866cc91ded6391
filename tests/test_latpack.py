"""Native latpack store tests: build, pack, mmap gather, data module."""

import numpy as np
import pytest

from tinyedm_tpu.data import latpack


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("latpack")
    lat_dir = tmp / "latents"
    lab_dir = tmp / "labels"
    lat_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    n = 23
    ref_lat = []
    ref_lab = []
    for i in range(n):
        lat = rng.standard_normal((4, 8, 8)).astype(np.float32)  # CHW like ref
        lab = np.int64(i % 7)
        np.save(lat_dir / f"{i}.npy", lat)
        np.save(lab_dir / f"{i}.npy", lab)
        ref_lat.append(lat.transpose(1, 2, 0))  # expected HWC
        ref_lab.append(int(lab))
    out = tmp / "data.latpack"
    count = latpack.pack(lat_dir, lab_dir, out)
    assert count == n
    return out, np.stack(ref_lat), np.asarray(ref_lab)


def test_open_info(packed):
    path, ref_lat, _ = packed
    store = latpack.PackedLatents(path)
    assert len(store) == 23
    assert (store.h, store.w, store.c) == (8, 8, 4)
    store.close()


def test_gather_correctness(packed):
    path, ref_lat, ref_lab = packed
    store = latpack.PackedLatents(path, gather_threads=3)
    idx = np.asarray([0, 22, 7, 7, 13])
    lat, lab = store.gather(idx)
    assert lat.shape == (5, 8, 8, 4)
    np.testing.assert_array_equal(lab, ref_lab[idx])
    np.testing.assert_allclose(lat, ref_lat[idx], rtol=0, atol=0)
    store.close()


def test_gather_out_of_range(packed):
    path, _, _ = packed
    store = latpack.PackedLatents(path)
    with pytest.raises(IndexError):
        store.gather(np.asarray([100]))
    store.close()


def test_datamodule_epoch(packed):
    path, ref_lat, ref_lab = packed
    dm = latpack.PackedLatentsDataModule(
        batch_size=4, data_file=str(path), val_fraction=0.15
    )
    dm.setup()
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == dm.steps_per_epoch()
    imgs, labs = batches[0]
    assert imgs.shape == (4, 8, 8, 4)
    assert imgs.dtype == np.float32
    # shuffling differs across epochs but is deterministic per epoch
    b0a = list(dm.train_batches(epoch=0))[0][1]
    b0b = list(dm.train_batches(epoch=0))[0][1]
    b1 = list(dm.train_batches(epoch=1))[0][1]
    np.testing.assert_array_equal(b0a, b0b)
    assert not np.array_equal(b0a, b1)
    # val batches draw from the held-out tail and include the remainder
    vals = list(dm.val_batches())
    n_val = 23 - dm._n_train
    assert sum(v[0].shape[0] for v in vals) == n_val


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        latpack.PackedLatents("/nonexistent.latpack")


def test_gather_async_matches_sync(packed):
    path, ref_lat, ref_lab = packed
    store = latpack.PackedLatents(path, gather_threads=3)
    idx = np.asarray([5, 0, 19, 5])
    pending = store.gather_async(idx)
    # the index buffer is copied at submit: clobbering it must not matter
    idx[:] = 0
    lat, lab = pending.wait()
    np.testing.assert_array_equal(lab, ref_lab[[5, 0, 19, 5]])
    np.testing.assert_allclose(lat, ref_lat[[5, 0, 19, 5]], rtol=0, atol=0)
    # wait is idempotent
    lat2, _ = pending.wait()
    assert lat2 is lat
    store.close()


def test_gather_async_out_of_range(packed):
    path, _, _ = packed
    store = latpack.PackedLatents(path)
    pending = store.gather_async(np.asarray([999]))
    with pytest.raises(IndexError):
        pending.wait()
    store.close()


def test_datamodule_prefetch_epoch_identical(packed):
    """prefetch=True must yield byte-identical batches in the same order."""
    path, _, _ = packed
    kw = dict(batch_size=4, data_file=str(path), val_fraction=0.15)
    dm_sync = latpack.PackedLatentsDataModule(prefetch=False, **kw)
    dm_pre = latpack.PackedLatentsDataModule(prefetch=True, **kw)
    dm_sync.setup()
    dm_pre.setup()
    a = list(dm_sync.train_batches(epoch=3))
    b = list(dm_pre.train_batches(epoch=3))
    assert len(a) == len(b) == dm_sync.steps_per_epoch()
    for (la, ya), (lb, yb) in zip(a, b):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(ya, yb)


def test_datamodule_prefetch_abandoned_iterator(packed):
    """Abandoning the generator mid-epoch must not leak writing threads
    (PendingGather.__del__ joins)."""
    path, _, _ = packed
    dm = latpack.PackedLatentsDataModule(
        batch_size=4, data_file=str(path), val_fraction=0.15, prefetch=True
    )
    dm.setup()
    it = dm.train_batches(epoch=0)
    next(it)
    del it  # generator close unwinds with one gather in flight
    # a fresh epoch still works
    assert len(list(dm.train_batches(epoch=0))) == dm.steps_per_epoch()


def test_close_drains_inflight_async_gather(packed):
    """close() with an async gather in flight must wait for the native
    threads before munmapping (otherwise: memcpy from an unmapped region,
    SIGSEGV with no traceback)."""
    path, ref_lat, ref_lab = packed
    store = latpack.PackedLatents(path, gather_threads=3)
    idx = np.asarray([2, 11, 2, 20])
    pending = store.gather_async(idx)
    store.close()  # drains the request, THEN unmaps
    lat, lab = pending.wait()  # idempotent; buffers were filled before close
    np.testing.assert_array_equal(lab, ref_lab[idx])
    np.testing.assert_allclose(lat, ref_lat[idx], rtol=0, atol=0)


def test_datamodule_skip_fast_forwards(packed):
    """train_batches(skip=K) yields exactly the batches K.. of the full
    epoch (mid-epoch preemption resume) without gathering the skipped ones."""
    path, _, _ = packed
    dm = latpack.PackedLatentsDataModule(
        batch_size=4, data_file=str(path), val_fraction=0.15, prefetch=True
    )
    dm.setup()
    full = list(dm.train_batches(epoch=1))
    resumed = list(dm.train_batches(epoch=1, skip=2))
    assert len(resumed) == len(full) - 2
    for (la, ya), (lb, yb) in zip(full[2:], resumed):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(ya, yb)


@pytest.mark.parametrize("process_count", [2, 4])
def test_datamodule_process_local_tiles_global_stream(packed, process_count):
    """Per-host sharded input (VERDICT r3 weak #4): N rank-local modules with
    the same seed gather disjoint contiguous slices that, concatenated in
    rank order, reproduce the single-host global stream batch for batch —
    same shared-seed order, 1/N the IO per process. Matches
    mesh.process_local_slice's rank layout exactly (what shard_batch
    re-assembles via make_array_from_process_local_data)."""
    path, _, _ = packed
    kw = dict(batch_size=4, data_file=str(path), val_fraction=0.15, seed=11)
    global_dm = latpack.PackedLatentsDataModule(
        process_index=0, process_count=1, **kw
    )
    global_dm.setup()
    ranks = []
    for pi in range(process_count):
        dm = latpack.PackedLatentsDataModule(
            process_index=pi, process_count=process_count, **kw
        )
        dm.setup()
        ranks.append(list(dm.train_batches(epoch=2)))
    for b, (g_lat, g_lab) in enumerate(global_dm.train_batches(epoch=2)):
        lat = np.concatenate([ranks[pi][b][0] for pi in range(process_count)])
        lab = np.concatenate([ranks[pi][b][1] for pi in range(process_count)])
        np.testing.assert_array_equal(lat, g_lat)
        np.testing.assert_array_equal(lab, g_lab)
        # disjoint: each rank holds exactly batch/N rows
        assert all(
            ranks[pi][b][0].shape[0] == 4 // process_count
            for pi in range(process_count)
        )
    # mesh.process_local_slice of the global batch == the rank's own gather
    from tinyedm_tpu.parallel.mesh import process_local_slice

    g0 = next(global_dm.train_batches(epoch=2))[0]
    r1 = ranks[1][0][0]
    np.testing.assert_array_equal(
        process_local_slice(g0, 1, process_count), r1
    )


def test_datamodule_process_local_rejects_indivisible(packed):
    path, _, _ = packed
    dm = latpack.PackedLatentsDataModule(
        batch_size=5, data_file=str(path), val_fraction=0.15,
        process_index=0, process_count=2,
    )
    dm.setup()
    with pytest.raises(ValueError, match="not divisible"):
        next(dm.train_batches(epoch=0))
