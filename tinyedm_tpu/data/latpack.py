"""ctypes bindings + data module for the native latpack store (native/latpack.cc).

Build: compiled on demand with g++ into native/build/liblatpack.so (no
pybind11 in this environment; plain C ABI + ctypes). See latpack.cc for the
design rationale (replaces the reference's per-sample .npy + DataLoader
workers with one packed file + mmap'd multithreaded gather).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "latpack.cc"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "liblatpack.so"

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> Path:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    # compile to a per-process temp path and atomically rename: concurrent
    # processes (multi-host launches, pytest-xdist) racing an in-place -o
    # could dlopen a half-written .so
    tmp = _LIB.with_name(f".liblatpack.{os.getpid()}.tmp.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
    finally:
        tmp.unlink(missing_ok=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.latpack_pack.restype = ctypes.c_long
        lib.latpack_pack.argtypes = [ctypes.c_char_p] * 3
        lib.latpack_open.restype = ctypes.c_void_p
        lib.latpack_open.argtypes = [ctypes.c_char_p]
        lib.latpack_info.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_uint32)
        ] * 4
        lib.latpack_gather.restype = ctypes.c_int
        lib.latpack_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.latpack_gather_async.restype = ctypes.c_void_p
        lib.latpack_gather_async.argtypes = lib.latpack_gather.argtypes
        lib.latpack_wait.restype = ctypes.c_int
        lib.latpack_wait.argtypes = [ctypes.c_void_p]
        lib.latpack_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def pack(latents_dir: str | Path, labels_dir: str | Path, out_path: str | Path) -> int:
    """Pack per-sample npy latents/labels into one latpack file. Returns n."""
    lib = _load()
    n = lib.latpack_pack(
        str(latents_dir).encode(), str(labels_dir).encode(), str(out_path).encode()
    )
    if n < 0:
        raise RuntimeError(f"latpack_pack failed with code {n}")
    return int(n)


class PackedLatents:
    """mmap-backed random-access latent store."""

    def __init__(self, path: str | Path, gather_threads: int = 4):
        self._lib = _load()
        self._handle = self._lib.latpack_open(str(path).encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot open latpack file {path}")
        n = ctypes.c_uint32()
        h = ctypes.c_uint32()
        w = ctypes.c_uint32()
        c = ctypes.c_uint32()
        self._lib.latpack_info(
            self._handle,
            ctypes.byref(n), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
        )
        self.n, self.h, self.w, self.c = n.value, h.value, w.value, c.value
        self.gather_threads = gather_threads
        # in-flight async gathers: close() must not munmap while native
        # threads still copy from the mapping (segfault, no traceback)
        self._pending: set = set()

    def __len__(self) -> int:
        return self.n

    def _live_handle(self):
        # a gather on a closed store would pass NULL to native code and
        # segfault with no traceback; make it a diagnosable Python error
        if not self._handle:
            raise ValueError("PackedLatents store is closed")
        return self._handle

    def gather(self, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        handle = self._live_handle()
        indices = np.ascontiguousarray(indices, np.int64)
        count = len(indices)
        out = np.empty((count, self.h, self.w, self.c), np.float32)
        labels = np.empty((count,), np.int32)
        rc = self._lib.latpack_gather(
            handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.gather_threads,
        )
        if rc != 0:
            raise IndexError("latpack_gather: index out of range")
        return out, labels

    def gather_async(self, indices: np.ndarray) -> "PendingGather":
        """Submit a gather to native background threads; returns a handle
        whose .wait() yields (latents, labels). Double-buffer input with it:
        submit batch k+1 before handing batch k to the trainer — the copy
        overlaps the train step with zero Python-thread (GIL) involvement."""
        handle = self._live_handle()
        indices = np.ascontiguousarray(indices, np.int64)
        count = len(indices)
        out = np.empty((count, self.h, self.w, self.c), np.float32)
        labels = np.empty((count,), np.int32)
        req = self._lib.latpack_gather_async(
            handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.gather_threads,
        )
        if not req:
            raise RuntimeError("latpack_gather_async failed to submit")
        pg = PendingGather(self, req, out, labels)
        self._pending.add(pg)
        return pg

    def close(self) -> None:
        if self._handle:
            for pg in list(self._pending):  # drain in-flight gathers first
                try:
                    pg.wait()
                except IndexError:
                    pass
            self._lib.latpack_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PendingGather:
    """In-flight async gather. Holds the store and output buffers alive until
    the native threads land; .wait() (idempotent) returns (latents, labels)."""

    def __init__(self, store: PackedLatents, req: int, out, labels):
        self._store = store  # keeps the mmap handle alive while in flight
        self._req = req
        self._out = out
        self._labels = labels
        self._rc = 0

    def wait(self) -> tuple[np.ndarray, np.ndarray]:
        if self._req:
            self._rc = self._store._lib.latpack_wait(self._req)
            self._req = None
            self._store._pending.discard(self)
        if self._rc != 0:
            # remembered across calls: a retried wait() after the first
            # raise must keep raising, not hand back the partially-written
            # buffers as if the gather had succeeded
            raise IndexError("latpack_gather: index out of range")
        return self._out, self._labels

    def __del__(self):
        # finalizers can never raise — but the data-corruption-class failure
        # (an abandoned gather with out-of-range rows) must not vanish
        # silently either: surface it as a warning, swallow everything else
        # (interpreter-shutdown finalization can fail in mundane ways).
        try:
            self.wait()  # never leave native threads writing into freed numpy
        except IndexError:
            try:
                import warnings

                warnings.warn(
                    "latpack: abandoned async gather failed with index out "
                    "of range — a dropped generator was reading past the "
                    "store",
                    RuntimeWarning,
                )
            except Exception:
                pass
        except Exception as e:
            # native gather errors besides out-of-range are also
            # data-corruption-class — warn (best-effort) rather than vanish;
            # only the warn itself may fail silently (interpreter shutdown)
            try:
                import warnings

                warnings.warn(
                    f"latpack: abandoned async gather failed: {e!r}",
                    RuntimeWarning,
                )
            except Exception:
                pass


class PackedLatentsDataModule:
    """Drop-in ImageNetLatentsDataModule alternative backed by latpack.

    The dataset never loads into Python memory: batches are gathered from the
    mmap'd file by native threads (the OS page cache does the rest). With
    ``prefetch=True`` (default) batch k+1's gather is submitted before batch
    k is yielded, overlapping the copy with the train step on native threads
    — no Python thread, so the GIL/dispatch contention that made
    Python-level input prefetch a measured negative (BENCH.md round 3) does
    not apply.
    """

    def __init__(
        self,
        batch_size: int,
        data_file: str,
        num_workers: int = 4,  # -> native gather threads
        val_fraction: float = 0.01,
        num_classes: int = 1000,
        seed: int = 0,
        prefetch: bool = True,
        process_index: Optional[int] = None,  # default: jax.process_index()
        process_count: Optional[int] = None,  # default: jax.process_count()
    ):
        self.batch_size = batch_size
        self.data_file = data_file
        self.num_workers = max(1, num_workers)
        self.val_fraction = val_fraction
        self.num_classes = num_classes
        self.seed = seed
        self.prefetch = prefetch
        self._process_index = process_index
        self._process_count = process_count
        self._store: Optional[PackedLatents] = None
        self._n_val = 0

    # train_batches yields only THIS process's rows of each global batch
    # (same shared-seed order on every host, disjoint contiguous rank slices
    # — exactly mesh.process_local_slice's layout, gathered instead of
    # sliced). The trainer sees this flag and skips its own slicing
    # (shard_batch(process_local=True)); multi-host memory and gather IO
    # then scale as 1/N. The reference got this implicitly from per-process
    # DataLoader workers (abstract_datamodule.py:25-59).
    yields_process_local = True

    @property
    def _ranks(self) -> tuple[int, int]:
        pi, pc = self._process_index, self._process_count
        if pi is None or pc is None:
            import jax

            pi = jax.process_index() if pi is None else pi
            pc = jax.process_count() if pc is None else pc
        return pi, pc

    def prepare_data(self) -> None: ...

    def setup(self, stage: str = "fit") -> None:
        self._store = PackedLatents(self.data_file, gather_threads=self.num_workers)
        self._n_val = max(1, int(self._store.n * self.val_fraction))

    @property
    def _n_train(self) -> int:
        return self._store.n - self._n_val

    def steps_per_epoch(self, drop_last: bool = True) -> int:
        if not drop_last:
            raise NotImplementedError(
                "PackedLatentsDataModule always drops the tail batch (fixed "
                "compiled batch shape + process-divisible rank slices); "
                "drop_last=False would silently train a different step count"
            )
        return self._n_train // self.batch_size

    def train_batches(self, epoch: int, drop_last: bool = True, skip: int = 0) -> Iterator:
        """``skip`` fast-forwards past the first K batches without touching
        the store (mid-epoch preemption resume — no gather, no page-cache
        traffic for already-consumed batches).

        Multi-host: yields this process's contiguous rank-slice of each
        global batch (see ``yields_process_local``); the permutation is the
        shared-seed global order, so rank slices concatenated across
        processes reproduce the single-host stream exactly."""
        assert self._store is not None, "call setup() first"
        if not drop_last:
            raise NotImplementedError(
                "PackedLatentsDataModule always drops the tail batch — see "
                "steps_per_epoch"
            )
        pi, pc = self._ranks
        if self.batch_size % pc != 0:
            raise ValueError(
                f"global batch {self.batch_size} not divisible by {pc} processes"
            )
        per = self.batch_size // pc
        lo = pi * per
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(self._n_train)
        stop = self._n_train - self._n_train % self.batch_size
        starts = range(skip * self.batch_size, stop, self.batch_size)
        if not self.prefetch:
            for start in starts:
                yield self._store.gather(order[start + lo : start + lo + per])
            return
        # double buffer: batch k+1 gathers on native threads while the
        # caller trains on batch k
        pending = None
        for start in starts:
            nxt = self._store.gather_async(order[start + lo : start + lo + per])
            if pending is not None:
                yield pending.wait()
            pending = nxt
        if pending is not None:
            yield pending.wait()

    def val_batches(self) -> Iterator:
        assert self._store is not None, "call setup() first"
        idx = np.arange(self._n_train, self._store.n)
        # include the tail: a val set smaller than one batch must still count
        for start in range(0, len(idx), self.batch_size):
            yield self._store.gather(idx[start : start + self.batch_size])

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x)


def main(argv=None) -> None:
    """CLI: python -m tinyedm_tpu.data.latpack <latents_dir> <labels_dir> <out.latpack>"""
    import argparse

    p = argparse.ArgumentParser(description="Pack npy latents into a latpack file")
    p.add_argument("latents_dir")
    p.add_argument("labels_dir")
    p.add_argument("out_path")
    args = p.parse_args(argv)
    n = pack(args.latents_dir, args.labels_dir, args.out_path)
    print(f"packed {n} samples -> {args.out_path}")


if __name__ == "__main__":
    main()
