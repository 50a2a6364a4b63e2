"""Threaded prefetching loader feeding device-resident CellGraph batches.

Replaces the reference's 4-worker torch DataLoader + file_system sharing
hack (train.py:391,433; SURVEY.md §2.3 P11). Worker threads run the numpy
pipeline (proto load, FPS, kNN, ELL transpose) in parallel — these release
the GIL inside numpy — while the main thread overlaps ``jax.device_put``
with compute via a bounded prefetch queue (double buffering).

Determinism: batch composition is a pure function of (seed, epoch) — the
shuffle uses its own Generator — and each sample's graph CONTENT is a pure
function of (seed, patch, epoch), reproducible regardless of thread
scheduling. The one scheduling-dependent quantity is padding width: the
grow-only sticky BSR caps mean a batch's blk_cols slot count can differ
run-to-run depending on which batches other workers built first (the extra
slots are masked zero-padding — numerics are unaffected, array shapes may
differ).
"""

from __future__ import annotations

import functools
import math
import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
import jax

from cgcnet_tpu.core.graph import CellGraph
from cgcnet_tpu.dataflow.dataset import (
    NucleiGraphDataset,
    attach_bsr_meta,
    collate,
)

# ---------------------------------------------------------------------------
# Wire packing: one host->device transfer per batch.
#
# Every batch field is 4 bytes wide (f32 data/masks, i32 indices), so the
# whole batch concatenates into ONE f32 buffer reinterpreted on device with
# bitcasts. Through the axon tunnel each device_put pays per-call latency
# and small-transfer bandwidth penalties — the 9-13 per-leaf puts cost
# ~13 ms/batch at the canonical shape, the single packed put ~5 ms.
# ---------------------------------------------------------------------------

_WIRE_KEYS = (
    "x", "nbr", "nbr_mask", "nbr_t", "nbr_t_mask", "n_nodes", "y",
    "patch_idx", "blk_cols", "blk_mask", "blk_cols_t", "blk_mask_t",
)


def pack_wire(batch: dict) -> tuple[np.ndarray, tuple]:
    """Concatenate all batch fields into one f32 wire buffer (worker-thread
    copy, ~0.5 ms) + a hashable static layout for the device-side unpack."""
    parts, layout = [], []
    for k in _WIRE_KEYS:
        if k not in batch:
            continue
        a = np.ascontiguousarray(batch[k])
        assert a.dtype.itemsize == 4, (k, a.dtype)
        parts.append(a.ravel().view(np.float32))
        layout.append((k, a.shape, a.dtype.kind == "i"))
    return np.concatenate(parts), tuple(layout)


@functools.lru_cache(maxsize=None)
def _unpack_fn(layout: tuple):
    import jax.numpy as jnp

    def unpack(wire):
        out, off = {}, 0
        for k, shape, is_int in layout:
            size = math.prod(shape)
            a = wire[off : off + size].reshape(shape)
            if is_int:
                a = jax.lax.bitcast_convert_type(a, jnp.int32)
            out[k] = a
            off += size
        return out
    return jax.jit(unpack)


def wire_to_cellgraph(wire: np.ndarray, layout: tuple, device=None) -> CellGraph:
    """One device_put + one jitted slice/bitcast unpack -> CellGraph."""
    dev = _unpack_fn(layout)(jax.device_put(wire, device))
    opt = lambda k: dev.get(k)
    return CellGraph(
        x=dev["x"],
        nbr=dev["nbr"],
        nbr_mask=dev["nbr_mask"],
        n_nodes=dev["n_nodes"],
        y=dev["y"],
        patch_idx=dev["patch_idx"],
        nbr_t=dev["nbr_t"],
        nbr_t_mask=dev["nbr_t_mask"],
        blk_cols=opt("blk_cols"),
        blk_mask=opt("blk_mask"),
        blk_cols_t=opt("blk_cols_t"),
        blk_mask_t=opt("blk_mask_t"),
    )


def batch_to_cellgraph(
    batch: dict, device=None, sharding=None, process_local: bool = False
) -> CellGraph:
    """Device-put a collated batch. ``process_local``: the dict holds only
    this process's slice of the global batch — assemble the global arrays
    from per-process shards (multi-host data loading; each host reads only
    its own patches)."""
    if process_local:
        put = lambda a: jax.make_array_from_process_local_data(sharding, a)
    else:
        put = lambda a: jax.device_put(a, sharding or device)
    opt = lambda k: put(batch[k]) if k in batch else None
    return CellGraph(
        x=put(batch["x"]),
        nbr=put(batch["nbr"]),
        nbr_mask=put(batch["nbr_mask"]),
        n_nodes=put(batch["n_nodes"]),
        y=put(batch["y"]),
        patch_idx=put(batch["patch_idx"]),
        nbr_t=put(batch["nbr_t"]),
        nbr_t_mask=put(batch["nbr_t_mask"]),
        blk_cols=opt("blk_cols"),
        blk_mask=opt("blk_mask"),
        blk_cols_t=opt("blk_cols_t"),
        blk_mask_t=opt("blk_mask_t"),
    )


class GraphLoader:
    """Iterate device-ready CellGraph batches for one epoch at a time."""

    def __init__(
        self,
        dataset: NucleiGraphDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        num_workers: int = 0,
        prefetch: int = 2,
        drop_last: bool = False,
        seed: int = 0,
        sharding=None,
        dynamic_buckets: bool = False,
        bsr_blocks: int | None = None,
        process_shard: bool = False,
        wire: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # 0 = auto: one worker per *usable* core (build_patch is native and
        # GIL-free, so throughput scales with real cores). Usable = the CPU
        # affinity/cgroup quota, NOT os.cpu_count() (a 2-of-64-core container
        # must not spawn 64 threads), divided by the process count so
        # co-located multi-host processes never oversubscribe one host
        # (conservative: real fleets with one process per host should set
        # num_workers explicitly).
        if num_workers <= 0:
            try:
                cores = len(os.sched_getaffinity(0))
            except AttributeError:  # non-Linux
                cores = os.cpu_count() or 1
            self.num_workers = max(1, cores // max(1, jax.process_count()))
        else:
            self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self.sharding = sharding
        # Multi-host data loading: each process builds ONLY its slice of
        # every global batch (the epoch order is a pure function of
        # (seed, epoch), so all processes agree on the composition) and the
        # global arrays are assembled from per-process shards. Requires a
        # NamedSharding over the batch axis and batch_size divisible by the
        # process count.
        self.process_shard = process_shard
        self.wire = wire
        if process_shard:
            assert sharding is not None, "process_shard needs a sharding"
            assert batch_size % jax.process_count() == 0, (
                batch_size, jax.process_count()
            )
            # a ragged final batch cannot be split evenly across processes
            assert drop_last, "process_shard requires drop_last"
            # bucket capacity would be computed from each process's local
            # slice and diverge across hosts
            assert not dynamic_buckets, (
                "process_shard requires a fixed node capacity"
            )
        # fixed capacity (reference-style) unless dynamic bucketing is on
        self.capacity = None if dynamic_buckets else dataset.capacity
        self.bsr_blocks = (
            dataset.cfg.bsr_blocks if bsr_blocks is None else bsr_blocks
        )
        # grow-only per-direction BSR cap floors shared across all batches
        # this loader builds: one compiled train-step shape after warmup
        # (benign worker races — dict writes are GIL-atomic, caps only grow)
        self._sticky_caps: dict = {}

    def _epoch_order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        return idx

    def batches_per_epoch(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[CellGraph]:
        """Yield batches for the given epoch (epoch selects the sampling
        stream — the analog of the reference's set_epoch/set_val_epoch,
        dataflow/data.py:186-190)."""
        order = self._epoch_order(epoch)
        if self.drop_last:
            order = order[: (len(order) // self.batch_size) * self.batch_size]
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]

        fast = self.dataset.supports_fast_path()
        quantize_meta = not self.process_shard

        sticky = None if self.process_shard else self._sticky_caps

        def build_slow(idxs):
            samples = [self.dataset.get(int(i), epoch) for i in idxs]
            batch = collate(samples, self.capacity, 0)
            if self.bsr_blocks > 0:
                attach_bsr_meta(
                    batch, self.bsr_blocks, quantize_meta, sticky_caps=sticky
                )
            return batch

        def bucket_capacity(idxs):
            # dynamic buckets: 128 * next power of two over the batch's
            # sampled node counts (same quantization as collate, so the fast
            # and numpy paths produce identical shapes)
            need = max(
                self.dataset.sampled_count(int(i), epoch) for i in idxs
            )
            cap = 128
            while cap < need:
                cap *= 2
            return cap

        def build(idxs):
            # whole batch per task: sample gets AND collate run inside the
            # worker, so the consumer thread only does device_put. Fast
            # path: every patch is ONE GIL-free native call writing straight
            # into the batch buffers (dataset.fill_into).
            if not fast:
                return build_slow(idxs)
            ds = self.dataset
            b = len(idxs)
            cap = self.capacity or bucket_capacity(idxs)
            k, kt = ds.cfg.max_neighbours, ds.transpose_width
            f = {"c": 2, "a": 16, "ca": 18}[ds.cfg.feature_type]
            batch = {
                "x": np.empty((b, cap, f), np.float32),
                "nbr": np.empty((b, cap, k), np.int32),
                "nbr_mask": np.empty((b, cap, k), np.float32),
                "nbr_t": np.empty((b, cap, kt), np.int32),
                "nbr_t_mask": np.empty((b, cap, kt), np.float32),
                "n_nodes": np.empty(b, np.int32),
                "y": np.empty(b, np.int32),
                "patch_idx": np.asarray([int(i) for i in idxs], np.int32),
            }
            for bi, i in enumerate(idxs):
                n, y = ds.fill_into(
                    int(i), epoch,
                    batch["x"][bi], batch["nbr"][bi], batch["nbr_mask"][bi],
                    batch["nbr_t"][bi], batch["nbr_t_mask"][bi],
                )
                if n < 0:
                    if self.process_shard:
                        raise RuntimeError(
                            "transpose width overflow in process-sharded "
                            "loading; raise dataset.transpose_width so all "
                            "hosts agree on shapes"
                        )
                    # transpose width overflow: numpy path widens this
                    # batch; widen the dataset's nominal width so later
                    # batches stay on the fast path (benign worker race)
                    self.dataset.transpose_width = min(kt * 2, 1024)
                    return build_slow(idxs)
                batch["n_nodes"][bi] = n
                batch["y"][bi] = y
            if self.bsr_blocks > 0:
                attach_bsr_meta(
                    batch, self.bsr_blocks, quantize_meta, sticky_caps=sticky
                )
            return batch

        if self.process_shard:
            # build only this process's rows of each global batch
            pid, nproc = jax.process_index(), jax.process_count()
            per = self.batch_size // nproc
            batches = [b[pid * per : (pid + 1) * per] for b in batches]

        # single-transfer wire packing: only for unsharded (single-device)
        # placement — a sharded put must keep per-leaf batch-axis layouts
        use_wire = (
            self.wire
            and not self.process_shard
            and (
                self.sharding is None
                or isinstance(self.sharding, jax.sharding.SingleDeviceSharding)
            )
        )

        def build_task(idxs):
            batch = build(idxs)
            if not use_wire:
                return batch
            # dispatch the device transfer + unpack from the worker thread:
            # through the axon tunnel every dispatch costs ~4 ms of calling-
            # thread latency, which serializes the consumer when done at
            # yield time; from the workers the latencies overlap and the
            # consumer receives device-ready graphs
            wire, layout = pack_wire(batch)
            return wire_to_cellgraph(wire, layout, self.sharding)

        window = max(self.num_workers, self.prefetch + 1)
        with ThreadPoolExecutor(self.num_workers) as ex:
            futs: deque = deque()
            submitted = 0
            for _ in range(len(batches)):
                while submitted < len(batches) and len(futs) < window:
                    futs.append(ex.submit(build_task, batches[submitted]))
                    submitted += 1
                # (the final batch may be smaller; jit caches one extra shape)
                got = futs.popleft().result()
                if use_wire:
                    yield got
                else:
                    yield batch_to_cellgraph(
                        got,
                        sharding=self.sharding,
                        process_local=self.process_shard,
                    )
