"""Data loading: batching, iteration, prefetch, sample preparation.

Counterpart of the reference's missing ``lavis/datasets/data_utils.py`` /
``datasets/dataloader_utils.py`` (imported at runner_base.py:28-40):
``DataLoader`` (shuffling batcher over an item dataset), ``IterLoader``
(infinite epoch-reentrant iterator), ``MultiIterLoader`` (ratio-weighted
sampling across loaders), ``PrefetchLoader`` (device-put one batch ahead),
``prepare_sample`` (host→device transfer), ``concat_datasets`` /
``reorg_datasets_by_split``.

Multi-host: each process loads its shard via (rank, world) slicing — the
``DistributedSampler`` equivalent.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def prepare_sample(samples: Dict[str, Any], sharding=None) -> Dict[str, Any]:
    """numpy → device arrays (cuda-move equivalent); non-array fields pass
    through for host-side use (answers, ids)."""
    import jax

    out = {}
    for k, v in samples.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = (jax.device_put(v, sharding) if sharding is not None
                      else jax.device_put(v))
        else:
            out[k] = v
    return out


class DataLoader:
    """Minimal map-style loader: shuffle, batch via dataset.collater, drop
    or keep the ragged tail, shard across processes."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 rank: int = 0, world_size: int = 1,
                 collate_fn=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.rank = rank
        self.world_size = world_size
        self.collate_fn = collate_fn or getattr(dataset, "collater", None)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    @property
    def _streaming(self) -> bool:
        """Iterable-only datasets (e.g. LaionDataset tar streams) have no
        __len__/__getitem__; they batch by draining the iterator.  Cross-
        host sharding happens INSIDE such datasets (shard-level
        process_index slicing), not by index arithmetic here.

        Multi-host caveat: unlike the map path (which pads so every rank
        sees the SAME number of batches per epoch), per-host batch counts
        from a stream differ (shards differ in size), and the final batch
        may be ragged.  Epoch-style lock-step iteration would desync
        cross-host collectives — drive streams with the ITERATION-driven
        runner (runner_iter / iters_per_inner_epoch), which bounds every
        host to the same step count."""
        return not hasattr(self.dataset, "__len__")

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.world_size > 1:
            # pad to a multiple so every rank sees the same #batches
            pad = (-len(idx)) % self.world_size
            idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.rank:: self.world_size]
        return idx

    def __len__(self):
        if self._streaming:
            raise TypeError(
                "streaming dataset has no length — drive it with "
                "runner_iter / iters_per_inner_epoch instead of epoch "
                "counts")
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        if self._streaming:
            buf = []
            for item in self.dataset:
                buf.append(item)
                if len(buf) == self.batch_size:
                    yield (self.collate_fn(buf) if self.collate_fn
                           else buf)
                    buf = []
            if buf and not self.drop_last:
                yield self.collate_fn(buf) if self.collate_fn else buf
            return
        idx = self._indices()
        bs = self.batch_size
        stop = len(idx) - (len(idx) % bs) if self.drop_last else len(idx)
        for s in range(0, stop, bs):
            items = [self.dataset[int(i)] for i in idx[s: s + bs]]
            yield self.collate_fn(items) if self.collate_fn else items


class IterLoader:
    """Infinite iterator that re-enters epochs and bumps set_epoch
    (reference dataloader_utils.IterLoader)."""

    def __init__(self, loader, use_distributed: bool = False):
        self._loader = loader
        self._iter = iter(loader)
        self._epoch = 0

    @property
    def epoch(self):
        return self._epoch

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._iter)
        except StopIteration:
            self._epoch += 1
            if hasattr(self._loader, "set_epoch"):
                self._loader.set_epoch(self._epoch)
            self._iter = iter(self._loader)
            return next(self._iter)


class MultiIterLoader:
    """Sample among loaders with given ratios (reference MultiIterLoader)."""

    def __init__(self, loaders: Sequence, ratios: Optional[Sequence[float]] = None,
                 seed: int = 0):
        self.loaders = [ld if isinstance(ld, IterLoader) else IterLoader(ld)
                        for ld in loaders]
        r = np.asarray(ratios if ratios is not None
                       else [1.0] * len(loaders), np.float64)
        self.probs = r / r.sum()
        self.rng = np.random.default_rng(seed)

    def __next__(self):
        i = int(self.rng.choice(len(self.loaders), p=self.probs))
        return next(self.loaders[i])

    def __iter__(self):
        return self


class PrefetchLoader:
    """Overlap host batch prep + H2D with device compute: a worker thread
    keeps ``depth`` prepared batches queued."""

    def __init__(self, loader, sharding=None, depth: int = 2):
        self.loader = loader
        self.sharding = sharding
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()

        def work():
            try:
                for b in self.loader:
                    q.put(prepare_sample(b, self.sharding))
            finally:
                q.put(END)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is END:
                break
            yield b


# ---------------------------------------------------------------------------
# dataset dict reorg (reference data_utils)
# ---------------------------------------------------------------------------


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._starts = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._starts[-1])

    def __getitem__(self, i):
        d = int(np.searchsorted(self._starts, i, side="right") - 1)
        return self.datasets[d][i - int(self._starts[d])]

    def collater(self, items):
        return self.datasets[0].collater(items)


def concat_datasets(datasets: List) -> "ConcatDataset":
    return ConcatDataset(datasets)


def reorg_datasets_by_split(datasets: Dict[str, Dict[str, Any]]
                            ) -> Dict[str, List]:
    """{name: {split: ds}} → {split: [ds, ...]}"""
    out: Dict[str, List] = {}
    for _, by_split in datasets.items():
        for split, ds in by_split.items():
            out.setdefault(split, []).append(ds)
    return out
