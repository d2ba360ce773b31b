"""Data loading: threaded map-style loader + iteration wrappers.

Replaces torch DataLoader / the reference's wrappers
(minigpt4/datasets/datasets/dataloader_utils.py): ``DataLoader`` (thread
pool over ``__getitem__`` + collate), ``IterLoader`` (infinite
epoch-wrapping iterator, :145-181), ``MultiIterLoader`` (ratio sampling
across datasets, :15-43) and ``PrefetchLoader`` (device prefetch — the
CUDA-stream prefetcher becomes an async ``jax.device_put`` one batch
ahead, :46-129).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np


class DataLoader:
    """Map-style loader: shuffle, batch, collate, optional worker threads.

    NSA synthesis and JPEG decode release the GIL inside cv2/PIL, so a
    thread pool gives real parallelism without process-fork overhead.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        sampler: Optional["DistributedSampler"] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn or getattr(dataset, "collater", _default_collate)
        self.sampler = sampler
        self._epoch = 0
        self._seed = seed

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        if self.sampler is not None:
            return np.asarray(list(iter(self.sampler)))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(idx)
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.num_workers <= 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return

        def fetch(b):
            return self.collate_fn([self.dataset[int(i)] for i in b])

        with ThreadPoolExecutor(self.num_workers) as pool:
            futures = [pool.submit(fetch, b) for b in batches[: 2 * self.num_workers]]
            next_submit = len(futures)
            for i in range(len(batches)):
                yield futures[i].result()
                futures[i] = None
                if next_submit < len(batches):
                    futures.append(pool.submit(fetch, batches[next_submit]))
                    next_submit += 1


def _default_collate(samples):
    from myriad_tpu.datasets.base_dataset import default_collate

    return default_collate(samples)


class DistributedSampler:
    """Per-host shard of the index space (torch DistributedSampler
    semantics: pad to equal length, reshuffle by epoch)."""

    def __init__(self, dataset, num_replicas: int, rank: int, shuffle: bool = True,
                 seed: int = 0):
        self.size = len(dataset)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_samples = -(-self.size // num_replicas)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        idx = np.arange(self.size)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        pad = self.num_samples * self.num_replicas - self.size
        if pad > 0:
            idx = np.concatenate([idx, idx[:pad]])
        return iter(idx[self.rank :: self.num_replicas].tolist())

    def __len__(self):
        return self.num_samples


class IterLoader:
    """Infinite epoch-wrapping iterator (dataloader_utils.py:145-181)."""

    def __init__(self, dataloader, use_distributed: bool = False):
        self._dataloader = dataloader
        self._epoch = 0
        self._iter = iter(dataloader)

    @property
    def epoch(self) -> int:
        return self._epoch

    def __next__(self):
        try:
            return next(self._iter)
        except StopIteration:
            self._epoch += 1
            if hasattr(self._dataloader, "set_epoch"):
                self._dataloader.set_epoch(self._epoch)
            self._iter = iter(self._dataloader)
            try:
                return next(self._iter)
            except StopIteration:
                raise RuntimeError(
                    "IterLoader: underlying dataloader yields no batches — "
                    "dataset smaller than batch_size with drop_last?"
                ) from None

    def __iter__(self):
        return self

    def __len__(self):
        return len(self._dataloader)


class IterableBatcher:
    """Batch an (infinite) sample iterator into collated dicts — the loader
    for webdataset-style streams (TarShardIterableDataset)."""

    def __init__(self, dataset, batch_size: int, collate_fn: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn or _default_collate
        self._iter = iter(dataset)

    def __iter__(self):
        return self

    def __next__(self):
        batch = []
        restarted = False
        while len(batch) < self.batch_size:
            try:
                batch.append(next(self._iter))
                restarted = False
            except StopIteration:
                if restarted and not batch:
                    raise RuntimeError(
                        "IterableBatcher: underlying stream yields no samples"
                    ) from None
                self._iter = iter(self.dataset)
                restarted = True
        return self.collate_fn(batch)


class MultiIterLoader:
    """Sample among loaders with given ratios (dataloader_utils.py:15-43)."""

    def __init__(self, loaders: Sequence, ratios: Optional[Sequence[float]] = None,
                 seed: int = 0):
        self.loaders = list(loaders)
        ratios = [1.0] * len(loaders) if ratios is None else list(ratios)
        total = sum(ratios)
        self.probs = [r / total for r in ratios]
        self.rng = np.random.default_rng(seed)

    def __next__(self):
        idx = int(self.rng.choice(len(self.loaders), p=self.probs))
        return next(self.loaders[idx])

    def __iter__(self):
        return self


class PrefetchLoader:
    """Background thread keeps one device batch ahead (async device_put)."""

    def __init__(self, loader, device_put: Optional[Callable] = None, depth: int = 2):
        self.loader = loader
        self.depth = depth
        if device_put is None:
            import jax

            device_put = jax.device_put
        self.device_put = device_put

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = object()
        error: list = []

        def worker():
            try:
                for batch in self.loader:
                    moved = {
                        k: self.device_put(v) if isinstance(v, np.ndarray) else v
                        for k, v in batch.items()
                    }
                    q.put(moved)
            except BaseException as e:  # propagate to the consumer thread
                error.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if error:
                    raise error[0]
                break
            yield item
