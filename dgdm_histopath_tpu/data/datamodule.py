"""HistopathDataModule: splits + bucketed batch loading.

Parity surface: reference ``dgdm_histopath/data/datamodule.py:18-305`` —
split-fraction validation (:82-84), random splits in ``setup`` (:111-171),
train/val/test loaders (:173-246), ``get_dataset_info`` (:248-270).

TPU-native design: instead of PyG's ragged collation + pinned-memory
DataLoaders, batches are groups of SAME-BUCKET ``PaddedGraph``s stacked along
a leading axis — each (bucket, batch) shape compiles exactly once. Loading is
synchronous host work with an optional background prefetch thread (the
device-feed overlap the reference delegated to worker processes).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..ops.graph import PaddedGraph, batch_graphs
from ..utils.exceptions import DataError
from ..utils.logging import get_logger

logger = get_logger("data")


class BucketedLoader:
    """Groups dataset items by bucket shape and yields stacked batches.

    Incomplete trailing groups are padded by repeating the final graph with
    its ``node_mask`` zeroed (keeps batch shapes static; masked graphs
    contribute nothing to masked losses).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _iter_batches(self) -> Iterator[PaddedGraph]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        groups: Dict[tuple, List[PaddedGraph]] = {}
        for idx in order:
            g = self.dataset[int(idx)]
            key = (g.num_nodes, g.max_neighbors, g.feature_dim)
            groups.setdefault(key, []).append(g)
            if len(groups[key]) == self.batch_size:
                yield batch_graphs(groups.pop(key))
        for key, group in groups.items():
            if self.drop_last:
                continue
            while len(group) < self.batch_size:
                filler = group[-1].replace(
                    node_mask=np.zeros_like(np.asarray(group[-1].node_mask)))
                group.append(filler)
            yield batch_graphs(group)

    def __iter__(self) -> Iterator[PaddedGraph]:
        if self.prefetch <= 0:
            yield from self._iter_batches()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []

        def producer():
            try:
                for batch in self._iter_batches():
                    q.put(batch)
            except BaseException as exc:  # noqa: BLE001
                error.append(exc)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error:
            raise error[0]


class HistopathDataModule:
    """Split management + loader construction over any indexable dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int = 4,
        train_split: float = 0.7,
        val_split: float = 0.15,
        test_split: float = 0.15,
        shuffle_train: bool = True,
        seed: int = 42,
        drop_last: bool = False,
        prefetch: int = 2,
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
    ):
        total = train_split + val_split + test_split
        if abs(total - 1.0) > 1e-6:
            raise DataError("splits must sum to 1.0", {"sum": total})
        self.dataset = dataset
        self.batch_size = batch_size
        self.splits = (train_split, val_split, test_split)
        self.shuffle_train = shuffle_train
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # multi-host: each controller loads a disjoint slide shard (the JAX
        # multi-controller pattern — per-host input, global mesh arrays);
        # defaults follow jax.process_index/count so single-host is a no-op
        if num_shards is None or shard_index is None:
            import jax
            num_shards = jax.process_count() if num_shards is None else num_shards
            shard_index = jax.process_index() if shard_index is None else shard_index
        if not 0 <= shard_index < num_shards:
            raise DataError("shard_index out of range",
                            {"shard_index": shard_index, "num_shards": num_shards})
        self.num_shards = int(num_shards)
        self.shard_index = int(shard_index)
        self._indices: Optional[Dict[str, np.ndarray]] = None

    def setup(self) -> None:
        """Random split (reference :111-171)."""
        n = len(self.dataset)
        order = np.arange(n)
        np.random.RandomState(self.seed).shuffle(order)
        n_train = int(round(self.splits[0] * n))
        n_val = int(round(self.splits[1] * n))
        self._indices = {
            "train": order[:n_train],
            "val": order[n_train:n_train + n_val],
            "test": order[n_train + n_val:],
        }
        logger.info("split %d items -> train=%d val=%d test=%d", n,
                    n_train, n_val, n - n_train - n_val)

    def _subset(self, split: str) -> "_Subset":
        if self._indices is None:
            self.setup()
        idx = self._indices[split]
        if self.num_shards > 1 and split == "train":
            # strided host shard: same global split everywhere, disjoint
            # training work per process (eval stays global so every host
            # reports the same validation numbers)
            idx = idx[self.shard_index::self.num_shards]
        return _Subset(self.dataset, idx)

    def train_dataloader(self) -> BucketedLoader:
        return BucketedLoader(self._subset("train"), self.batch_size,
                              shuffle=self.shuffle_train, seed=self.seed,
                              drop_last=self.drop_last, prefetch=self.prefetch)

    def val_dataloader(self) -> BucketedLoader:
        return BucketedLoader(self._subset("val"), self.batch_size,
                              prefetch=self.prefetch)

    def test_dataloader(self) -> BucketedLoader:
        return BucketedLoader(self._subset("test"), self.batch_size,
                              prefetch=self.prefetch)

    def get_dataset_info(self) -> Dict:
        if self._indices is None:
            self.setup()
        return {
            "total": len(self.dataset),
            "train": len(self._indices["train"]),
            "val": len(self._indices["val"]),
            "test": len(self._indices["test"]),
            "batch_size": self.batch_size,
        }


class _Subset:
    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = indices

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[int(self.indices[i])]
