"""Dataset registry + batched, prefetching sequence loader.

Replaces the reference's torch DataLoader stack (data/__init__.py registry,
custom_dataset_data_loader.py with DistributedSampler) with a thread-pool
prefetch loader that host-shards work: under multi-host training each host
builds a loader with its (shard_id, num_shards) and feeds only its slice of
the global batch — the TPU equivalent of DistributedSampler
(custom_dataset_data_loader.py:20-23).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.data.face import FewshotFaceDataset
from fsvid2vid_tpu.data.pose import FewshotPoseDataset
from fsvid2vid_tpu.data.street import FewshotStreetDataset

DATASETS = {
    "fewshot_face": FewshotFaceDataset,
    "fewshot_pose": FewshotPoseDataset,
    "fewshot_street": FewshotStreetDataset,
}


def create_dataset(cfg: Config):
    """Name -> dataset instance (reference find_dataset_using_name,
    data/__init__.py:11-33)."""
    name = cfg.dataset_mode
    if name not in DATASETS:
        raise ValueError(f"unknown dataset_mode {name!r}; "
                         f"available: {sorted(DATASETS)}")
    return DATASETS[name](cfg)


def _collate(samples):
    """Stack per-sample dicts -> batch arrays.

    tgt_*: (B, T, H, W, C); ref_*: (B, K, H, W, C)."""
    out = {}
    for key in ("tgt_label", "tgt_image", "ref_labels", "ref_images"):
        out[key] = np.stack([s[key] for s in samples]).astype(np.float32)
    out["paths"] = [s.get("path") for s in samples]
    return out


class SequenceLoader:
    """Iterates batches of sequence samples with background workers.

    Each epoch yields `steps_per_epoch` batches of cfg.batch_size // num_shards
    samples (this host's share).  Set `n_frames_total` before each epoch for
    the temporal curriculum (base_dataset.update_training_batch)."""

    def __init__(self, cfg: Config, dataset=None, steps_per_epoch: int = 1000,
                 shard_id: int = 0, num_shards: int = 1, seed: int = 0,
                 num_workers: Optional[int] = None):
        self.cfg = cfg
        self.dataset = dataset or create_dataset(cfg)
        self.steps_per_epoch = min(
            steps_per_epoch,
            max(1, cfg.max_dataset_size // max(cfg.batch_size, 1)))
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.local_batch = max(1, cfg.batch_size // num_shards)
        self.seed = seed
        self.num_workers = (cfg.num_workers if num_workers is None
                            else num_workers)

    def set_epoch_frames(self, n_frames_total: int):
        self.dataset.n_frames_total = n_frames_total

    def _sample(self, epoch: int, step: int, slot: int) -> Dict:
        # deterministic per (epoch, step, global slot) seed
        global_slot = self.shard_id * self.local_batch + slot
        rng = np.random.RandomState(
            (self.seed * 1_000_003 + epoch * 10_007 + step * 131
             + global_slot) % (2 ** 31))
        index = step * self.cfg.batch_size + global_slot
        return self.dataset.sample(index % len(self.dataset), rng)

    def epoch(self, epoch: int) -> Iterator[Dict]:
        if self.num_workers <= 0:
            for step in range(self.steps_per_epoch):
                yield _collate([self._sample(epoch, step, i)
                                for i in range(self.local_batch)])
            return

        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def producer():
            try:
                for step in range(self.steps_per_epoch):
                    if stop.is_set():
                        return
                    batch = _collate([self._sample(epoch, step, i)
                                      for i in range(self.local_batch)])
                    q.put(batch)
            except Exception as e:  # surfaced on the consumer side
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
