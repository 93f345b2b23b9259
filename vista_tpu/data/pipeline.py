"""Multi-source sampling + prefetching input pipeline (host side).

Behavioral counterpart of ``vwm/data/dataset.py``: a fixed virtual epoch
length, per-sample weighted source choice, and bounded retry on bad samples
(the reference retries forever, silently hiding corrupt data —
dataset.py:52-58; here failures are counted and surfaced after a bound).
The Lightning DataLoader (16 workers/GPU) is replaced by a thread-pool
decode + bounded prefetch queue feeding ``jax.device_put`` — decode overlaps
device compute so the chips stay fed (SURVEY.md §7 host-pipeline hard part).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 1
    prefetch: int = 2
    num_threads: int = 8
    max_retries: int = 100
    seed: int = 0


class MultiSourceSampler:
    """Weighted choice over datasets, retrying (bounded) on sample errors."""

    def __init__(self, datasets: Sequence, probs: Optional[Sequence[float]] = None,
                 samples_per_epoch: int = 32000, max_retries: int = 100, seed: int = 0):
        assert datasets, "need at least one dataset"
        self.datasets = list(datasets)
        p = np.asarray(probs if probs is not None else [1.0] * len(datasets), np.float64)
        self.probs = p / p.sum()
        self.samples_per_epoch = samples_per_epoch
        self.max_retries = max_retries
        self.rng = np.random.RandomState(seed)
        self.error_count = 0

    def __len__(self):
        return self.samples_per_epoch

    def sample(self) -> Dict[str, np.ndarray]:
        for _ in range(self.max_retries):
            ds = self.datasets[self.rng.choice(len(self.datasets), p=self.probs)]
            idx = int(self.rng.randint(0, max(len(ds), 1)))
            try:
                return ds[idx]
            except Exception:
                self.error_count += 1
        raise RuntimeError(
            f"{self.max_retries} consecutive sample failures "
            f"({self.error_count} total) — data is likely corrupt or missing")


def _collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = set().union(*[s.keys() for s in samples])
    out = {}
    for k in keys:
        vals = [s[k] for s in samples if k in s]
        if len(vals) != len(samples):
            continue  # ragged optional key (e.g. cycling action modality): drop
        out[k] = np.stack(vals)
    return out


class DataPipeline:
    """Threaded decode + bounded prefetch; iterate to get numpy batches."""

    def __init__(self, sampler: MultiSourceSampler, cfg: PipelineConfig):
        self.sampler = sampler
        self.cfg = cfg
        self._q: queue.Queue = queue.Queue(maxsize=cfg.prefetch)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = _collate([self.sampler.sample() for _ in range(self.cfg.batch_size)])
            except Exception as e:  # surface data faults to the consumer
                self._q.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def start(self, num_threads: Optional[int] = None):
        n = num_threads or self.cfg.num_threads
        for _ in range(n):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if not self._threads:
            self.start()
        steps = len(self.sampler) // self.cfg.batch_size
        for _ in range(steps):
            item = self._q.get()
            if isinstance(item, Exception):
                raise item
            yield item
