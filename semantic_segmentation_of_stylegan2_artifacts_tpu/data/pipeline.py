"""Host data pipeline: threaded decode/augment + prefetch, uint8 to device.

TPU-native replacement for the reference's multiprocess DataLoader
(reference ``trainer.py:193-245``): worker *threads* (PIL/cv2 release the
GIL) assemble uint8 NHWC batches; normalization to [0,1] floats happens on
device inside the jitted step, so host->device traffic is 4× smaller than
shipping float32.

Epoch construction reproduces the reference's mixed-set logic
(``trainer.py:196-237``): a dynamic real-ratio schedule picks
``num_real`` real images per epoch, a seeded permutation selects the
subset, and :class:`BatchPatternSampler` guarantees >=1 fake per batch.
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Dict, Iterator, List

import numpy as np

from .augment import RandomGenerator, sample_rng
from .dataset import SegArtifactDataset
from .sampler import BatchPatternSampler


def real_ratio_schedule(epoch: int, dynamic: bool) -> float:
    """Per-epoch real-image ratio (reference ``trainer.py:196-208``)."""
    if not dynamic:
        return 0.4
    if epoch < 9:
        return 0.1
    if epoch < 20:
        return 0.10 + 0.03 * (epoch - 8)
    if epoch < 30:
        return 0.4
    if epoch < 35:
        return 0.2
    return 0.4


def num_real_for_ratio(total_fake: int, total_real: int, real_ratio: float) -> int:
    """``num_real`` so the mixed set has the requested ratio and even size
    (reference ``trainer.py:210-215``)."""
    num_real = int((total_fake / (1.0 - real_ratio)) * real_ratio)
    if (num_real + total_fake) % 2 != 0:
        num_real = max(0, num_real - 1)
    if num_real > total_real:
        raise ValueError(
            f"More real images required than available: num_real {num_real} "
            f"total_real {total_real}"
        )
    return num_real


def _stack_batch(samples: List[Dict]) -> Dict:
    batch = {
        "image": np.stack([s["image"] for s in samples]),
        "case_name": [s["case_name"] for s in samples],
    }
    if "label" in samples[0]:
        batch["label"] = np.stack([s["label"] for s in samples])
    return batch


class TrainLoader:
    """Per-epoch mixed fake/real loader with deterministic augmentation."""

    def __init__(
        self,
        fake_ds: SegArtifactDataset,
        real_ds: SegArtifactDataset,
        img_size: int,
        seed: int = 0,
        dynamic_loader: bool = False,
        num_workers: int = 4,
        prefetch_depth: int = 2,
        batch_size: int = 2,
        num_classes: int = 1,
    ):
        self.fake_ds = fake_ds
        self.real_ds = real_ds
        self.seed = seed
        self.dynamic_loader = dynamic_loader
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.batch_size = batch_size
        self.transform = RandomGenerator(
            output_size=[img_size, img_size], random_flip_flag=True,
            transform=True, seed=seed, num_classes=num_classes,
        )

    def num_batches(self, epoch: int, merge: int = 1) -> int:
        ratio = real_ratio_schedule(epoch, self.dynamic_loader)
        n_real = num_real_for_ratio(len(self.fake_ds), len(self.real_ds), ratio)
        return (len(self.fake_ds) + n_real) // self.batch_size // merge

    def epoch_batches_merged(self, epoch: int, merge: int,
                             shard: tuple = None) -> Iterator[Dict]:
        """Concatenate ``merge`` sampler batches into one global batch.

        Data-parallel training wants a global batch of ``2 * n_devices``
        while keeping the pattern sampler's >=1-fake-per-pair guarantee
        (each device's pair still satisfies it).  Trailing batches that
        don't fill a full global batch are dropped (static shapes).

        ``shard=(process_index, process_count)`` restricts decoding to
        this host's slice of every global batch: ``merge`` is the GLOBAL
        pair count per step; each host assembles the contiguous
        ``merge // process_count`` pairs at offset
        ``process_index * (merge // process_count)`` within the group and
        yields a local batch of ``2 * merge // process_count`` images.
        The sampler itself is index-only and deterministic per epoch, so
        every host derives the identical global plan and only decodes its
        own rows (multi-host SPMD input pipeline; assemble the local
        batches into one global array with
        :func:`..parallel.multihost.make_global_batch`).
        """
        if merge <= 1 and shard is None:
            yield from self.epoch_batches(epoch)
            return
        pi, pc = (0, 1) if shard is None else (int(shard[0]), int(shard[1]))
        if pc < 1 or not 0 <= pi < pc:
            raise ValueError(f"bad shard {shard}")
        if merge % pc != 0:
            raise ValueError(
                f"global merge {merge} not divisible by process_count {pc}")
        local = merge // pc
        pairs, fetch = self._epoch_plan(epoch)
        groups: List[List[int]] = []
        for g in range(len(pairs) // merge):
            sub = pairs[g * merge + pi * local: g * merge + (pi + 1) * local]
            groups.append([i for pair in sub for i in pair])
        yield from self._run(groups, fetch)

    def _epoch_plan(self, epoch: int):
        """Index-level epoch plan: (sampler pair list, fetch closure).

        No decoding happens here — the plan is cheap and identical on
        every host (seeded by ``(seed, epoch)`` only).
        """
        n_fake = len(self.fake_ds)
        total_real = len(self.real_ds)
        ratio = real_ratio_schedule(epoch, self.dynamic_loader)
        n_real = num_real_for_ratio(n_fake, total_real, ratio)

        # seeded real-subset selection (reference trainer.py:218-221)
        sel_rng = random.Random(self.seed + epoch)
        real_subset = sel_rng.sample(range(total_real), n_real)

        # index space: 0..n_fake-1 fake, n_fake..n_fake+n_real-1 real-subset
        sampler = BatchPatternSampler(
            fake_indices=range(n_fake),
            real_indices=range(n_fake, n_fake + n_real),
            num_batch=(n_fake + n_real) // self.batch_size,
            batch_size=self.batch_size,
            epoch=epoch + 1,
        )

        def fetch(idx: int) -> Dict:
            if idx < n_fake:
                sample = self.fake_ds[idx]
            else:
                sample = self.real_ds[real_subset[idx - n_fake]]
            rng = sample_rng(self.seed, epoch, idx)
            return self.transform(sample, rng=rng)

        return list(sampler), fetch

    def epoch_batches(self, epoch: int) -> Iterator[Dict]:
        """Yield batches ``{'image': (B,H,W,3) u8, 'label': (B,H,W) u8}``."""
        pairs, fetch = self._epoch_plan(epoch)
        yield from self._run(pairs, fetch)

    def _run(self, batches: List[List[int]], fetch) -> Iterator[Dict]:
        """Threaded decode/augment + prefetch over index lists."""

        def assemble(batch_indices: List[int]) -> Dict:
            return _stack_batch([fetch(i) for i in batch_indices])

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            it = iter(batches)
            for _ in range(min(self.prefetch_depth, len(batches))):
                pending.append(pool.submit(assemble, next(it)))
            while pending:
                fut = pending.pop(0)
                try:
                    nxt = next(it)
                    pending.append(pool.submit(assemble, nxt))
                except StopIteration:
                    pass
                yield fut.result()


class EvalLoader:
    """Sequential loader without augmentation (val/test).

    ``batch_size=1`` reproduces the reference's per-case evaluation loop
    exactly; larger batches amortize dispatch (per-case metrics stay
    exact via the vmapped metric kernel).

    ``pad_to_batch=True`` pads a short trailing batch to ``batch_size``
    by repeating its last sample, so every batch has ONE static shape
    and XLA compiles the eval step exactly once per run (each extra
    shape costs 1-3 min over the TPU relay, CLAUDE.md).  Padded entries
    carry no ``case_name`` — ``len(batch['case_name'])`` is the count of
    valid leading samples, and consumers must ignore the tail.
    """

    def __init__(self, ds, img_size: int, num_workers: int = 2,
                 prefetch_depth: int = 2, num_classes: int = 1,
                 batch_size: int = 1, pad_to_batch: bool = False):
        self.ds = ds
        self.transform = RandomGenerator(
            output_size=[img_size, img_size], random_flip_flag=False,
            transform=False, num_classes=num_classes,
        )
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = max(1, prefetch_depth)
        self.batch_size = max(1, batch_size)
        self.pad_to_batch = pad_to_batch

    def __len__(self) -> int:
        return len(self.ds)

    def __iter__(self) -> Iterator[Dict]:
        bs = self.batch_size
        n = len(self.ds)
        chunks = [list(range(i, min(i + bs, n))) for i in range(0, n, bs)]

        def fetch(chunk) -> Dict:
            batch = _stack_batch([self.transform(self.ds[i]) for i in chunk])
            pad = bs - len(chunk)
            if self.pad_to_batch and pad > 0:
                for key in batch:
                    if key == "case_name":
                        continue  # names stay valid-only: len == n valid
                    tail = np.repeat(batch[key][-1:], pad, axis=0)
                    batch[key] = np.concatenate([batch[key], tail])
            return batch

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            nxt = 0
            for _ in range(min(self.prefetch_depth, len(chunks))):
                pending.append(pool.submit(fetch, chunks[nxt]))
                nxt += 1
            while pending:
                fut = pending.pop(0)
                if nxt < len(chunks):
                    pending.append(pool.submit(fetch, chunks[nxt]))
                    nxt += 1
                yield fut.result()
