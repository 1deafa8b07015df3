"""Cyclic sequence dataset + data module.

Replaces the reference's CyclicSpritesDataset / CyclicSpritesDataModule
(reference: src/data/cyclic_dataset.py:16-278) with a host-side numpy
pipeline producing fixed-shape device batches:

- loads [N, T, C, H, W] float arrays from .npz (native) or .pt (via torch),
- optional subset slicing, cyclicity verification (first-vs-last frame MSE
  against a threshold, cyclic_dataset.py:57-95), per-sequence info and
  dataset statistics,
- a DataModule wiring train/val/test iterators from the training config
  (val = head of the test file, cyclic_dataset.py:186-200), with
  drop-remainder batching for static jit shapes and epoch shuffling,
- synthetic-data fallback when files are missing (config
  `data.synthetic_fallback`), so every config runs without the original
  Sprites artifacts.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Iterator, Mapping, Optional

import numpy as np


def _load_array(path: Path) -> np.ndarray:
    if path.suffix == ".npz":
        with np.load(path) as zf:
            key = "sequences" if "sequences" in zf.files else zf.files[0]
            return np.asarray(zf[key], np.float32)
    if path.suffix in (".pt", ".pth"):
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(data, dict):
            data = data["data"] if "data" in data else next(iter(data.values()))
        return data.detach().cpu().numpy().astype(np.float32)
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    raise ValueError(f"Unsupported dataset format: {path}")


class CyclicSequenceDataset:
    """In-memory [N, T, C, H, W] cyclic sequence dataset."""

    def __init__(
        self,
        data: np.ndarray,
        n_samples: Optional[int] = None,
        verify_cyclicity: bool = True,
        cyclicity_threshold: float = 0.01,
    ):
        if data.ndim != 5:
            raise ValueError(f"Expected [N, T, C, H, W] data, got shape {data.shape}")
        if n_samples is not None:
            data = data[:n_samples]
        self.data = np.ascontiguousarray(data, np.float32)
        self.cyclicity_threshold = cyclicity_threshold
        self.cyclicity_report: Optional[Dict[str, Any]] = None
        if verify_cyclicity:
            self.cyclicity_report = self.verify_cyclicity()

    @classmethod
    def from_file(cls, path, **kwargs) -> "CyclicSequenceDataset":
        return cls(_load_array(Path(path)), **kwargs)

    def __len__(self) -> int:
        return self.data.shape[0]

    def __getitem__(self, idx) -> np.ndarray:
        return self.data[idx]

    @property
    def n_obs(self) -> int:
        return self.data.shape[1]

    def verify_cyclicity(self) -> Dict[str, Any]:
        """First-vs-last frame MSE check (reference: cyclic_dataset.py:57-95)."""
        mse = np.mean((self.data[:, 0] - self.data[:, -1]) ** 2, axis=(1, 2, 3))
        n_cyclic = int((mse < self.cyclicity_threshold).sum())
        return {
            "n_sequences": len(self),
            "n_cyclic": n_cyclic,
            "fraction_cyclic": n_cyclic / max(len(self), 1),
            "mean_cycle_mse": float(mse.mean()) if len(self) else 0.0,
            "max_cycle_mse": float(mse.max()) if len(self) else 0.0,
            "first_5_mse": [float(v) for v in mse[:5]],
        }

    def get_sequence_info(self, idx: int) -> Dict[str, Any]:
        seq = self.data[idx]
        return {
            "index": idx,
            "shape": tuple(seq.shape),
            "min": float(seq.min()),
            "max": float(seq.max()),
            "mean": float(seq.mean()),
            "cycle_mse": float(np.mean((seq[0] - seq[-1]) ** 2)),
        }

    def get_dataset_stats(self) -> Dict[str, Any]:
        """Summary statistics (reference: cyclic_dataset.py:96-119)."""
        return {
            "n_sequences": len(self),
            "sequence_length": int(self.data.shape[1]),
            "image_shape": tuple(self.data.shape[2:]),
            "pixel_min": float(self.data.min()),
            "pixel_max": float(self.data.max()),
            "pixel_mean": float(self.data.mean()),
            "pixel_std": float(self.data.std()),
            "cyclicity": self.cyclicity_report,
        }


def batch_iterator(
    data: np.ndarray,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[np.ndarray]:
    """Host-side batching with drop-remainder (static shapes under jit)."""
    n = data.shape[0]
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    n_batches = n // batch_size if drop_remainder else -(-n // batch_size)
    for b in range(n_batches):
        yield data[idx[b * batch_size : (b + 1) * batch_size]]


class CyclicDataModule:
    """Train/val/test wiring from the data + training config nodes.

    Multi-host ready: on a multi-process runtime each host keeps only its
    ``jax.process_index()``-strided slice of the training sequences (per-host
    data loading for data parallelism over DCN; SURVEY §2c item 3).  Val/test
    stay replicated — they are host-0-logged summaries.  ``process_index`` /
    ``process_count`` can be passed explicitly for testing without a real
    multi-process runtime."""

    def __init__(
        self,
        data_config: Mapping[str, Any],
        seed: int = 42,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.config = dict(data_config)
        self.seed = seed
        self.train: Optional[CyclicSequenceDataset] = None
        self.val: Optional[CyclicSequenceDataset] = None
        self.test: Optional[CyclicSequenceDataset] = None
        self.batch_size = 8
        self._native_loader = None
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index() if process_index is None else process_index
            process_count = jax.process_count() if process_count is None else process_count
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    def _resolve(self, key: str) -> Optional[Path]:
        raw = self.config.get(key)
        if not raw:
            return None
        p = Path(raw)
        for cand in (p, p.with_suffix(".npz"), p.with_suffix(".npy"),
                     p.with_suffix(".pt")):
            if cand.exists():
                return cand
        return None

    def _load_or_synthesize(
        self, key: str, n_default: int, seed: int, n_needed: Optional[int] = None
    ) -> np.ndarray:
        path = self._resolve(key)
        if path is not None:
            return _load_array(path)
        if not self.config.get("synthetic_fallback", True):
            raise FileNotFoundError(f"Dataset file for '{key}' not found: {self.config.get(key)}")
        from rlvae_tpu.data.synth import generate_cyclic_sequences

        # don't synthesize more sequences than the run will actually use
        n = n_default if n_needed is None else min(n_default, int(n_needed))
        return generate_cyclic_sequences(
            n,
            n_obs=int(self.config.get("sequence_length", 8)),
            image_size=tuple(self.config.get("image_size", (64, 64))),
            channels=int(self.config.get("channels", 3)),
            seed=seed,
        )

    def setup(self, training_config: Optional[Mapping[str, Any]] = None) -> None:
        """Wire datasets; sample counts/batch size come from the training
        config (reference: cyclic_dataset.py:156-211)."""
        tc = dict(training_config or {})
        self.batch_size = int(tc.get("data", {}).get("batch_size", 8))
        # a re-setup may change the dataset or batch size — the cached
        # native loader captured both at build time, so drop it
        self._native_loader = None
        n_train = tc.get("n_train_samples") or self.config.get("max_train_samples")
        n_val = tc.get("n_val_samples") or self.config.get("max_test_samples")

        verify = bool(self.config.get("verify_cyclicity", True))
        thresh = float(self.config.get("cyclicity_threshold", 0.01))

        train_raw = self._load_or_synthesize(
            "train_path", int(self.config.get("synthetic_n_train", 1000)), self.seed,
            n_needed=n_train,
        )
        test_raw = self._load_or_synthesize(
            "test_path", int(self.config.get("synthetic_n_test", 200)), self.seed + 1
        )
        # apply the global subset BEFORE slicing so every process count sees
        # the same effective dataset, then keep this host's strided shard
        if n_train is not None:
            train_raw = train_raw[: int(n_train)]
        if self.process_count > 1:
            # equal shard sizes keep every host's step count in lockstep
            per_host = train_raw.shape[0] // self.process_count
            train_raw = train_raw[self.process_index :: self.process_count][:per_host]
        self.train = CyclicSequenceDataset(
            train_raw, verify_cyclicity=verify, cyclicity_threshold=thresh
        )
        # validation = head of the test file (reference: cyclic_dataset.py:186-200)
        self.val = CyclicSequenceDataset(
            test_raw, n_samples=n_val, verify_cyclicity=False, cyclicity_threshold=thresh
        )
        self.test = CyclicSequenceDataset(
            test_raw, verify_cyclicity=verify, cyclicity_threshold=thresh
        )

    def train_batches(self, epoch: int = 0) -> Iterator[np.ndarray]:
        # Training batches go through the native C++ prefetching loader
        # (rlvae_tpu/data/native_loader.py) when available; it degrades to
        # the numpy iterator transparently.
        if self.config.get("use_native_loader", True):
            if self._native_loader is None:
                from rlvae_tpu.data.native_loader import NativeBatchLoader

                self._native_loader = NativeBatchLoader(self.train.data, self.batch_size)
            yield from self._native_loader.epoch(seed=self.seed + epoch, shuffle=True)
        else:
            yield from batch_iterator(
                self.train.data, self.batch_size, shuffle=True, seed=self.seed + epoch
            )

    def val_batches(self) -> Iterator[np.ndarray]:
        # keep the remainder: a val split smaller than batch_size would
        # otherwise yield ZERO batches (NaN val_loss, no best checkpoint);
        # multi-device eval skips non-divisible batches itself
        yield from batch_iterator(self.val.data, self.batch_size, shuffle=False,
                                  drop_remainder=False)

    def test_batches(self) -> Iterator[np.ndarray]:
        yield from batch_iterator(self.test.data, self.batch_size, shuffle=False,
                                  drop_remainder=False)

    def steps_per_epoch(self) -> int:
        return len(self.train) // self.batch_size

    def get_sample_batch(self, split: str = "val", n: int = 8) -> np.ndarray:
        """Fixed batch for visualization (reference: cyclic_dataset.py:251-264)."""
        ds = {"train": self.train, "val": self.val, "test": self.test}[split]
        return ds.data[:n]

    def get_data_stats(self) -> Dict[str, Any]:
        return {
            "train": self.train.get_dataset_stats() if self.train else None,
            "val": self.val.get_dataset_stats() if self.val else None,
            "test": self.test.get_dataset_stats() if self.test else None,
            "batch_size": self.batch_size,
        }
