"""Data pipeline tests (reference analogue: CyclicSpritesDataset behaviors,
cyclic_dataset.py:16-278)."""

from pathlib import Path

import numpy as np
import pytest

from rlvae_tpu.data import (
    CyclicDataModule,
    CyclicSequenceDataset,
    batch_iterator,
    generate_cyclic_sequences,
)


def test_synthetic_generator_cyclic():
    data = generate_cyclic_sequences(6, n_obs=8, image_size=(16, 16), seed=0)
    assert data.shape == (6, 8, 3, 16, 16)
    assert data.dtype == np.float32
    assert 0.0 <= data.min() and data.max() <= 1.0
    np.testing.assert_array_equal(data[:, 0], data[:, -1])  # exact cyclicity
    # deterministic
    data2 = generate_cyclic_sequences(6, n_obs=8, image_size=(16, 16), seed=0)
    np.testing.assert_array_equal(data, data2)
    # frames differ over time
    assert np.abs(data[:, 1] - data[:, 0]).max() > 0.01


def test_dataset_stats_and_cyclicity():
    data = generate_cyclic_sequences(5, n_obs=4, image_size=(8, 8), seed=1)
    ds = CyclicSequenceDataset(data)
    assert len(ds) == 5 and ds.n_obs == 4
    rep = ds.cyclicity_report
    assert rep["n_cyclic"] == 5 and rep["fraction_cyclic"] == 1.0
    stats = ds.get_dataset_stats()
    assert stats["sequence_length"] == 4
    info = ds.get_sequence_info(0)
    assert info["cycle_mse"] == 0.0


def test_subset_slicing():
    data = generate_cyclic_sequences(10, n_obs=4, image_size=(8, 8))
    ds = CyclicSequenceDataset(data, n_samples=3)
    assert len(ds) == 3


def test_batch_iterator_drop_remainder():
    data = np.arange(10 * 2).reshape(10, 2).astype(np.float32)
    batches = list(batch_iterator(data, 4, shuffle=False))
    assert len(batches) == 2 and all(b.shape == (4, 2) for b in batches)
    # shuffled epoch covers distinct examples, deterministic by seed
    b1 = np.concatenate(list(batch_iterator(data, 4, shuffle=True, seed=1)))
    b2 = np.concatenate(list(batch_iterator(data, 4, shuffle=True, seed=1)))
    np.testing.assert_array_equal(b1, b2)


def test_data_module_synthetic_fallback():
    dm = CyclicDataModule(
        {
            "train_path": "data/processed/does_not_exist.npz",
            "test_path": "data/processed/nope.npz",
            "sequence_length": 4,
            "image_size": [8, 8],
            "channels": 3,
            "synthetic_fallback": True,
            "synthetic_n_train": 12,
            "synthetic_n_test": 6,
        }
    )
    dm.setup({"data": {"batch_size": 4}, "n_train_samples": 8, "n_val_samples": 4})
    assert len(dm.train) == 8 and len(dm.val) == 4 and len(dm.test) == 6
    assert dm.steps_per_epoch() == 2
    batch = next(iter(dm.train_batches()))
    assert batch.shape == (4, 4, 3, 8, 8)
    assert dm.get_sample_batch("val", 2).shape[0] == 2
    stats = dm.get_data_stats()
    assert stats["train"]["n_sequences"] == 8


def test_data_module_missing_no_fallback():
    dm = CyclicDataModule({"train_path": "nope.npz", "test_path": "nope.npz",
                           "synthetic_fallback": False})
    with pytest.raises(FileNotFoundError):
        dm.setup({})


@pytest.mark.parametrize("n_proc", [1, 2, 4])
def test_multihost_process_sliced_loading(n_proc):
    """Each host keeps a disjoint equal-size strided shard of the train set;
    the union over hosts is the global (subset-applied) dataset, val/test
    stay replicated (SURVEY 2c item 3: per-host data loading)."""
    cfg = {
        "synthetic_fallback": True, "synthetic_n_train": 32, "synthetic_n_test": 8,
        "image_size": [8, 8], "channels": 3, "sequence_length": 4,
        "verify_cyclicity": False, "use_native_loader": False,
    }
    tc = {"data": {"batch_size": 2}, "n_train_samples": 30}
    shards = []
    for pi in range(n_proc):
        dm = CyclicDataModule(cfg, seed=1, process_index=pi, process_count=n_proc)
        dm.setup(tc)
        shards.append(dm.train.data)
        assert len(dm.val) == 8 and len(dm.test) == 8  # replicated
        assert len(dm.train) == 30 // n_proc
    union = np.concatenate(shards, axis=0)
    assert union.shape[0] == (30 // n_proc) * n_proc
    # disjointness: all sequences unique within the union
    flat = union.reshape(union.shape[0], -1)
    assert len(np.unique(flat.round(5), axis=0)) == union.shape[0]
    # every shard row comes from the same global dataset
    dm_all = CyclicDataModule(cfg, seed=1, process_index=0, process_count=1)
    dm_all.setup(tc)
    gflat = dm_all.train.data.reshape(30, -1)
    for row in flat:
        assert (np.abs(gflat - row).sum(axis=1) < 1e-6).any()


def test_eval_batches_keep_remainder():
    """A val split smaller than the batch size must still yield a batch
    (review fix: drop-remainder eval yielded ZERO batches -> NaN val_loss
    and no 'best' checkpoint)."""
    from rlvae_tpu.data.cyclic import CyclicDataModule

    dm = CyclicDataModule({"synthetic_fallback": True, "synthetic_n_train": 16,
                           "synthetic_n_test": 16, "verify_cyclicity": False})
    dm.setup({"data": {"batch_size": 8}, "trainer": {},
              "n_val_samples": 3})
    dm.batch_size = 8
    # force a tiny val split
    dm.val.data = dm.val.data[:3]
    batches = list(dm.val_batches())
    assert len(batches) == 1 and batches[0].shape[0] == 3


def test_convert_reference_artifacts_cli(tmp_path, reference_available):
    """The one-shot migration CLI converts the reference's actual torch
    artifacts (encoder/decoder/metric .pt) to torch-free .npz with
    round-trip validation."""
    if not reference_available:
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    import json
    import subprocess
    import sys

    ref = Path("/root/reference/data/pretrained")
    args = [sys.executable, "scripts/convert_reference_artifacts.py",
            "--out-dir", str(tmp_path)]
    for kind in ("encoder", "decoder"):
        src = ref / f"{kind}.pt"
        if src.exists():
            args += [f"--{kind}", str(src)]
    metric = next(iter(sorted(ref.glob("metric*.pt"))), None)
    if metric is not None:
        args += ["--metric", str(metric)]
    assert len(args) > 5, f"no reference artifacts found under {ref}"
    proc = subprocess.run(args, capture_output=True, text=True, timeout=300,
                          cwd=str(Path(__file__).resolve().parents[1]))
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout)
    for kind in ("encoder", "decoder"):
        if f"--{kind}" in " ".join(args):
            assert report[kind]["param_count"] > 0
            assert Path(report[kind]["out"]).exists()
    if metric is not None:
        assert report["metric"]["n_centroids"] > 0
        v = report["metric"]["validation"]
        assert str(v.get("valid", v)).lower() not in ("false",), v


def test_real_layout_pt_ingestion(tmp_path):
    """Real-data readiness (round-3 VERDICT item 9): the full
    extract -> convert -> DataModule chain on a .pt fixture byte-layout
    identical to the real Sprites_train.pt (torch.save of
    {'data': uint8 [N, T, H, W, C] in 0..255} — reference:
    scripts/extract_cyclic_sequences.py:35-52), not just our own npz.
    Skips if torch is unavailable."""
    torch = pytest.importorskip("torch")
    import subprocess
    import sys

    rng = np.random.default_rng(0)
    n, t, h, w, c = 6, 8, 16, 16, 3
    raw = rng.integers(0, 256, size=(n, t, h, w, c), dtype=np.uint8)
    # make sequences 0, 2, 4 cyclic (first frame == last frame)
    for i in (0, 2, 4):
        raw[i, -1] = raw[i, 0]
    pt_path = tmp_path / "Sprites_train.pt"
    torch.save({"data": torch.as_tensor(raw)}, pt_path)

    # 1. extraction CLI: cyclic filter + /255 + NHWC->NCHW
    out_npz = tmp_path / "cyclic.npz"
    root = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(root / "scripts" / "extract_cyclic_sequences.py"),
         str(pt_path), str(out_npz)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    with np.load(out_npz) as zf:
        seqs = zf["sequences"]
    assert seqs.shape == (3, t, c, h, w)
    assert seqs.dtype == np.float32
    assert 0.0 <= seqs.min() and seqs.max() <= 1.0
    np.testing.assert_allclose(seqs[0, 0], raw[0, 0].transpose(2, 0, 1) / 255.0)
    meta = np.load(tmp_path / "cyclic_metadata.npz")
    assert int(meta["n_cyclic"]) == 3 and int(meta["n_raw"]) == n

    # 2. dataset converter on the same real-layout dict artifact
    from rlvae_tpu.data.convert import convert_dataset

    shape = convert_dataset(pt_path, tmp_path / "converted.npz")
    assert tuple(shape) == (n, t, h, w, c)  # raw passthrough, no reshaping

    # 3. DataModule consumes the extracted file end-to-end
    dm = CyclicDataModule({
        "train_path": str(out_npz), "test_path": str(out_npz),
        "sequence_length": t, "image_size": [h, w], "channels": c,
        "synthetic_fallback": False, "verify_cyclicity": True,
        "cyclicity_threshold": 0.01,
    })
    dm.setup({"data": {"batch_size": 1}})
    assert len(dm.train) == 3
    batch = next(iter(dm.train_batches()))
    assert batch.shape == (1, t, c, h, w)
    rep = dm.train.cyclicity_report
    assert rep is None or rep.get("n_cyclic", 3) == 3
