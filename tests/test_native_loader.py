"""Native fastloader vs the Python transform pipeline — exact equivalence.

The Python path (data/transforms.py) is the correctness oracle; the C++ path
must reproduce it bit-for-bit (same float32 ops: log10f + fma)."""

import numpy as np
import pytest

from vdm4cdm_tpu.data import native
from vdm4cdm_tpu.data.transforms import FieldNormalizer, periodic_crop

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not native.available(), reason="native fastloader unavailable (no g++?)"
)]


def _python_reference(stacks, sim_idx, anchors, flips, perms, crop, fn=None):
    """Replicate CAMELSDataModule's per-sample path: periodic crop at the
    given anchor -> normalize -> flip -> transpose. Channels-first output."""
    nd = anchors.shape[1]
    out = []
    for b in range(len(sim_idx)):
        chans = []
        for c, stack in enumerate(stacks):
            arr = np.asarray(stack[sim_idx[b]])[None]  # (1, *spatial)
            crp = periodic_crop(arr, anchors[b], crop)[0]
            if fn is not None:
                crp = fn.normalize(crp, c)
            flip_axes = tuple(d for d in range(nd) if flips[b, d])
            if flip_axes:
                crp = np.flip(crp, axis=flip_axes)
            crp = np.transpose(crp, perms[b])
            chans.append(crp.astype(np.float32))
        out.append(np.stack(chans))
    return np.stack(out)


@pytest.mark.parametrize("nd", [2, 3])
def test_exact_equivalence(nd):
    rng = np.random.default_rng(0)
    nsims, full, crop, batch = 3, 12, 8, 6
    stacks = [
        np.abs(rng.standard_normal((nsims,) + (full,) * nd)).astype(np.float32) + 0.5
        for _ in range(2)
    ]
    sim_idx = rng.integers(0, nsims, batch)
    anchors = rng.integers(0, full, (batch, nd))
    flips = rng.integers(0, 2, (batch, nd)).astype(np.int32)
    perms = np.stack([rng.permutation(nd) for _ in range(batch)]).astype(np.int32)
    fn = FieldNormalizer(alphas=[1.0, 0.5], means=[0.1, -0.2], stds=[0.7, 1.3])

    ref = _python_reference(stacks, sim_idx, anchors, flips, perms, crop, fn)
    got = native.crop_batch(
        stacks, sim_idx, anchors, flips, perms, crop,
        alphas=fn.alphas, means=fn.means, stds=fn.stds, channels_last=False,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_channels_last_layout():
    rng = np.random.default_rng(1)
    stacks = [np.abs(rng.standard_normal((2, 8, 8, 8))).astype(np.float32) + 0.5]
    sim_idx = np.array([0, 1])
    anchors = np.zeros((2, 3), np.int64)
    flips = np.zeros((2, 3), np.int32)
    perms = np.tile(np.arange(3, dtype=np.int32), (2, 1))
    cf = native.crop_batch(stacks, sim_idx, anchors, flips, perms, 4, channels_last=False)
    cl = native.crop_batch(stacks, sim_idx, anchors, flips, perms, 4, channels_last=True)
    np.testing.assert_array_equal(cl, np.moveaxis(cf, 1, -1))


def test_no_normalize_is_raw_gather():
    rng = np.random.default_rng(2)
    stack = rng.standard_normal((1, 6, 6)).astype(np.float32)
    out = native.crop_batch(
        [stack], np.array([0]), np.array([[4, 5]]),
        np.zeros((1, 2), np.int32), np.array([[0, 1]], np.int32), 4,
        channels_last=False,
    )
    expected = stack[0][np.ix_((np.arange(4, 8)) % 6, (np.arange(5, 9)) % 6)]
    np.testing.assert_array_equal(out[0, 0], expected)


def test_datamodule_native_matches_python(tmp_path):
    """CAMELSDataModule with use_native on/off must produce identical batches
    when augmentation is off (test stage); augmented streams differ only by
    RNG stream, not by semantics (covered by test_exact_equivalence)."""
    import json, os

    from vdm4cdm_tpu.data.camels import get_dataset, vdm_cc_return_func

    rng = np.random.default_rng(0)
    nsims, size = 4, 8
    reg = tmp_path / "registries"
    os.makedirs(reg)
    paths = {}
    for field in ["Mstar", "Mcdm"]:
        arr = np.abs(rng.standard_normal((nsims, size, size, size)) + 2).astype(np.float32)
        p = tmp_path / f"{field}.npy"
        np.save(p, arr)
        paths[field] = str(p)
    (reg / "data_source_3d.json").write_text(json.dumps(
        {"CMD": {"Astrid": {"LH": {"z_0.0": paths}}}}))
    (reg / "normalizations_3d.json").write_text(json.dumps(
        {"Mstar_m": 0.1, "Mstar_s": 0.4, "Mcdm_m": 0.1, "Mcdm_s": 0.4}))
    (reg / "alphas_3d.json").write_text(json.dumps({"Mstar": 1.0, "Mcdm": 1.0}))
    os.makedirs(tmp_path / "params_new")
    np.savetxt(tmp_path / "params_new" / "params_LH_Astrid.txt",
               rng.uniform(size=(nsims, 6)))

    def make(use_native):
        dm = get_dataset(str(reg), channel_names=["Mstar", "Mcdm"],
                         return_func=vdm_cc_return_func, stage="test",
                         batch_size=2, cropsize=4, ndim=3, data_root=str(tmp_path))
        dm.use_native = use_native
        return dm

    batches_nat = list(make(True).test_dataloader())
    batches_py = list(make(False).test_dataloader())
    assert len(batches_nat) == len(batches_py) > 0
    for bn, bp in zip(batches_nat, batches_py):
        np.testing.assert_allclose(bn["x"], bp["x"], rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(bn["conditioning"], bp["conditioning"], rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(bn["conditioning_values"][0], bp["conditioning_values"][0])


def test_threads_deterministic():
    rng = np.random.default_rng(3)
    stacks = [np.abs(rng.standard_normal((4, 16, 16, 16))).astype(np.float32) + 0.1]
    sim_idx = rng.integers(0, 4, 16)
    anchors = rng.integers(0, 16, (16, 3))
    flips = rng.integers(0, 2, (16, 3)).astype(np.int32)
    perms = np.stack([rng.permutation(3) for _ in range(16)]).astype(np.int32)
    a = native.crop_batch(stacks, sim_idx, anchors, flips, perms, 8, nthreads=1)
    b = native.crop_batch(stacks, sim_idx, anchors, flips, perms, 8, nthreads=8)
    np.testing.assert_array_equal(a, b)


class TestDirectIO:
    """fastloader_read_direct: the O_DIRECT bulk reader must reproduce
    np.load byte-for-byte, including unaligned npy data offsets (128-byte
    header) and tails that end inside a 4K block."""

    def test_roundtrip_3d_stack(self, tmp_path):
        rng = np.random.default_rng(11)
        a = rng.standard_normal((3, 17, 17, 17)).astype(np.float32)
        p = str(tmp_path / "stack.npy")
        np.save(p, a)
        got = native.read_npy_direct(p)
        np.testing.assert_array_equal(got, a)

    def test_large_multichunk_parallel(self, tmp_path):
        # > one 8 MB chunk so multiple threads take disjoint ranges
        rng = np.random.default_rng(12)
        a = rng.integers(0, 255, size=(20 << 20,), dtype=np.uint8)
        p = str(tmp_path / "big.npy")
        np.save(p, a)
        got = native.read_npy_direct(p, nthreads=4)
        np.testing.assert_array_equal(got, a)

    def test_odd_tail(self, tmp_path):
        # total bytes deliberately not a multiple of 4096
        a = np.arange(1234567, dtype=np.uint8)
        p = str(tmp_path / "odd.npy")
        np.save(p, a)
        np.testing.assert_array_equal(native.read_npy_direct(p), a)

    def test_registry_env_gate(self, tmp_path, monkeypatch):
        from vdm4cdm_tpu.data.registry import DataRegistry

        rng = np.random.default_rng(13)
        a = np.abs(rng.standard_normal((2, 8, 8, 8))).astype(np.float32)
        np.save(tmp_path / "f.npy", a)
        reg_dir = tmp_path / "reg"
        reg_dir.mkdir()
        import json

        (reg_dir / "data_source_3d.json").write_text(json.dumps(
            {"CMD": {"Astrid": {"LH": {"z_0.0": {"Mcdm": "f.npy"}}}}}))
        (reg_dir / "normalizations_3d.json").write_text(json.dumps(
            {"Mcdm_m": 0.0, "Mcdm_s": 1.0}))
        (reg_dir / "alphas_3d.json").write_text(json.dumps({"Mcdm": 1.0}))
        reg = DataRegistry(registry_dir=str(reg_dir), suffix="_3d",
                       data_root=str(tmp_path))
        monkeypatch.setenv("VDM4CDM_DIRECT_IO", "1")
        got = reg.load_field("CMD", "Astrid", "LH", "z_0.0", "Mcdm", mmap=False)
        assert isinstance(got, np.ndarray) and not isinstance(got, np.memmap)
        np.testing.assert_array_equal(got, a)
