"""Data pipeline semantics tests (SURVEY.md section 2 training-generator row)."""

import numpy as np
import pytest

from fetal_mri_segmentation_tpu.data import open_data_file, write_data_to_file
from fetal_mri_segmentation_tpu.pipeline import (
    create_patch_index_list, data_generator, get_multi_class_labels,
    get_number_of_steps, get_training_and_validation_generators,
    get_validation_split, prefetch)
from tests.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def data_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("gen")
    files = write_synthetic_dataset(str(d / "nii"), n_cases=5, shape=(20, 20, 20))
    out = str(d / "data.h5")
    write_data_to_file(files, out, image_shape=(16, 16, 16),
                       normalize="per_volume", crop=False)
    f = open_data_file(out)
    yield f
    f.close()


def test_validation_split_pickled_and_reused(data_file, tmp_path):
    tf, vf = str(tmp_path / "t.pkl"), str(tmp_path / "v.pkl")
    t1, v1 = get_validation_split(data_file, tf, vf, data_split=0.8,
                                  overwrite=True, seed=0)
    assert sorted(t1 + v1) == [0, 1, 2, 3, 4]
    assert len(t1) == 4 and len(v1) == 1
    t2, v2 = get_validation_split(data_file, tf, vf, data_split=0.8,
                                  overwrite=False, seed=999)
    assert t2 == t1 and v2 == v1  # reused from pickle, not recomputed


def test_multi_class_labels():
    truth = np.zeros((2, 1, 4, 4, 4), np.float32)
    truth[0, 0, 0, 0, 0] = 3
    truth[1, 0, 1, 1, 1] = 5
    y = get_multi_class_labels(truth, n_labels=2, labels=(3, 5))
    assert y.shape == (2, 2, 4, 4, 4)
    assert y[0, 0, 0, 0, 0] == 1 and y[0, 1].sum() == 0
    assert y[1, 1, 1, 1, 1] == 1 and y[1, 0].sum() == 0


def test_number_of_steps():
    assert get_number_of_steps(10, 4) == 3
    assert get_number_of_steps(8, 4) == 2
    # reference branch: n_samples <= batch_size returns n_samples
    assert get_number_of_steps(2, 4) == 2
    assert get_number_of_steps(4, 4) == 4
    assert get_number_of_steps(5, 4) == 2


def test_patch_index_list_offsets():
    rng = np.random.default_rng(0)
    idx = create_patch_index_list([0, 1], (16, 16, 16), (8, 8, 8),
                                  patch_overlap=0,
                                  patch_start_offset=(4, 4, 4), rng=rng)
    cases = {i for i, _ in idx}
    assert cases == {0, 1}
    corners = np.array([c for _, c in idx])
    assert (corners >= -8).all()  # negative random offsets allowed
    assert (corners.min(axis=0) <= 0).all()


def test_data_generator_batches(data_file):
    gen = data_generator(data_file, [0, 1, 2], batch_size=4, n_labels=1,
                         patch_shape=(8, 8, 8), patch_overlap=0,
                         skip_blank=True, seed=0)
    x, y = next(gen)
    assert x.shape[1:] == (1, 8, 8, 8)
    assert y.shape[1:] == (1, 8, 8, 8)
    assert x.shape[0] <= 4
    assert set(np.unique(y)).issubset({0.0, 1.0})
    for _ in range(3):
        x2, y2 = next(gen)
        assert np.any(y2)  # skip_blank guarantees non-empty truth per patch?
    # NOTE: skip_blank drops all-zero patches — every yielded batch must
    # contain at least one foreground voxel somewhere.


def test_whole_volume_generator_no_patches(data_file):
    gen = data_generator(data_file, [0, 1], batch_size=2, n_labels=1,
                         patch_shape=None, skip_blank=False, seed=0)
    x, y = next(gen)
    assert x.shape == (2, 1, 16, 16, 16)


def test_get_training_and_validation_generators(data_file, tmp_path):
    tg, n_t, vg, n_v = get_training_and_validation_generators(
        data_file, batch_size=4, n_labels=1,
        training_keys_file=str(tmp_path / "t.pkl"),
        validation_keys_file=str(tmp_path / "v.pkl"),
        data_split=0.8, overwrite=True, patch_shape=(8, 8, 8),
        validation_patch_overlap=2,
        training_patch_start_offset=(4, 4, 4), skip_blank=True, seed=0)
    assert n_t >= 1 and n_v >= 1
    x, y = next(tg)
    assert x.shape[1:] == (1, 8, 8, 8)
    xv, yv = next(vg)
    assert xv.shape[1:] == (1, 8, 8, 8)


def test_prefetch_passthrough_and_errors():
    assert list(prefetch(iter(range(5)), size=2)) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_prefetch_producer_exits_when_consumer_abandons():
    """An abandoned consumer must not leave the producer thread blocked on
    q.put forever (it may hold device buffers)."""
    import threading
    import time

    producer_done = threading.Event()

    def infinite():
        try:
            i = 0
            while True:
                yield i
                i += 1
        finally:
            producer_done.set()

    it = prefetch(infinite(), size=1)
    assert next(it) == 0
    it.close()  # consumer abandons mid-stream (generator finalizer)
    assert producer_done.wait(timeout=5.0), "producer thread leaked"


def test_all_blank_dataset_raises_instead_of_hanging(tmp_path):
    """skip_blank on an all-background dataset must error, not spin forever."""
    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti
    from fetal_mri_segmentation_tpu.data import write_data_to_file, open_data_file

    files = []
    for i in range(2):
        d = tmp_path / f"case_{i}"
        d.mkdir()
        vol = np.random.default_rng(i).random((12, 12, 12)).astype(np.float32)
        save_nifti(vol, str(d / "volume.nii.gz"))
        save_nifti(np.zeros((12, 12, 12), np.uint8), str(d / "truth.nii.gz"))
        files.append([str(d / "volume.nii.gz"), str(d / "truth.nii.gz")])
    out = str(tmp_path / "blank.h5")
    write_data_to_file(files, out, image_shape=(12, 12, 12), normalize=None,
                       crop=False)
    with open_data_file(out) as f:
        gen = data_generator(f, [0, 1], batch_size=2, n_labels=1,
                             patch_shape=(6, 6, 6), skip_blank=True, seed=0)
        with pytest.raises(RuntimeError, match="no batches"):
            next(gen)


def test_data_generator_skip_batches_fast_forward(data_file):
    """Data-order exact resume: a generator created with skip_batches=k
    yields the EXACT batch sequence a fresh generator yields after k
    batches — even mid-epoch, and even with skip_blank=True where
    generator-epoch lengths drift from the loop's fixed steps_per_epoch
    (the case that makes epoch-level fast-forward insufficient)."""
    for skip_blank in (False, True):
        for k in (8, 11):  # 8 = one exact no-skip epoch; 11 = mid-epoch
            kw = dict(batch_size=3, n_labels=1, patch_shape=(8, 8, 8),
                      patch_overlap=0, patch_start_offset=(4, 4, 4),
                      skip_blank=skip_blank, seed=42)
            fresh = data_generator(data_file, [0, 1, 2], **kw)
            burn = [next(fresh) for _ in range(k)]
            want = [next(fresh) for _ in range(6)]

            resumed = data_generator(data_file, [0, 1, 2],
                                     skip_batches=k, **kw)
            for want_x, want_y in want:
                got_x, got_y = next(resumed)
                np.testing.assert_array_equal(got_x, want_x)
                np.testing.assert_array_equal(got_y, want_y)

            # sanity: the stream genuinely evolves (offsets + shuffle)
            assert not all(np.array_equal(a[0], b[0])
                           for a, b in zip(burn, want))

    # seed=None stays nondeterministic and accepts skip_batches
    g = data_generator(data_file, [0, 1, 2], batch_size=3, n_labels=1,
                       patch_shape=(8, 8, 8), patch_overlap=0,
                       patch_start_offset=(4, 4, 4), skip_blank=False,
                       seed=None, skip_batches=3)
    next(g)


def test_skip_batches_negative_rejected(data_file):
    with pytest.raises(ValueError, match="skip_batches"):
        next(data_generator(data_file, [0, 1], batch_size=2, n_labels=1,
                            patch_shape=(8, 8, 8), skip_blank=False,
                            seed=0, skip_batches=-1))


@pytest.fixture(scope="module")
def blank_tail_file(tmp_path_factory):
    """2 cases: case 0 all-blank truth, case 1 normal — lets tests force an
    epoch whose FINAL pops are blank-skipped."""
    from fetal_mri_segmentation_tpu.utils.nifti import save_nifti

    d = tmp_path_factory.mktemp("blanktail")
    files = []
    for i in range(2):
        c = d / f"case_{i}"
        c.mkdir()
        vol = np.random.default_rng(i).random((12, 12, 12)).astype(np.float32)
        truth = np.zeros((12, 12, 12), np.uint8)
        if i == 1:
            truth[3:9, 3:9, 3:9] = 1
        save_nifti(vol, str(c / "volume.nii.gz"))
        save_nifti(truth, str(c / "truth.nii.gz"))
        files.append([str(c / "volume.nii.gz"), str(c / "truth.nii.gz")])
    out = str(d / "data.h5")
    write_data_to_file(files, out, image_shape=(12, 12, 12), normalize=None,
                       crop=False)
    f = open_data_file(out)
    yield f
    f.close()


def test_trailing_partial_emitted_when_final_pops_blank(blank_tail_file):
    """Reference semantics: the yield check runs after EVERY pop, so a
    trailing partial batch is emitted even when the epoch's last popped
    indices were blank-skipped. Previously this epoch raised a spurious
    'truth volumes appear to be empty' RuntimeError (1 kept patch <
    batch_size and the final pop blank)."""
    # whole-volume mode, no shuffle: epoch_list=[0(blank), 1(full)] popped
    # from the END -> pop order is case 1 (kept), then case 0 (blank)
    gen = data_generator(blank_tail_file, [0, 1], batch_size=2, n_labels=1,
                         patch_shape=None, skip_blank=True,
                         shuffle_index_list=False, seed=0)
    x, y = next(gen)
    assert x.shape[0] == 1  # the held partial batch, not dropped
    assert y.max() == 1.0
    # and the stream continues epoch after epoch
    x2, _ = next(gen)
    assert x2.shape[0] == 1


def test_skip_batches_lockstep_across_blank_tail(blank_tail_file):
    """The fast-forward replay must count the blank-closed partial batch
    exactly like the emit path (BatchSkipper.note_patch with kept=False at
    epoch end) — resume stays bitwise on blank-tail epochs."""
    kw = dict(batch_size=2, n_labels=1, patch_shape=None, skip_blank=True,
              shuffle_index_list=False, seed=0)
    fresh = data_generator(blank_tail_file, [0, 1], **kw)
    for _ in range(3):
        next(fresh)  # 3 one-sample batches = 3 whole epochs
    want = [next(fresh) for _ in range(2)]
    resumed = data_generator(blank_tail_file, [0, 1], skip_batches=3, **kw)
    for wx, wy in want:
        gx, gy = next(resumed)
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)


def test_validation_split_regenerated_when_either_pickle_missing(
        data_file, tmp_path):
    import os

    tf, vf = str(tmp_path / "t.pkl"), str(tmp_path / "v.pkl")
    t1, v1 = get_validation_split(data_file, tf, vf, data_split=0.8,
                                  overwrite=True, seed=0)
    os.remove(vf)  # partial run dir: validation pickle lost
    t2, v2 = get_validation_split(data_file, tf, vf, data_split=0.8,
                                  overwrite=False, seed=0)
    assert sorted(t2 + v2) == [0, 1, 2, 3, 4]
    assert os.path.exists(vf)  # regenerated as a consistent PAIR


def test_validation_split_rejects_overlapping_pickles(data_file, tmp_path):
    """A train pickle from one run + a val pickle from another can put the
    same case in both lists — validation would silently be contaminated."""
    from fetal_mri_segmentation_tpu.utils.io_utils import pickle_dump

    tf, vf = str(tmp_path / "t.pkl"), str(tmp_path / "v.pkl")
    pickle_dump([0, 1, 2], tf)
    pickle_dump([2, 3], vf)  # case 2 in BOTH
    with pytest.raises(ValueError, match="OVERLAP"):
        get_validation_split(data_file, tf, vf, overwrite=False)
