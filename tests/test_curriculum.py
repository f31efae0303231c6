"""Curriculum sampler tests: ordering determinism, progressive subset
growth with N/10 floor, post-warmup randomization, pacing functions."""

import numpy as np
import pytest

from image_captioning_ml_project_tpu.train.curriculum import (
    CurriculumSampler,
    PacingFunction,
    create_curriculum_sampler,
)


class FakeDataset:
    def __init__(self, lengths):
        self._lengths = np.asarray(lengths)

    def __len__(self):
        return len(self._lengths)

    def caption_lengths(self):
        return self._lengths


def make_sampler(n=100, warmup=3, **kw):
    lengths = np.arange(n)[::-1].copy()  # difficulty descending by index
    return CurriculumSampler(FakeDataset(lengths), num_epochs=10,
                             warmup_epochs=warmup, seed=0, **kw), lengths


def test_easy_samples_first_epoch():
    sampler, lengths = make_sampler(shuffle_within_bins=False)
    sampler.set_epoch(0)
    idx = list(sampler)
    # epoch 0 of 3 warmup -> 1/3 of data, easiest (shortest) first
    assert len(idx) == len(sampler) == 33
    assert set(idx) == set(np.argsort(lengths)[:33].tolist())
    # shuffle_within_bins=False preserves the strict easy-to-hard order
    # (a full shuffle would invert the flag's meaning)
    assert idx == sorted(idx, key=lambda i: lengths[i])


def test_subset_grows_with_floor():
    sampler, _ = make_sampler()
    sampler.set_epoch(0)
    n0 = len(sampler)
    sampler.set_epoch(1)
    n1 = len(sampler)
    sampler.set_epoch(2)
    n2 = len(sampler)
    assert n0 < n1 < n2 == 100
    # floor: even with tiny progress, at least N/10
    tiny = CurriculumSampler(FakeDataset(np.arange(100)), num_epochs=100,
                             warmup_epochs=100, seed=0)
    tiny.set_epoch(0)
    assert len(tiny) >= 10


def test_post_warmup_random_full():
    sampler, _ = make_sampler(warmup=2)
    sampler.set_epoch(5)
    idx = list(sampler)
    assert len(idx) == 100
    assert sorted(idx) == list(range(100))
    assert idx != sorted(idx)  # permuted, not sorted


def test_bin_shuffle_preserves_bin_membership():
    sampler, lengths = make_sampler(shuffle_within_bins=True)
    sampler.set_epoch(2)  # full dataset, still curriculum-ordered epoch
    idx = np.array(list(sampler))
    assert len(idx) == 100
    order = np.argsort(lengths)
    bin_size = 10
    for b in range(10):
        got = set(idx[b * bin_size:(b + 1) * bin_size].tolist())
        want = set(order[b * bin_size:(b + 1) * bin_size].tolist())
        assert got == want  # shuffled within, not across, bins


def test_pacing_functions():
    assert PacingFunction.linear(4, 10) == pytest.approx(0.5)
    assert PacingFunction.root(4, 10) == pytest.approx(np.sqrt(0.5))
    assert PacingFunction.exponential(4, 10) == pytest.approx(0.25)
    assert PacingFunction.step(0, 10, 3) == pytest.approx(1 / 3)
    assert PacingFunction.step(9, 10, 3) == pytest.approx(1.0)


def test_pacing_wired_into_subset_size():
    # root pacing grows the included subset faster than linear early on;
    # exponential grows it slower. linear matches the legacy hard-coded math.
    linear, _ = make_sampler(n=100, warmup=4, shuffle_within_bins=False)
    root, _ = make_sampler(n=100, warmup=4, shuffle_within_bins=False,
                           pacing="root")
    expo, _ = make_sampler(n=100, warmup=4, shuffle_within_bins=False,
                           pacing="exponential")
    for s in (linear, root, expo):
        s.set_epoch(0)
    assert len(linear) == 25  # (0+1)/4 * 100 — reference's expression
    assert len(root) == int(np.sqrt(0.25) * 100)
    assert len(expo) == max(int(0.25 ** 2 * 100), 10)
    assert len(expo) < len(linear) < len(root)
    # all pacings still include the easiest samples first
    assert list(root)[:10] == list(linear)[:10]


def test_pacing_unknown_falls_back_to_linear():
    s, _ = make_sampler(pacing="no_such_pacing")
    assert s.pacing == "linear"


def test_factory_threads_pacing():
    from image_captioning_ml_project_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.training.use_curriculum = True
    cfg.training.curriculum_pacing = "root"
    s = create_curriculum_sampler(FakeDataset(np.arange(10)), cfg)
    assert s.pacing == "root"


def test_factory_gating():
    from image_captioning_ml_project_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.training.use_curriculum = False
    assert create_curriculum_sampler(FakeDataset(np.arange(10)), cfg) is None
    cfg.training.use_curriculum = True
    cfg.training.num_epochs = 15
    s = create_curriculum_sampler(FakeDataset(np.arange(10)), cfg)
    assert s is not None
    assert s.warmup_epochs == 5  # min(5, 15//3)
