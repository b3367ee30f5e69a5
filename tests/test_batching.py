"""Fixed-shape batching + prefetch utilities (utils/batching.py) — the one
place the pad-to-batch idiom lives; previously covered only indirectly
through the trainers."""

import numpy as np
import pytest

from clip_codec_tpu.utils.batching import pad_rows, padded_index_batches, prefetch_iter


def test_pad_rows():
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    assert pad_rows(x, 3) is x  # full batch untouched
    y = pad_rows(x, 5)
    assert y.shape == (5, 2)
    np.testing.assert_array_equal(y[:3], x)
    np.testing.assert_array_equal(y[3:], 0)


def test_padded_index_batches_tail():
    batches = list(padded_index_batches(10, 4))
    assert len(batches) == 3
    for idx, w in batches:
        assert len(idx) == 4 and len(w) == 4
    idx, w = batches[-1]
    np.testing.assert_array_equal(w, [1, 1, 0, 0])  # 2 real + 2 padding
    assert idx[2] == idx[0] and idx[3] == idx[0]  # pad repeats tail head
    # every real element covered exactly once with weight 1
    covered = np.concatenate([i[ww > 0] for i, ww in batches])
    np.testing.assert_array_equal(np.sort(covered), np.arange(10))


def test_padded_index_batches_respects_order():
    order = np.array([3, 1, 0, 2])
    (idx, w), = list(padded_index_batches(4, 4, order))
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_array_equal(w, 1)


def test_prefetch_iter_preserves_order_and_exhausts():
    items = list(range(20))
    assert list(prefetch_iter(iter(items), prefetch=3)) == items
    assert list(prefetch_iter(iter(items), prefetch=0)) == items  # passthrough


def test_prefetch_iter_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = prefetch_iter(gen(), prefetch=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="decode failed"):
        next(it)
