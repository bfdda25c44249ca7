"""Bucketed fixed-shape batching (data/batching.py): the XLA-friendly
replacement for HF padding="longest"."""

import numpy as np

from multimodalpromptretrieval_tpu.data.batching import (
    bucket_width,
    make_batches,
    pad_ids,
    pad_labels,
)


def test_bucket_width_rounds_up():
    assert bucket_width(1) == 32
    assert bucket_width(32) == 32
    assert bucket_width(33) == 64
    assert bucket_width(512) == 512
    assert bucket_width(600, maximum=512) == 512


def test_pad_ids_and_mask():
    ids, mask = pad_ids([[5, 6], [7]], width=4)
    np.testing.assert_array_equal(ids, [[5, 6, 0, 0], [7, 0, 0, 0]])
    np.testing.assert_array_equal(mask, [[1, 1, 0, 0], [1, 0, 0, 0]])


def test_pad_labels_ignore_index():
    out = pad_labels([[3], [4, 5]], width=3)
    np.testing.assert_array_equal(out, [[3, -100, -100], [4, 5, -100]])


def _entries(n):
    return [{"question_id": str(i), "len": (i % 5) + 1} for i in range(n)]


def test_static_batch_shapes_and_fill_rows():
    entries = _entries(10)
    batches = make_batches(
        entries, 4,
        encode_fn=lambda e: list(range(e["len"])),
        target_fn=lambda e: [1, 2],
    )
    assert len(batches) == 3
    for b in batches:
        assert b.arrays["input_ids"].shape[0] == 4  # static batch size
    # last batch has 2 real rows + 2 fill rows
    assert len(batches[-1]) == 2
    assert batches[-1].valid.tolist() == [True, True, False, False]
    # fill rows repeat the last real entry
    assert batches[-1].entries[2] is batches[-1].entries[1]


def test_same_lengths_share_bucket():
    """All batches with max len <= 32 compile to the same (B, 32) shape —
    the anti-retrace property."""
    entries = _entries(16)
    batches = make_batches(entries, 4,
                           encode_fn=lambda e: list(range(e["len"])))
    shapes = {b.arrays["input_ids"].shape for b in batches}
    assert shapes == {(4, 32)}


def test_shuffle_deterministic_with_rng():
    entries = _entries(20)
    kw = dict(encode_fn=lambda e: [1, 2, 3])
    b1 = make_batches(entries, 4, shuffle_rng=np.random.default_rng(7), **kw)
    b2 = make_batches(entries, 4, shuffle_rng=np.random.default_rng(7), **kw)
    b3 = make_batches(entries, 4, shuffle_rng=np.random.default_rng(8), **kw)
    ids = lambda bs: [e["question_id"] for b in bs for e in b.entries]  # noqa: E731
    assert ids(b1) == ids(b2)
    assert ids(b1) != ids(b3)
    # every entry appears exactly once among valid rows
    valid_ids = [e["question_id"] for b in b1
                 for e, v in zip(b.entries, b.valid) if v]
    assert sorted(valid_ids, key=int) == [str(i) for i in range(20)]


def test_truncation_to_max_source_length():
    entries = [{"question_id": "0"}]
    batches = make_batches(entries, 1,
                           encode_fn=lambda e: list(range(700)),
                           max_source_length=512)
    assert batches[0].arrays["input_ids"].shape == (1, 512)
    assert batches[0].arrays["text_mask"].sum() == 512


def test_encode_unique_chunks_tuple_inputs():
    """fetch(item) may return a tuple (multi-input encoders like the CLIP
    image⊕text query embedder): each position is stacked into its own
    batch array and step receives the tuple."""
    from multimodalpromptretrieval_tpu.data.batching import (
        encode_unique_chunks,
    )

    imgs = np.arange(7 * 3, dtype=np.float32).reshape(7, 3)
    ids = np.arange(7 * 2, dtype=np.int32).reshape(7, 2)
    calls = []

    def step(x):
        a, b = x
        calls.append((a.shape, b.shape))
        return a * 2 + b.sum(axis=1, keepdims=True).astype(np.float32)

    out = encode_unique_chunks(
        list(range(7)), lambda i: (imgs[i], ids[i]), lambda x: x, step,
        batch_size=3)
    assert calls == [((3, 3), (3, 2))] * 3
    want = imgs * 2 + ids.sum(axis=1, keepdims=True).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out[0]), want)
