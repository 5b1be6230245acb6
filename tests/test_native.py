"""Tests for the C++ native layer: LSA, RLE codec, polygon fill, BPE."""
import ctypes

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from toist_tpu import native
from toist_tpu.ops import rle


def test_lsa_matches_scipy():
    lib = native.load()
    rng = np.random.default_rng(0)
    for (nr, nc) in [(1, 1), (5, 9), (25, 100), (100, 100), (60, 60)]:
        for _ in range(5):
            cost = rng.normal(size=(nr, nc)).astype(np.float64)
            out = np.empty(nr, np.int32)
            ret = lib.lsa_solve(
                cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nr, nc,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            assert ret == 0
            rows, cols = linear_sum_assignment(cost)
            np.testing.assert_allclose(
                cost[np.arange(nr), out].sum(), cost[rows, cols].sum(),
                rtol=1e-9, atol=1e-9)


def test_rle_roundtrip():
    rng = np.random.default_rng(1)
    for shape in [(7, 5), (64, 64), (100, 37)]:
        mask = (rng.uniform(size=shape) > 0.6).astype(np.uint8)
        r = rle.encode(mask)
        back = rle.decode(r)
        np.testing.assert_array_equal(back, mask)
        assert rle.area(r) == mask.sum()


def test_rle_string_codec_known_value():
    # A tiny hand-checkable case: 3x3 mask with first column all ones.
    mask = np.zeros((3, 3), np.uint8)
    mask[:, 0] = 1
    r = rle.encode(mask)
    # Column-major: 0 zeros, 3 ones, 6 zeros -> counts [0, 3, 6]
    back = rle.decode(r)
    np.testing.assert_array_equal(back, mask)
    assert rle.area(r) == 3
    assert isinstance(r["counts"], bytes)


def test_rle_iou():
    a = np.zeros((10, 10), np.uint8); a[0:5, :] = 1     # 50 px
    b = np.zeros((10, 10), np.uint8); b[3:8, :] = 1     # 50 px, overlap 20
    ra, rb = rle.encode(a), rle.encode(b)
    got = rle.iou([ra], [rb], [0])
    np.testing.assert_allclose(got, [[20 / 80]], atol=1e-9)
    # iscrowd: union = dt area
    got_crowd = rle.iou([ra], [rb], [1])
    np.testing.assert_allclose(got_crowd, [[20 / 50]], atol=1e-9)


def test_rle_merge():
    a = np.zeros((6, 6), np.uint8); a[:3] = 1
    b = np.zeros((6, 6), np.uint8); b[2:5] = 1
    u = rle.decode(rle.merge([rle.encode(a), rle.encode(b)]))
    np.testing.assert_array_equal(u, ((a + b) > 0).astype(np.uint8))
    i = rle.decode(rle.merge([rle.encode(a), rle.encode(b)], intersect=True))
    np.testing.assert_array_equal(i, ((a * b) > 0).astype(np.uint8))


def test_polygon_fill_rectangle():
    # Axis-aligned rectangle [2, 10) x [3, 8) in a 16x16 canvas.
    poly = [2, 3, 10, 3, 10, 8, 2, 8]
    mask = rle.polygons_to_mask([poly], 16, 16)
    expect = np.zeros((16, 16), np.uint8)
    expect[3:8, 2:10] = 1
    np.testing.assert_array_equal(mask, expect)


def test_polygon_fill_triangle_area():
    poly = [0, 0, 20, 0, 0, 20]
    mask = rle.polygons_to_mask([poly], 24, 24)
    # Shoelace area = 200; center-sampled raster should be within ~10%.
    assert abs(int(mask.sum()) - 200) < 25


def test_polygon_frpyobjects_matches_decode():
    poly = [1.5, 1.5, 12.2, 2.0, 11.0, 13.5, 2.0, 12.0]
    r = rle.frPyObjects(poly, 16, 16)
    m1 = rle.decode(r)
    m2 = rle.polygons_to_mask([poly], 16, 16)
    np.testing.assert_array_equal(m1, m2)


def test_uncompressed_rle_conversion():
    mask = np.zeros((5, 4), np.uint8)
    mask[1:3, 1:3] = 1
    r0 = rle.encode(mask)
    counts = []
    # Build uncompressed counts from the mask directly.
    flat = mask.reshape(-1, order="F")
    val, run = 0, 0
    for px in flat:
        if px == val:
            run += 1
        else:
            counts.append(run); run = 1; val = px
    counts.append(run)
    r1 = rle.frPyObjects({"size": [5, 4], "counts": counts}, 5, 4)
    np.testing.assert_array_equal(rle.decode(r1), mask)
    assert r1["counts"] == r0["counts"]


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------
from toist_tpu.data.tokenizer import RobertaBPE, BOS_ID, EOS_ID

CAPTIONS = [
    "step on something", "sit comfortably on something",
    "place flowers in something", "dig hole with something",
    "open bottle of beer with bottle opener",
    "serve wine with wine glass", "pour sugar with spoon",
]


@pytest.fixture(scope="module")
def bpe():
    return RobertaBPE.train(CAPTIONS, vocab_size=400)


def test_bpe_roundtrip_tokens(bpe):
    for cap in CAPTIONS:
        t = bpe.encode(cap)
        assert t.input_ids[0] == BOS_ID and t.input_ids[-1] == EOS_ID
        # Offsets reconstruct the full non-space text.
        rebuilt = "".join(cap[s:e] for s, e in zip(t.starts, t.ends))
        assert rebuilt == cap.replace(" ", "") or rebuilt == cap
        # Offsets are monotonically non-decreasing and within bounds.
        assert all(0 <= s < e <= len(cap) for s, e in zip(t.starts, t.ends))


def test_bpe_char_to_token(bpe):
    cap = "serve wine with wine glass"
    t = bpe.encode(cap)
    # Char inside first word maps to token 1 (after <s>).
    assert t.char_to_token(0) == 1
    # Space between words is trimmed from offsets -> None.
    assert t.char_to_token(cap.index(" ")) is None
    # Last char maps to last body token.
    assert t.char_to_token(len(cap) - 1) == len(t.input_ids) - 2


def test_bpe_trained_compression(bpe):
    # Frequent words (with their leading space, the trained form) merge to few tokens.
    t = bpe.encode("step on something")
    assert len(t.body_ids) <= 5


def test_bpe_unseen_bytes_fall_back(bpe):
    t = bpe.encode("zzz qqq")
    assert len(t.input_ids) >= 4  # falls back to byte units, not crash


def test_bpe_deterministic():
    a = RobertaBPE.train(CAPTIONS, vocab_size=350)
    b = RobertaBPE.train(CAPTIONS, vocab_size=350)
    assert a.vocab == b.vocab and a.merges == b.merges


def test_rle_encode_packed_cm_matches_plain_encode():
    """Column-major packed encode == plain encode on random masks, including
    crops from a padded canvas and non-multiple-of-8 heights."""
    from toist_tpu.ops import rle as rle_ops

    rng = np.random.default_rng(0)
    for oh, ow, canvas_h in ((64, 48, 64), (37, 23, 64), (8, 8, 16),
                             (100, 7, 104)):
        mask = (rng.random((oh, ow)) < 0.3).astype(np.uint8)
        want = rle_ops.encode(mask)
        # Pack the way the device does: column-major, canvas-padded, MSB-first.
        canvas = np.zeros((canvas_h, ow), np.uint8)
        canvas[:oh] = mask
        packed = np.packbits(canvas.T, axis=-1)  # [ow, canvas_h/8]
        got = rle_ops.encode_packed_cm(packed, oh, ow)
        assert got == want, (oh, ow)
    # Degenerate: all-zero and all-one masks.
    for fill in (0, 1):
        mask = np.full((32, 16), fill, np.uint8)
        packed = np.packbits(mask.T, axis=-1)
        assert rle_ops.encode_packed_cm(packed, 32, 16) == rle_ops.encode(mask)
