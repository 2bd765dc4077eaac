"""Perceptual image hashing (operators/phash.py): gradient-sign dHash
invariances, average-hash behavior, banded Hamming near-dup join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from d2d_spark.operators.phash import phash_near_pairs, with_phash

SCHEMA = "img_id long, px array<int>, w int, h int"


def _img(w, h, fn):
    return [min(255, max(0, int(fn(x, y)))) for y in range(h) for x in range(w)]


def _gradient(w, h):
    return _img(w, h, lambda x, y: 255 * x / max(w - 1, 1))


def _checker(w, h, cell=4):
    return _img(w, h, lambda x, y: 255 * (((x // cell) + (y // cell)) % 2))


def _noise(w, h, seed):
    rng = random.Random(seed)
    return [rng.randrange(256) for _ in range(w * h)]


def _upscale(px, w, h, k):
    """k-x pixel replication."""
    out = []
    for y in range(h * k):
        for x in range(w * k):
            out.append(px[(y // k) * w + (x // k)])
    return out


def _hashes(spark, rows, method="dhash"):
    df = spark.createDataFrame(rows, SCHEMA)
    out = with_phash(df, "px", "w", "h", method=method)
    return {r["img_id"]: r["phash"] for r in out.collect()}


def test_dhash_identical_and_brightness_invariant(spark):
    w, h = 32, 24
    g = _gradient(w, h)
    brighter = [min(255, p + 40) for p in g]
    rows = [(1, g, w, h), (2, list(g), w, h), (3, brighter, w, h)]
    got = _hashes(spark, rows)
    assert got[1] == got[2], "identical pixels must hash identically"
    # gradient signs survive a uniform brightness shift (clipping at
    # 255 flattens only the brightest cells; a +40 shift on a 0..255
    # ramp keeps every left<right comparison except inside the clip
    # region, which this ramp's 8 sampled cells avoid)
    assert got[1] == got[3], "dhash must be brightness-shift invariant"


def test_dhash_resize_invariant_on_integer_upscale(spark):
    w, h = 18, 16
    base = _checker(w, h)
    up = _upscale(base, w, h, 3)
    got = _hashes(spark, [(1, base, w, h), (2, up, w * 3, h * 3)])
    assert got[1] == got[2], "k-x pixel replication must not move the hash"


def test_dhash_separates_unrelated_images(spark):
    w, h = 24, 24
    got = _hashes(
        spark,
        [(1, _noise(w, h, 7), w, h), (2, _noise(w, h, 8), w, h), (3, _gradient(w, h), w, h)],
    )
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[1], got[2]) > 12
    assert ham(got[1], got[3]) > 12


def test_phash_guards_bad_inputs(spark):
    w, h = 16, 16
    rows = [
        (1, _gradient(w, h), w, h),
        (2, _gradient(6, 6), 6, 6),  # narrower than the 9x8 grid
        (3, _gradient(w, h)[: w * h - 10], w, h),  # truncated pixels
        (4, _gradient(w, h), None, h),  # no width
    ]
    got = _hashes(spark, rows)
    assert got[1] is not None
    assert got[2] is None and got[3] is None and got[4] is None


def test_ahash_flags_mean_structure(spark):
    w, h = 16, 16
    half = _img(w, h, lambda x, y: 255 if x >= w // 2 else 0)
    got = _hashes(spark, [(1, half, w, h)], method="ahash")
    hv = got[1] & ((1 << 64) - 1)
    # right half of every 8-cell row is above the global mean: bits
    # 4..7 of each row set, 0..3 clear
    for row in range(8):
        assert (hv >> (row * 8)) & 0xFF == 0xF0


def test_phash_near_pairs_finds_planted_dups(spark):
    w, h = 24, 20
    rng = random.Random(3)
    rows = []
    for i in range(30):
        px = _noise(w, h, seed=100 + i)
        rows.append((i, px, w, h))
        if i < 8:
            # clone with a mild brightness wobble: a handful of bits
            jittered = [min(255, max(0, p + rng.randint(-4, 4))) for p in px]
            rows.append((1000 + i, jittered, w, h))
    df = spark.createDataFrame(rows, SCHEMA)
    pairs = phash_near_pairs(df, "img_id", "px", "w", "h", max_hamming=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(8):
        assert (i, 1000 + i) in got, f"planted near-dup {i} missed"
    # unrelated random images must not collide at this distance
    assert all(b - a == 1000 for a, b in got)


def test_phash_validates_method(spark):
    import pytest

    df = spark.createDataFrame([(1, [0] * 100, 10, 10)], SCHEMA)
    with pytest.raises(ValueError, match="method"):
        with_phash(df, "px", "w", "h", method="md5")


def test_hamming_near_pairs_equals_bruteforce(spark):
    """The pigeonhole banding is FULL recall by construction: results
    must equal the quadratic brute-force pair set exactly, for several
    max_hamming settings, on adversarial hashes (clusters of small
    perturbations plus uniform noise)."""
    import itertools

    from d2d_spark.operators.dedup import hamming_near_pairs

    rng = random.Random(11)
    hashes = []
    for base in (rng.getrandbits(63) for _ in range(6)):
        hashes.append(base)
        for _ in range(3):  # flip up to 6 random bits
            v = base
            for _ in range(rng.randint(1, 6)):
                v ^= 1 << rng.randrange(64)
            hashes.append(v)
    hashes += [rng.getrandbits(63) for _ in range(20)]
    # two's-complement into int64: bit 63 may be set by the flips
    hashes = [v - (1 << 64) if v >= 1 << 63 else v for v in hashes]
    rows = [(i, hv) for i, hv in enumerate(hashes)]
    df = spark.createDataFrame(rows, "img_id long, hv long")

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for max_h in (0, 3, 8):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_near_pairs(df, "hv", "img_id", max_hamming=max_h).collect()
        }
        want = {
            (a, b, ham(hashes[a], hashes[b]))
            for a, b in itertools.combinations(range(len(hashes)), 2)
            if ham(hashes[a], hashes[b]) <= max_h
        }
        assert got == want, f"banding diverged from brute force at max_hamming={max_h}"


def test_video_near_pairs_frame_set_overlap(spark):
    """Videos = frame lists; clones (incl. brightness-shifted and
    trimmed) pair with exact frame-set Jaccard; unrelated footage
    doesn't; stop-frames drop under max_df."""
    from d2d_spark.operators.phash import video_near_pairs

    W, H = 18, 12
    # pixels capped at 215 so the +30 brightness shift never clips —
    # clipping would change gradient signs and break exact invariance
    frames = [[p % 216 for p in _noise(W, H, seed)] for seed in range(10)]
    bright = [[p + 30 for p in f] for f in frames]  # dhash-invariant
    vids = [
        (1, frames[:6]),             # base: frames 0..5
        (2, bright[:6]),             # brightness-shifted clone of 1
        (3, frames[2:8]),            # 6 frames, 4 shared with 1
        (4, [_gradient(W, H)] * 4),  # unrelated (and all-identical)
        (5, frames[:3] + frames[:3]),  # trimmed repeat: distinct set = 3
    ]
    df = spark.createDataFrame(
        [(i, fs, W, H) for i, fs in vids],
        "vid long, frames array<array<int>>, w int, h int",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
        for r in video_near_pairs(
            df, "vid", "frames", "w", "h", threshold_pct=30, max_df=None
        ).collect()
    }
    # brightness clone: identical dhash sets -> jaccard 1.0 exactly
    assert got[(1, 2)][:3] == (6, 6, 6) and got[(1, 2)][3] == 1.0
    # overlap 4 of (6 + 6 - 4) = 0.5
    assert got[(1, 3)] == (4, 6, 6, 0.5)
    assert got[(2, 3)] == (4, 6, 6, 0.5)
    # trimmed repeat: distinct set of 3, all shared with video 1
    assert got[(1, 5)] == (3, 6, 3, 0.5)
    # unrelated video pairs with nobody
    assert not any(4 in p for p in got)
    # max_df stop-frame cut: frames 2..5 appear in videos 1,2,3 ->
    # df 3; cap at 2 removes them, so (1,3) loses its overlap
    capped = {
        (r["id_a"], r["id_b"])
        for r in video_near_pairs(
            df, "vid", "frames", "w", "h", threshold_pct=30, max_df=2
        ).collect()
    }
    assert (1, 3) not in capped
    # empty frame lists and undersized frames drop, not crash
    weird = spark.createDataFrame(
        [(9, [], W, H), (10, [[1, 2, 3]], W, H)],
        "vid long, frames array<array<int>>, w int, h int",
    )
    assert video_near_pairs(
        df.unionByName(weird), "vid", "frames", "w", "h", threshold_pct=99
    ).filter("id_a >= 9 or id_b >= 9").count() == 0
