"""DynamicRangeUtil replay: the reference's own TestDynamicRangeUtil
expectation lists (facet/src/test/.../TestDynamicRangeUtil.java),
transcribed, against the run-length-compressed greedy in
extras.compute_dynamic_numeric_ranges."""

from collections import Counter

from lucene_spark.search.extras import compute_dynamic_numeric_ranges


def _run(values, weights, top_n):
    pairs = sorted(Counter(zip(values, weights)).items())
    rl = [(v, w, m) for (v, w), m in pairs]
    return compute_dynamic_numeric_ranges(
        rl, top_n, sum(weights), len(values)
    )


def test_basic():
    values = [i + 1 for i in range(1000)]
    weights = list(range(1000))
    assert _run(values, weights, 4) == [
        (501, 125250, 1, 501, 251.0),
        (207, 125028, 502, 708, 605.0),
        (159, 125133, 709, 867, 788.0),
        (133, 124089, 868, 1000, 934.0),
    ]


def test_same_values():
    # 100 rows of value 50 with weights 0..99: ranges split INSIDE the
    # equal-value run (the multiplicity arithmetic must fire mid-run)
    values = [50] * 100
    weights = list(range(100))
    assert _run(values, weights, 4) == [
        (51, 1275, 50, 50, 50.0),
        (21, 1281, 50, 50, 50.0),
        (16, 1272, 50, 50, 50.0),
        (12, 1122, 50, 50, 50.0),
    ]


def test_same_weights():
    values = list(range(100))
    weights = [50] * 100
    assert _run(values, weights, 4) == [
        (25, 1250, 0, 24, 12.0),
        (25, 1250, 25, 49, 37.0),
        (25, 1250, 50, 74, 62.0),
        (25, 1250, 75, 99, 87.0),
    ]


def test_one_value():
    assert _run([50], [1], 4) == [(1, 1, 50, 50, 50.0)]


def test_one_large_weight():
    values = [45, 32, 52, 14, 455, 342, 53]
    weights = [143, 23, 1, 52343, 53, 12, 2534]
    assert _run(values, weights, 4) == [
        (1, 52343, 14, 14, 14.0),
        (6, 2766, 32, 455, 163.16666666666666),
    ]


def test_large_top_n():
    values = [487, 439, 794, 277]
    weights = [59, 508, 736, 560]
    assert _run(values, weights, 42) == [
        (1, 560, 277, 277, 277.0),
        (1, 508, 439, 439, 439.0),
        (2, 795, 487, 794, 640.5),
    ]


def test_empty_and_zero_topn():
    assert _run([], [], 4) == []
    assert _run([1, 2], [1, 1], 0) == []


def test_zero_weights_absorb_into_trailing_range():
    # total weight 0 -> target 0.0; accu (0) >= 0 fires on EVERY row,
    # exactly like the reference's per-row loop
    got = _run([1, 2, 3], [0, 0, 0], 2)
    assert got == [(1, 0, 1, 1, 1.0), (1, 0, 2, 2, 2.0), (1, 0, 3, 3, 3.0)]


def test_multiplicity_equals_per_row_scan():
    # random-ish mixed runs: compressed arithmetic == literal per-row loop
    import random

    rnd = random.Random(7)
    for _ in range(25):
        n = rnd.randrange(1, 60)
        values = [rnd.randrange(0, 8) for _ in range(n)]
        weights = [rnd.randrange(0, 5) for _ in range(n)]
        top_n = rnd.randrange(1, 7)
        # literal transcription of the reference loop
        rows = sorted(zip(values, weights))
        t = float(sum(weights)) / min(top_n, n)
        exp = []
        accu = vsum = cnt = 0
        minidx = 0
        for i, (v, w) in enumerate(rows):
            accu += w
            vsum += v
            cnt += 1
            if accu >= t:
                exp.append((cnt, accu, rows[minidx][0], v, vsum / cnt))
                accu = vsum = cnt = 0
                minidx = i + 1
        if minidx < n:
            exp.append((cnt, accu, rows[minidx][0], rows[-1][0], vsum / cnt))
        assert _run(values, weights, top_n) == exp
