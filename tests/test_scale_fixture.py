"""Properties of the bounded-multiplicity scale fixture
(scripts/scale_check.py): the decade audit's claim that "true pair
output grows exactly linearly" rests on every replica copy being
non-near-duplicate of every other copy while preserving within-copy
similarity structure exactly. These are pure-python checks — no Spark.

The round-5 fixture used a 26-rotation cipher that silently exhausted
at n > 26 (same-rotation copies became exact duplicates: a 320x
second-decade output jump read as algorithm growth). The permutation
cipher tested here removes that failure mode by construction.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from scale_check import CIPHER_SRC, bounded_ciphers, bounded_signs  # noqa: E402


def test_ciphers_distinct_at_two_decades():
    # the failure mode being guarded: distinctness must survive n ≫ 26
    ciphers = bounded_ciphers(100)
    assert len(set(ciphers)) == 100


def test_cipher_is_segmentwise_permutation():
    # 1:1 within each alphabet segment → injective on strings, so
    # within-copy shingle equality/overlap is preserved exactly
    for dst in bounded_ciphers(40):
        assert sorted(dst[:26]) == sorted(CIPHER_SRC[:26])  # lowercase
        assert sorted(dst[26:52]) == sorted(CIPHER_SRC[26:52])  # uppercase
        assert sorted(dst[52:]) == sorted(CIPHER_SRC[52:])  # digits
        assert len(dst) == len(CIPHER_SRC)


def test_cipher_copy0_identity_and_deterministic():
    a, b = bounded_ciphers(10), bounded_ciphers(10)
    assert a == b  # seeded: rebuildable replica ⇒ same bytes
    assert a[0] == CIPHER_SRC  # copy 0 is byte-identical to the 1x corpus


def test_ciphers_diverge_pairwise():
    # no two ciphers agree on more than a coincidental handful of
    # lowercase positions — cross-copy shingles genuinely scramble
    # (expected agreement of two random permutations is 1 position)
    ciphers = bounded_ciphers(100)
    for i in range(0, 100, 7):
        for j in range(i + 1, 100, 11):
            agree = sum(
                1 for a, b in zip(ciphers[i][:26], ciphers[j][:26]) if a == b
            )
            assert agree <= 8, (i, j, agree)


def test_signs_preserve_cosine_within_copy():
    rng = np.random.default_rng(7)
    x, y = rng.normal(size=64), rng.normal(size=64)
    for i in (1, 5, 99):
        s = np.array(bounded_signs(i))
        assert set(np.unique(s)) <= {-1.0, 1.0}
        # dot products and norms are exactly sign-invariant
        np.testing.assert_allclose((s * x) @ (s * y), x @ y, rtol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(s * x), np.linalg.norm(x), rtol=1e-12
        )


def test_signs_distinct_across_copies_and_deterministic():
    pats = [tuple(bounded_signs(i)) for i in range(100)]
    assert len(set(pats)) == 100
    assert bounded_signs(3) == bounded_signs(3)


def test_cross_copy_sign_patterns_scramble_similarity():
    # a vector highly similar to itself across copies must NOT stay
    # similar once the two copies wear different sign patterns: the
    # expected cross-pattern cosine of (s_i∘x, s_j∘x) is the ±1
    # agreement imbalance, ~N(0, 1/64) — far below any dedup threshold
    rng = np.random.default_rng(11)
    x = rng.normal(size=64)
    xi = np.array(bounded_signs(2)) * x
    xj = np.array(bounded_signs(3)) * x
    cos = (xi @ xj) / (np.linalg.norm(xi) * np.linalg.norm(xj))
    assert abs(cos) < 0.5


def test_decade_section_renders_legs_independently():
    """A SCALE_DECADE.json with graph_ops (or probe) but NO bounded_ops
    must still render those sections — they are separate recordings,
    not sub-tables of the bounded leg."""
    from scale_check import _decade_section

    row = {"t1": 0.1, "t10": 0.5, "t100": 4.0,
           "growth_10x": 2.0, "growth_100x": 8.0}
    rec = {
        "ops": {"op_x": dict(row)},
        "graph_ops": {"op_pagerank": dict(row)},
        "probe": {"op_x": {"note": "partitions balanced"}},
    }
    text = "\n".join(_decade_section(rec))
    assert "Iterative-graph leg" in text
    assert "op_pagerank" in text
    assert "Partition/skew probe" in text
    # and WITH bounded_ops everything renders together
    rec["bounded_ops"] = {"op_x": dict(row)}
    text2 = "\n".join(_decade_section(rec))
    assert "Bounded-multiplicity leg" in text2
    assert "Iterative-graph leg" in text2


def test_decade_only_filter_validates_names():
    """run_decade(only=...) must reject names outside the selected
    leg's op list instead of silently timing nothing."""
    import pytest
    from scale_check import run_decade

    with pytest.raises(SystemExit, match="not in this leg"):
        run_decade(only={"op_not_a_real_op"})
