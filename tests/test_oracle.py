"""Oracle semantics tests: golden comparator case, max_hash truncation,
FracMinHash/bottom-k properties (mirrors reference test strategy §5)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jam_spark import oracle as O
from jam_spark.params import M64, SketchParams, max_hash_for_fscale


def _sk(hashes, name=""):
    return O.OracleSketch(name=name, hashes=sorted(hashes), num_kmers=len(set(hashes)))


def test_comparator_golden():
    """{1,2,3} vs {1,2,4} → (2, 3, 66.66666666666666)
    (reference src/compare.rs:396-431)."""
    a = _sk([1, 2, 3], "a")
    b = _sk([1, 2, 4], "b")
    c, nk, s = O.score_allpairs(a, b)
    assert (c, nk) == (2, 3)
    assert s == 66.66666666666666


def test_index_scoring_min_denominator():
    a = _sk([1, 2, 3, 5, 9], "a")
    b = _sk([1, 2, 4], "b")
    c, nk, s = O.score_index(a, b)
    assert (c, nk) == (2, 3)
    assert s == pytest.approx(66.66666666666666)


def test_max_hash_f64_truncation():
    # (u64::MAX as f64 / fscale as f64) as u64 — f64 path, then truncate.
    assert max_hash_for_fscale(None) == M64
    assert max_hash_for_fscale(0) == M64
    assert max_hash_for_fscale(1) == M64  # saturating cast
    for fs in (2, 3, 500, 1000, 12345):
        expect = min(int(float(M64) / float(fs)), M64)
        assert max_hash_for_fscale(fs) == expect
    # not integer division: fscale=3 differs from M64 // 3
    assert max_hash_for_fscale(3) != M64 // 3


def test_sketch_strict_threshold_and_bottomk():
    p = SketchParams(algo='xxh3', k=1, fscale=None, nmax=3)
    s = O.sketch_text("q w e r t y u", p)
    assert len(s.hashes) == 3  # bottom-3 smallest kept
    full = O.sketch_text("q w e r t y u", SketchParams(algo='xxh3', k=1, fscale=None, nmax=None))
    assert s.hashes == sorted(full.hashes)[:3]
    assert s.num_kmers == 3  # num_kmers = retained count (sketcher.rs:43-46)


def test_sketch_set_semantics():
    p = SketchParams(algo='xxh3', k=1, fscale=None, nmax=None)
    once = O.sketch_text("hello world", p)
    thrice = O.sketch_text("hello world hello world hello world", p)
    assert once.hashes == thrice.hashes


def test_empty_and_short_docs():
    p = SketchParams()
    assert O.sketch_text("", p).hashes == []
    assert O.sketch_text("one two three", p).hashes == []  # < k tokens


def test_scale_monotonicity():
    """fscale↑ ⇒ sketch ⊆ (FracMinHash is a prefix of the hash space)."""
    text = " ".join(f"tok{i}" for i in range(500))
    s4 = set(O.sketch_text(text, SketchParams(fscale=4, nmax=None)).hashes)
    s16 = set(O.sketch_text(text, SketchParams(fscale=16, nmax=None)).hashes)
    assert s16 <= s4
    assert len(s16) < len(s4)


def test_sketch_mergeability():
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) for FracMinHash
    (no nmax) — keep-below-threshold commutes with union
    (reference merge: src/signature.rs:106-113)."""
    p = SketchParams(fscale=4, nmax=None)
    ta = " ".join(f"al{i} be{i} ga{i} de{i} ep{i}" for i in range(100))
    tb = " ".join(f"ze{i} et{i} th{i} io{i} ka{i}" for i in range(100))
    sa = set(O.sketch_text(ta, p).hashes)
    sb = set(O.sketch_text(tb, p).hashes)
    sab = set(O.sketch_text(ta + " " + tb, p).hashes)
    # union text introduces k-1 straddling shingles at the seam; the pure
    # set-union must be a subset and any extras must be seam shingles
    assert sa | sb <= sab
    extra = sab - (sa | sb)
    assert len(extra) <= p.k - 1


def test_cutoff_strict():
    p = SketchParams(algo='xxh3', k=1, fscale=None, nmax=None, cutoff=50.0)
    a = O.sketch_text("a b", p)
    a.name = "a"
    b = O.sketch_text("a c", p)
    b.name = "b"
    # similarity exactly 50.0 -> excluded by strict >
    assert O.all_pairs([a, b], p) == []
    p2 = p.with_(cutoff=49.9)
    assert len(O.all_pairs([a, b], p2)) == 1


def test_union_find_cluster():
    names = ["u1", "u2", "u3", "u4", "u5"]
    pairs = [("u1", "u2", 1, 1, 99.0), ("u2", "u3", 1, 1, 99.0)]
    c = O.cluster(names, pairs)
    assert c["u1"] == c["u2"] == c["u3"] == "u1"
    assert c["u4"] == "u4" and c["u5"] == "u5"


@given(st.text(max_size=200))
@settings(max_examples=50, deadline=None)
def test_sketch_deterministic(text):
    p = SketchParams()
    assert O.sketch_text(text, p).hashes == O.sketch_text(text, p).hashes


def test_params_compat_enforced():
    p = SketchParams()
    with pytest.raises(ValueError, match="Unequal kmer sizes"):
        p.assert_compatible(p.with_(k=7))
    with pytest.raises(ValueError, match="Unequal fscale"):
        p.assert_compatible(p.with_(fscale=16))
