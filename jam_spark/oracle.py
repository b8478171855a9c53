"""Pure-Python oracle: a literal re-statement of jam-rs's sketch/compare
semantics (no Spark, no numpy vectorization tricks). The Spark pipeline
is diffed against this in tests — it plays the role sourmash plays in
the reference's own E2E test (``/root/reference/tests/sketching.rs:16-60``).

Semantics mirrored line-by-line (SURVEY.md §2.3):
- strict ``hash < max_hash`` FracMinHash filter (``src/sketcher.rs:28``)
- f64-truncated ``max_hash``             (``src/file_io.rs:137-141``)
- set semantics then bottom-``nmax`` smallest (``src/sketcher.rs:25-35``)
- ``num_kmers`` = retained-hash count at build (``src/sketcher.rs:43-46``)
- index-path score: ``|A∩B| / min(|A|,|B|) × 100`` (``src/compare.rs:358-364``)
- all-pairs score: ``|A∩B| / max(|A|,|B|) × fraction × 100`` with
  fraction = 1.0 for fresh sketches (``src/compare.rs:171,205-227``)
- cutoff strict ``>`` on percent scale   (``src/compare.rs:132,375-380``)
"""

from __future__ import annotations

from dataclasses import dataclass

from .hashes import M64, ahash_u64, murmur3_u64, xxh3_64, xxh3_u64, xxh64
from .normalize import tokenize_bytes
from .params import SHINGLE_POLY_BASE, SketchParams

_ALGO_FN = {"xxh3": xxh3_u64, "ahash": ahash_u64, "murmur3": murmur3_u64}


@dataclass
class OracleSketch:
    """Mirror of ``Sketch`` (``src/sketch.rs:6-12``): sorted (unsigned)
    retained hashes + num_kmers (= retained count for fresh sketches)."""

    name: str
    hashes: list[int]  # sorted ascending, unsigned u64 values
    num_kmers: int


def shingle_values(tokens: list[bytes], k: int) -> list[int]:
    """Pack each k-token window into a u64: polynomial combination of
    per-token xxh3_64 base hashes mod 2^64 — the text analogue of the
    reference's 2-bit k-mer packing (``src/sketcher.rs:94-98``)."""
    if len(tokens) < k:
        return []
    th = [xxh3_64(t) for t in tokens]
    out = []
    for i in range(len(th) - k + 1):
        v = 0
        for j in range(k):
            v = (v * SHINGLE_POLY_BASE + th[i + j]) & M64
        out.append(v)
    return out


def sketch_text(text: str, params: SketchParams, name: str = "") -> OracleSketch:
    """tokenize → shingle-pack → ONE hash pass per shingle → FracMinHash
    filter → set semantics → bottom-nmax. Mirrors ``SketchHelper::push``
    (``src/sketcher.rs:25-35``) and finalize (``:43-49``).

    algo='xxh64' mirrors the JVM-native mode instead: the k-token window
    joined by single spaces is the shingle STRING, hashed once with
    XXH64 seed 42 (= Spark's ``xxhash64``). Like the reference's Large
    path, the shingle bytes are hashed directly (``src/sketcher.rs:99-105``).
    """
    max_hash = params.max_hash
    kept: set[int] = set()
    if params.algo == "xxh64":
        # JVM mode tokenization: lower + Unicode-whitespace split, NO NFC
        # (Spark has no NFC builtin; the divergence from the frozen
        # xxh3-path spec is deliberate and documented in normalize.py).
        # str.split()'s whitespace class == the Spark-side regex
        # [\p{IsWhite_Space}\x1c-\x1f], verified by the non-ASCII parity
        # test in tests/test_jvm_mode.py.
        # Shingle hash = seed-chained XXH64 over the k tokens, exactly
        # Spark's multi-arg xxhash64(tok_i..tok_{i+k-1}).
        toks = [t.encode("utf-8") for t in text.lower().split()]
        for i in range(max(0, len(toks) - params.k + 1)):
            h = 42
            for j in range(params.k):
                h = xxh64(toks[i + j], h)
            if h < max_hash:  # strict <, src/sketcher.rs:28
                kept.add(h)
        hashes = sorted(kept)
        if params.nmax is not None and len(hashes) > params.nmax:
            hashes = hashes[: params.nmax]
        return OracleSketch(name=name, hashes=hashes, num_kmers=len(hashes))
    hash_fn = _ALGO_FN[params.algo]
    for v in shingle_values(tokenize_bytes(text), params.k):
        h = hash_fn(v)
        if h < max_hash:  # strict <, src/sketcher.rs:28
            kept.add(h)
    hashes = sorted(kept)
    if params.nmax is not None and len(hashes) > params.nmax:
        hashes = hashes[: params.nmax]  # keep smallest, src/sketcher.rs:30-33
    return OracleSketch(name=name, hashes=hashes, num_kmers=len(hashes))


def num_common(a: list[int], b: list[int]) -> int:
    """Sorted-merge intersection count (``src/compare.rs:170-203``)."""
    i = j = c = 0
    while i < len(a) and j < len(b):
        if a[i] == b[j]:
            c += 1
            i += 1
            j += 1
        elif a[i] < b[j]:
            i += 1
        else:
            j += 1
    return c


def score_index(a: OracleSketch, b: OracleSketch) -> tuple[int, int, float]:
    """LMDB/index-path scoring: num_kmers = min (``src/compare.rs:358-364``)."""
    c = num_common(a.hashes, b.hashes)
    nk = min(a.num_kmers, b.num_kmers)
    return c, nk, (c / nk * 100.0) if nk else 0.0


def score_allpairs(a: OracleSketch, b: OracleSketch) -> tuple[int, int, float]:
    """All-pairs scoring: num_kmers = max(|A|,|B|), coverage fraction
    (=1.0 for fresh sketches where num_kmers == |hashes|)
    (``src/compare.rs:171,205-227``).
    Golden: {1,2,3} vs {1,2,4} → (2, 3, 66.66666666666666)."""
    c = num_common(a.hashes, b.hashes)
    nk = max(a.num_kmers, b.num_kmers)
    if nk == 0:
        return 0, 0, 0.0
    frac_a = a.num_kmers / len(a.hashes) if a.hashes else 1.0
    frac_b = b.num_kmers / len(b.hashes) if b.hashes else 1.0
    # ratio of coverage fractions, >= 1 (src/compare.rs:206-215); 1.0 for
    # fresh sketches where num_kmers == |hashes|
    fraction = (
        frac_b / frac_a if frac_a < frac_b else frac_a / frac_b
    ) if frac_a and frac_b else 1.0
    return c, nk, c / nk * fraction * 100.0


def all_pairs(
    sketches: list[OracleSketch], params: SketchParams
) -> list[tuple[str, str, int, int, float]]:
    """Exhaustive O(n²) pairs above cutoff (strict >) — ground truth for
    LSH recall measurement. Pair order canonical: name_a < name_b."""
    scorer = score_index if params.scorer == "index" else score_allpairs
    out = []
    for i in range(len(sketches)):
        for j in range(i + 1, len(sketches)):
            a, b = sketches[i], sketches[j]
            if a.name > b.name:
                a, b = b, a
            c, nk, s = scorer(a, b)
            if c > 0 and s > params.cutoff:  # strict >, src/compare.rs:132
                out.append((a.name, b.name, c, nk, s))
    return out


class UnionFind:
    """Cluster closure over duplicate pairs (not present in the reference,
    which stops at scored pairs — required by north_rule)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent.setdefault(x, x)
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def cluster(
    names: list[str], pairs: list[tuple[str, str, int, int, float]]
) -> dict[str, str]:
    """name → cluster_id (= lexicographically smallest member name)."""
    uf = UnionFind()
    for n in names:
        uf.find(n)
    for a, b, *_ in pairs:
        uf.union(a, b)
    return {n: uf.find(n) for n in names}
