"""Frozen sketch/pipeline configuration — the analogue of jam-rs's
``Signature`` metadata envelope (``/root/reference/src/signature.rs:6-13``).

jam-rs *enforces* config compatibility instead of assuming it: kmer-size
equality (``src/compare.rs:106-112``, ``267-277``), fscale uniformity
(``src/compare.rs:279-286``), max_hash equality on import
(``src/signature.rs:41-47``). ``SketchParams.assert_compatible`` mirrors
that contract; every pipeline stage revalidates the params it reads from
a stage-output table's properties before using its data.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, replace

M64 = (1 << 64) - 1

#: polynomial base for packing a k-token shingle into a u64 before the
#: single per-shingle hash pass — the text analogue of the reference's
#: 2-bit k-mer packing (``src/sketcher.rs:94-98``). Odd ⇒ invertible
#: mod 2^64, so sliding windows can be computed by prefix products.
SHINGLE_POLY_BASE = 0x9E3779B185EBCA87  # PRIME64_1

#: "xxh64" is the JVM-native mode: shingle strings hashed with Spark's
#: built-in ``xxhash64`` (XXH64 seed 42) entirely inside whole-stage
#: codegen — no Python in the sketch hot path. It requires fscale >= 2 so
#: every retained hash fits in a non-negative signed long (JVM sort order
#: == unsigned order). The other algos run the vectorized Arrow-UDF path.
ALGOS = ("xxh3", "ahash", "murmur3", "xxh64")


def max_hash_for_fscale(fscale: int | None) -> int:
    """``max_hash = (u64::MAX as f64 / fscale as f64) as u64``.

    Reproduces the reference's f64-division-then-truncate exactly,
    including Rust's saturating ``as u64`` cast
    (``/root/reference/src/file_io.rs:137-141``). ``fscale in (None, 0, 1)``
    ⇒ keep-all (max_hash = u64::MAX, filter ``h < max_hash`` only drops
    h == u64::MAX, same as the reference with fscale=1).
    """
    if not fscale:
        return M64
    v = float(M64) / float(fscale)
    return min(int(v), M64)


@dataclass(frozen=True)
class SketchParams:
    """Pipeline configuration. Defaults are tuned for word-shingled web
    text so that banding recall >= 0.99 at the cutoff (see tests).

    k:       shingle width in *word tokens* (reference default 21 is DNA
             chars, ``src/cli.rs:58``; word tokens carry ~5 chars each).
    fscale:  FracMinHash scale; keep hash iff ``hash < max_hash`` strictly
             (``src/sketcher.rs:28``). None/0 ⇒ keep all.
    nmax:    bottom-k cap — at most nmax *smallest* hashes kept
             (``src/sketcher.rs:30-33``). None ⇒ unlimited.
    algo:    per-shingle hash. Default 'xxh64' = the JVM-native mode
             (shingle bytes hashed once with Spark's built-in xxhash64 —
             the reference's Large-path shape, src/sketcher.rs:99-105,
             fully inside whole-stage codegen). 'xxh3'/'ahash'/'murmur3'
             run the vectorized Arrow-UDF packed-u64 path (dispatch
             mirrors src/hash_functions.rs:61-76).
    num_perm/bands/rows: LSH signature layout (num_perm = bands*rows),
             derived by seeded rehash of the retained sketch hashes —
             NOT per-shingle permutations, honoring the reference's
             one-hash-pass-per-shingle design (``src/sketcher.rs:96-104``).
    cutoff:  similarity threshold, PERCENT scale, strict ``>``
             (``src/compare.rs:132``, ``375-380``).
    scorer:  'index'    ⇒ num_kmers = min(|A|,|B|)  (``src/compare.rs:358-364``)
             'allpairs' ⇒ num_kmers = max(|A|,|B|)  (``src/compare.rs:171,205-217``)
    band_cap: deterministic per-(band,hash) postings cap to break
             hot-band skew (north_rule); 0 ⇒ uncapped.
    """

    k: int = 5
    fscale: int | None = 8
    nmax: int | None = 256
    algo: str = "xxh64"
    num_perm: int = 128
    bands: int = 64
    rows: int = 2
    cutoff: float = 50.0
    scorer: str = "index"
    band_cap: int = 256
    sig_seed: int = 0x5EED_1DEA

    def __post_init__(self) -> None:
        if self.algo not in ALGOS:
            raise ValueError(f"unknown algo {self.algo!r}; expected {ALGOS}")
        if self.bands * self.rows != self.num_perm:
            raise ValueError(
                f"bands*rows ({self.bands}x{self.rows}) != num_perm ({self.num_perm})"
            )
        if self.scorer not in ("index", "allpairs"):
            raise ValueError(f"unknown scorer {self.scorer!r}")
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.algo == "xxh64" and (self.fscale or 0) < 2:
            raise ValueError(
                "algo='xxh64' (JVM-native mode) requires fscale >= 2 so "
                "retained hashes stay below 2^63 (signed order == unsigned)"
            )

    @property
    def max_hash(self) -> int:
        return max_hash_for_fscale(self.fscale)

    # -- config-compatibility contract (src/compare.rs:106-112, 267-288) --
    def assert_compatible(self, other: "SketchParams") -> None:
        if self.k != other.k:
            raise ValueError(
                f"Unequal kmer sizes {self.k} and {other.k} in sketches"
            )
        if (self.fscale or 0) != (other.fscale or 0):
            raise ValueError(
                f"Unequal fscale {self.fscale} and {other.fscale} in sketches"
            )
        if (self.nmax or 0) != (other.nmax or 0) or self.algo != other.algo:
            raise ValueError("sketch configs are incompatible (nmax/algo)")

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SketchParams":
        return cls(**json.loads(s))

    def with_(self, **kw) -> "SketchParams":
        return replace(self, **kw)
