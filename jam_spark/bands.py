"""LSH banding over FracMinHash/bottom-k sketches.

The reference's scalable path is an inverted index ``hash → sketch-ids``
probed per query hash (``src/file_io.rs:227-232``,
``src/compare.rs:344-352``). At 10^12 docs the raw-hash postings join is
replaced by banding: a fixed-length minhash signature is DERIVED from
the retained sketch hashes by seeded rehash — honoring the reference's
one-hash-pass-per-SHINGLE design (``src/sketcher.rs:96-104``; SURVEY
§2.3.6) — then grouped into ``bands`` bands of ``rows`` rows; docs
sharing any (band_id, band_hash) become candidate pairs.

    sig[p]        = min over sketch h of fmix64(h ^ seed[p])
    band_hash[b]  = fmix64(poly-combine(sig[b*rows .. b*rows+rows)) ^ seed'[b])

Empty sketches produce no bands (no candidates — matches the reference,
where a sketch with no hashes can never reach the postings join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._malloc import tune_malloc
from .hashes import M64, _np_fmix64, xxh3_u64
from .params import SHINGLE_POLY_BASE, SketchParams

tune_malloc()

_U64 = np.uint64


def _perm_seeds(params: SketchParams) -> np.ndarray:
    return np.array(
        [xxh3_u64((params.sig_seed + p) & M64) for p in range(params.num_perm)],
        dtype=_U64,
    )


def _band_seeds(params: SketchParams) -> np.ndarray:
    return np.array(
        [
            xxh3_u64((params.sig_seed * 31 + 0xB0BA + b) & M64)
            for b in range(params.bands)
        ],
        dtype=_U64,
    )


def signature_batch(
    flat_hashes: np.ndarray, offsets: np.ndarray, params: SketchParams
) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures; rows for empty
    sketches are all-ones (u64::MAX) sentinels.

    One-permutation hashing (Li, Owen, Zhang 2012) with rotation
    densification (Shrivastava & Li 2014): each retained hash is remixed
    ONCE, assigned to one of ``num_perm`` buckets by its low bits, and
    each bucket keeps its min; empty buckets borrow cyclically from the
    next filled bucket. One pass over the hashes instead of num_perm
    passes — the classic per-perm rehash was the pipeline's dominant
    memory-bandwidth consumer. Slot-collision probability remains ≈ the
    sketch Jaccard, which is all LSH banding needs (recall vs the oracle
    is enforced in tests).

    This also honors the reference's one-hash-pass design
    (/root/reference/src/sketcher.rs:96-104): signatures derive from
    retained hashes, never from per-shingle permutations.
    """
    n_docs = len(offsets) - 1
    P = params.num_perm
    sig = np.full((n_docs, P), _U64(M64), dtype=_U64)
    if len(flat_hashes) == 0:
        return sig
    seed0 = _U64(xxh3_u64(params.sig_seed & M64))
    v = _np_fmix64(flat_hashes ^ seed0)
    bucket = (
        (v & _U64(P - 1)) if (P & (P - 1)) == 0 else (v % _U64(P))
    ).astype(np.int64)
    doc = (
        np.searchsorted(
            offsets, np.arange(len(flat_hashes), dtype=np.int64), side="right"
        )
        - 1
    )
    # segment-min over (doc, bucket): sort by combined key, reduceat
    key = doc * P + bucket
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    v_s = v[order]
    first = np.ones(len(key_s), dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    starts = np.where(first)[0]
    mins = np.minimum.reduceat(v_s, starts)
    uk = key_s[starts]
    sig[uk // P, uk % P] = mins

    # rotation densification: empty slots take fmix(next filled value + j)
    filled = sig != _U64(M64)
    any_filled = filled.any(axis=1)
    if not any_filled.all():
        pass  # fully-empty docs stay all-sentinel (no bands)
    rows = np.where(any_filled & ~filled.all(axis=1))[0]
    if len(rows):
        f2 = np.concatenate([filled[rows], filled[rows]], axis=1)
        s2 = np.concatenate([sig[rows], sig[rows]], axis=1)
        # for each position j (in the second copy), index of the nearest
        # filled position >= j scanning right-to-left
        idx = np.where(f2, np.arange(2 * P)[None, :], 2 * P + 1)
        nxt = np.minimum.accumulate(idx[:, ::-1], axis=1)[:, ::-1]
        take = nxt[:, :P]
        r = np.arange(len(rows))[:, None]
        borrowed = _np_fmix64(
            s2[r, take] + np.arange(P, dtype=_U64)[None, :]
        )
        sig[rows] = np.where(filled[rows], sig[rows], borrowed)
    return sig


def band_hash_batch(sig: np.ndarray, params: SketchParams) -> np.ndarray:
    """(n_docs, bands) uint64 band keys from signatures."""
    n_docs = sig.shape[0]
    r = params.rows
    bseeds = _band_seeds(params)
    grouped = sig.reshape(n_docs, params.bands, r)
    acc = np.zeros((n_docs, params.bands), dtype=_U64)
    base = _U64(SHINGLE_POLY_BASE)
    for j in range(r):
        acc = acc * base + grouped[:, :, j]
    return _np_fmix64(acc ^ bseeds[None, :])


def band_arrays(sketches: list[np.ndarray], params: SketchParams) -> list[np.ndarray]:
    """Per-doc band-key arrays (len == params.bands; empty for empty
    sketches)."""
    offsets = np.zeros(len(sketches) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sketches], out=offsets[1:])
    flat = (
        np.concatenate(sketches).astype(_U64)
        if sketches and offsets[-1]
        else np.empty(0, dtype=_U64)
    )
    sig = signature_batch(flat, offsets, params)
    bh = band_hash_batch(sig, params)
    out = []
    for d in range(len(sketches)):
        out.append(bh[d] if len(sketches[d]) else np.empty(0, dtype=_U64))
    return out


# Why banding stays an Arrow UDF (and is not a JVM column expression
# like the sketch): the OPH/fmix64 math is wrapping unsigned 64-bit
# arithmetic. Spark 4 runs with ANSI SQL enabled by default, where long
# overflow THROWS — expressing fmix64's two wrapping multiplies would
# require either flipping spark.sql.ansi.enabled globally (a semantic
# change for every other query) or decomposing each multiply into
# sub-31-bit pieces (≥16 multiplies each). Measured, the vectorized
# numpy path is not the pipeline bottleneck (the band stage is ~15s of a
# 73s 16-core 1M-doc run, most of it the 57M-row explode+persist, not
# the UDF), so the Arrow path stays.
def make_band_udf(params: SketchParams):
    """pandas UDF: sketch array<long> → array<long> of band keys
    (index in the array IS band_id; empty for empty sketches)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    def _bands(sketches: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(s, dtype=np.int64).view(_U64)
            if s is not None and len(s)
            else np.empty(0, dtype=_U64)
            for s in sketches
        ]
        out = band_arrays(arrs, params)
        return pd.Series([b.view(np.int64) for b in out])

    return F.pandas_udf(_bands, T.ArrayType(T.LongType()))
