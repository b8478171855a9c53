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
    sketches are all-ones (u64::MAX) sentinels."""
    n_docs = len(offsets) - 1
    seeds = _perm_seeds(params)
    sig = np.full((n_docs, params.num_perm), _U64(M64), dtype=_U64)
    if len(flat_hashes) == 0:
        return sig
    nonempty = np.where(offsets[1:] > offsets[:-1])[0]
    if not len(nonempty):
        return sig
    starts = offsets[nonempty]
    # one perm at a time: keeps the working set at |hashes| u64s instead
    # of |hashes| x num_perm (memory-bandwidth bound otherwise)
    for p in range(params.num_perm):
        mixed = _np_fmix64(flat_hashes ^ seeds[p])
        sig[nonempty, p] = np.minimum.reduceat(mixed, starts)
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
