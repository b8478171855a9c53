"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Shape is exactly ``BASELINE.json.input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
Generated with a fixed seed (42) and no wall-clock, so the per-row
invariant — byte-identical ``text`` per ``url`` across runs — holds by
construction and is asserted in tests.

Duplicate structure (FIXTURES.md §1):
- ~60% unique documents (cluster size 1)
- ~25% exact duplicates in clusters of 2-5
- ~10% near duplicates (1-8% token perturbation) — above cutoff
- ~5% decoys (30-70% vocab overlap rewrites)  — below cutoff
- edge rows: empty text, text shorter than k tokens, one giant
  hot-template cluster (100+ urls sharing nav boilerplate) to exercise
  band salting / the postings cap.

Ground truth ``(url, expected_cluster_id)`` is emitted by the same
generator; near-dup membership is ground truth for *generation*, while
recall tests compare the Spark pipeline against the pure-Python oracle
at identical params (the authoritative criterion in BASELINE.json).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

_EPOCH = datetime(2025, 3, 14, 0, 0, 0, tzinfo=timezone.utc)

_VOCAB_SIZE = 1000


def _vocab(rng: random.Random) -> list[str]:
    # ~1000 deterministic pseudo-words, 3-12 chars
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = set()
    while len(words) < _VOCAB_SIZE:
        n = rng.randint(3, 12)
        words.add("".join(rng.choice(letters) for _ in range(n)))
    return sorted(words)


@dataclass
class Page:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str
    cluster_id: str  # ground-truth cluster (url of the canonical member)


_LANGS = ["en", "de", "fr", "es"]


def _mk_page(i: int, text: str, cluster_id: str) -> Page:
    url = f"https://site{i % 97}.example/p/{i}"
    return Page(
        url=url,
        warc_ts=_EPOCH + timedelta(seconds=i),
        html=b"<html><body>" + text.encode("utf-8") + b"</body></html>",
        text=text,
        lang=_LANGS[i % len(_LANGS)],
        cluster_id=cluster_id or url,
    )


def _perturb(rng: random.Random, tokens: list[str], vocab: list[str], rate: float) -> list[str]:
    out = list(tokens)
    n_edit = max(1, int(len(out) * rate))
    for _ in range(n_edit):
        op = rng.random()
        pos = rng.randrange(len(out))
        if op < 0.5:
            out[pos] = rng.choice(vocab)  # substitute
        elif op < 0.75 and len(out) > 2:
            del out[pos]  # delete
        else:
            out.insert(pos, rng.choice(vocab))  # insert
    return out


def generate_pages(n_docs: int = 5000, seed: int = 42) -> list[Page]:
    rng = random.Random(seed)
    vocab = _vocab(rng)
    pages: list[Page] = []
    i = 0

    def fresh_text(lo: int = 50, hi: int = 2000) -> list[str]:
        return [rng.choice(vocab) for _ in range(rng.randint(lo, hi))]

    # edge rows first (deterministic positions)
    pages.append(_mk_page(i, "", ""))
    i += 1
    pages.append(_mk_page(i, "tiny doc", ""))  # < k tokens
    i += 1

    # giant hot-template cluster: shared nav boilerplate + tiny unique tail.
    # These pages are near-identical (one template) — a worst-case hot band.
    template = fresh_text(300, 300)
    n_template = max(100, n_docs // 40)
    tmpl_canon = None
    for _ in range(n_template):
        tail = [rng.choice(vocab) for _ in range(3)]
        p = _mk_page(i, " ".join(template + tail), tmpl_canon or "")
        tmpl_canon = tmpl_canon or p.url
        p.cluster_id = tmpl_canon
        pages.append(p)
        i += 1

    while i < n_docs + 2 + n_template:
        r = rng.random()
        if r < 0.60:  # unique
            pages.append(_mk_page(i, " ".join(fresh_text()), ""))
            i += 1
        elif r < 0.85:  # exact-dup cluster of 2-5
            text = " ".join(fresh_text())
            canon = None
            for _ in range(rng.randint(2, 5)):
                p = _mk_page(i, text, canon or "")
                canon = canon or p.url
                p.cluster_id = canon
                pages.append(p)
                i += 1
        elif r < 0.95:  # near-dup cluster of 2-4, 1-8% perturbation
            base = fresh_text(200, 1200)
            canon = None
            for j in range(rng.randint(2, 4)):
                toks = base if j == 0 else _perturb(
                    rng, base, vocab, rng.uniform(0.01, 0.08)
                )
                p = _mk_page(i, " ".join(toks), canon or "")
                canon = canon or p.url
                p.cluster_id = canon
                pages.append(p)
                i += 1
        else:  # decoy pair: 30-70% vocab overlap, must stay unclustered
            base = fresh_text(200, 800)
            keep = rng.uniform(0.30, 0.70)
            shuffled = [
                t if rng.random() < keep else rng.choice(vocab) for t in base
            ]
            rng.shuffle(shuffled)
            pages.append(_mk_page(i, " ".join(base), ""))
            i += 1
            pages.append(_mk_page(i, " ".join(shuffled), ""))
            i += 1

    return pages


def fast_corpus_pandas(n_docs: int, seed: int = 42, dup_rate: float = 0.3):
    """Vectorized (numpy) corpus generator for BENCHMARKS: same pages
    shape and a planted exact+near duplicate structure, but generated
    ~100x faster than :func:`generate_pages` (which stays the
    ground-truth-bearing generator for correctness tests).

    ``dup_rate`` of docs are near-duplicates of an earlier doc (a few
    words substituted); an additional 10% are exact duplicates.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab(random.Random(seed)))
    lens = rng.randint(50, 1200, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.rand()
        if i > 10 and r < dup_rate:  # near-dup of a recent doc
            base = texts[i - rng.randint(1, 10)]
            words = base.split()
            n_edit = max(1, len(words) // 30)
            idx = rng.randint(0, len(words), size=n_edit)
            for j, w in zip(idx, vocab[rng.randint(0, len(vocab), size=n_edit)]):
                words[j] = w
            texts.append(" ".join(words))
        elif i > 10 and r < dup_rate + 0.1:  # exact dup
            texts.append(texts[i - rng.randint(1, 10)])
        else:
            words = vocab[rng.randint(0, len(vocab), size=lens[i])]
            texts.append(" ".join(words))
    return pd.DataFrame(
        {
            "url": [f"https://site{i % 97}.example/p/{i}" for i in range(n_docs)],
            "text": texts,
            "lang": [_LANGS[i % len(_LANGS)] for i in range(n_docs)],
        }
    )


def pages_to_pandas(pages: list[Page]):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [p.url for p in pages],
            "warc_ts": [p.warc_ts for p in pages],
            "html": [p.html for p in pages],
            "text": [p.text for p in pages],
            "lang": [p.lang for p in pages],
        }
    )


def truth_to_pandas(pages: list[Page]):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [p.url for p in pages],
            "expected_cluster_id": [p.cluster_id for p in pages],
        }
    )
