"""Parity pins for the vectorized gram kernel (functions/grams.py).

The vectorized path must be value-identical to the per-document Python
reference kernels (`dedup._wordgram_hashes` / `decontam._doc_ngrams`) —
these tests pin it on adversarial unicode and on full-codepoint scans so a
polars/CPython Unicode-table drift fails loudly."""

import re

import numpy as np
import polars as pl
import pytest

from dataprof_ray.functions.grams import (
    EXOTIC_LOWER,
    RUST_WS,
    lower_exact,
    per_doc_hit_counts,
    unique_per_doc,
    wordgram_hashes_flat,
)

ADVERSARIAL = [
    None, "", "   ", "a", "a b", "a  b\tc\nd", " lead trail ",
    "ΟΣ ΑΣ Σ ΣΣ İstanbul I ı İ",           # Final_Sigma + dotted I
    "Ᲊx y z w q r s t",                      # exotic-lowercase fallback row
    "a b c d e f g h i",
    "\x1cx\x1dy\x1ez\x1fw v u t s",          # info-separator whitespace
    "ÅΩ ß ẞ ﬁ ﬂ x y z",                       # sharp-s / ligatures
    "𝔘𝔫𝔦 𝕔𝕠𝕕𝕖 ⅷ Ⅷ ロンドン 東京 a b c",
    "word " * 20,                             # heavy duplicate positions
    "tok7 tok7 tok7 end a b c d e f g",
    chr(0x10D50) + "ABC def ghi jkl mno pqr stu vwx yza",
    " line sep nbsp　ideo x y z",
]


def _py_gram_hashes(text, n):
    from dataprof_ray.pipelines.dedup import _wordgram_hashes

    return _wordgram_hashes(text, n)


@pytest.mark.parametrize("n", [1, 2, 3, 8, 13])
def test_flat_parity_adversarial(n):
    hashes, counts = wordgram_hashes_flat(ADVERSARIAL, n)
    assert counts.dtype == np.int64 and hashes.dtype == np.uint64
    off = 0
    for i, t in enumerate(ADVERSARIAL):
        exp = _py_gram_hashes(t, n)
        got = hashes[off:off + counts[i]]
        assert np.array_equal(got, exp), (i, repr(t)[:60])
        off += counts[i]
    assert off == len(hashes)


def test_flat_parity_testdata_docs():
    import pyarrow.parquet as pq

    col = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"]).column("text")
    hashes, counts = wordgram_hashes_flat(col, 8)  # pyarrow input path
    texts = col.to_pylist()
    off = 0
    for i, t in enumerate(texts):
        exp = _py_gram_hashes(t, 8)
        assert np.array_equal(hashes[off:off + counts[i]], exp), i
        off += counts[i]
    assert off == len(hashes)


def test_decontam_gram_parity():
    """Flat hashes == decontam's _gram_hashes(_doc_ngrams(t, n)) per doc."""
    from dataprof_ray.pipelines.decontam import _doc_ngrams, _gram_hashes

    hashes, counts = wordgram_hashes_flat(ADVERSARIAL, 8)
    off = 0
    for i, t in enumerate(ADVERSARIAL):
        exp = _gram_hashes(_doc_ngrams(t, 8))
        assert np.array_equal(hashes[off:off + counts[i]], exp)
        off += counts[i]


def test_lowercase_parity_full_codepoint_scan():
    """polars to_lowercase == CPython str.lower() for EVERY codepoint except
    exactly the EXOTIC_LOWER set (then lower_exact covers those too)."""
    cps = [c for c in range(0x110000) if not (0xD800 <= c <= 0xDFFF)]
    chars = [chr(c) for c in cps]
    s = pl.Series("c", chars, dtype=pl.String)
    pl_low = s.str.to_lowercase().to_list()
    exotic = set(re.sub(r"[\[\]]", "", EXOTIC_LOWER))
    mismatch = [ch for ch, lo in zip(chars, pl_low) if lo != ch.lower()]
    assert set(mismatch) == exotic, (
        f"Unicode drift: {len(mismatch)} mismatches vs {len(exotic)} pinned")
    # and the fallback path closes the gap
    fixed = lower_exact(s).to_list()
    bad = [ch for ch, lo in zip(chars, fixed) if lo != ch.lower()]
    assert bad == []


def test_whitespace_class_parity():
    """RUST_WS (rust-regex, via polars) matches exactly CPython's \\s."""
    cps = [c for c in range(0x110000) if not (0xD800 <= c <= 0xDFFF)]
    chars = [chr(c) for c in cps]
    rust = pl.Series("c", chars).str.contains(RUST_WS).to_numpy()
    py = np.fromiter((re.match(r"\s", ch) is not None for ch in chars),
                     dtype=bool, count=len(chars))
    diff = np.nonzero(rust != py)[0]
    assert len(diff) == 0, [hex(cps[i]) for i in diff[:10]]


@pytest.mark.parametrize("k", [2, 5])
def test_char_shingle_minhash_parity(k):
    """Signatures from the vectorized char-shingle kernel == the per-doc
    _shingles (sorted-set) reference fold — duplicates are min-invariant."""
    import numpy as np
    import polars as pl

    from dataprof_ray.functions.grams import char_shingle_hashes_flat
    from dataprof_ray.pipelines.dedup import (_minhash_params, _shingles,
                                              minhash_signature,
                                              minhash_signature_matrix)

    a, b = _minhash_params(32)
    texts = [t for t in ADVERSARIAL]
    got = minhash_signature_matrix(texts, 32, k, a, b)
    for i, t in enumerate(texts):
        hs = (pl.Series(_shingles(t, k)).hash(seed=0)
              .to_numpy().astype(np.uint64))
        assert np.array_equal(got[i], minhash_signature(hs, a, b)), (i, t)
    # flat layout itself: every position of the normalized doc, in order
    flat, counts = char_shingle_hashes_flat(texts, k)
    assert len(flat) == counts.sum() and (counts >= 1).all()


def test_unique_per_doc_matches_np_unique():
    texts = ["word " * 30, "a b c a b c a b", "", "x y", None, "q " * 5]
    hashes, counts = wordgram_hashes_flat(texts, 2)
    uh, ud = unique_per_doc(hashes, counts)
    off = 0
    exp_h, exp_d = [], []
    for i, c in enumerate(counts):
        u = np.unique(hashes[off:off + c])
        exp_h.append(u)
        exp_d.append(np.full(len(u), i, dtype=np.int64))
        off += c
    assert np.array_equal(uh, np.concatenate(exp_h))
    assert np.array_equal(ud, np.concatenate(exp_d))


def test_per_doc_hit_counts():
    counts = np.array([3, 0, 2], dtype=np.int64)
    match = np.array([1, 0, 1, 1, 0], dtype=bool)
    assert per_doc_hit_counts(match, counts).tolist() == [2, 0, 1]
    assert per_doc_hit_counts(np.empty(0, bool), counts).tolist() == [0, 0, 0]
