"""Mojibake detection and repair (UTF-8 bytes mis-decoded as cp1252).

The classic web-crawl defect: a page's UTF-8 bytes were decoded with
cp1252/latin-1 somewhere upstream, so 'é' (C3 A9) shows as 'Ã©' and
'’' (E2 80 99) as 'â€™'; double mis-decoding stacks the damage. The
reference profiler flags encoding issues but never repairs
(dataprof's quality dimension, see ``functions/quality.py`` parity);
repair is a curation-pipeline need, so it lives in the extension
surface (SURVEY.md §2.6b).

Design: detection is a vectorized Arrow substring scan for the marker
prefixes that UTF-8-as-cp1252 text contains ('Ã', 'Â', 'â€' — every
2-/3-byte UTF-8 sequence mis-decoded this way starts with one of
them); only flagged rows (a small fraction of a real crawl) pay the
per-string Python round-trip repair. Repair is the standard ftfy-style
fixed point: re-encode with cp1252 (latin-1 fallback for the five
cp1252 holes), re-decode as UTF-8, repeat while it keeps succeeding —
a string that was never mis-decoded fails the UTF-8 re-decode on the
first pass and comes back unchanged, so the repair never rewrites
legitimate text containing an isolated 'Ã'.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Every UTF-8 lead byte in C2-C3 (Latin-1 range), C4-DF (2-byte), or
# E0-EF (3-byte, whose cp1252 rendering starts with 'à'..'ï' followed
# by continuation bytes in the 80-BF range rendered as 'â€¦'-style
# runs) mis-decoded as cp1252 yields one of these visible prefixes in
# practice for real text; 'Ã'/'Â' cover the Latin-1 plane and 'â€' the
# common punctuation plane. Kept deliberately narrow and documented so
# the SQL oracle can reproduce the predicate with LIKE.
MARKERS = ("Ã", "Â", "â€")


def detect_mojibake(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized per-row flag: does the string contain any marker?
    Nulls flag as False (nothing to repair)."""
    flag = None
    for m in MARKERS:
        hit = pc.match_substring(col, m)
        flag = hit if flag is None else pc.or_(flag, hit)
    return pc.fill_null(flag, False)


def fix_text(s: str, max_passes: int = 3) -> str:
    """Repair one string to its mojibake fixed point (<= ``max_passes``
    rounds undoes up-to-triple mis-decoding). Returns the input
    unchanged when no marker is present or the round-trip fails."""
    for _ in range(max_passes):
        if not any(m in s for m in MARKERS):
            break
        try:
            raw = s.encode("cp1252")
        except UnicodeEncodeError:
            try:
                raw = s.encode("latin-1")
            except UnicodeEncodeError:
                break  # genuinely non-Western text; not our defect
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            break  # markers occur naturally; bytes are not valid UTF-8
        if fixed == s:
            break
        s = fixed
    return s


def repair_stage(batch: pa.Table, text_col: str = "text",
                 flag_col: str = "mojibake_fixed") -> pa.Table:
    """map_batches kernel: repair ``text_col`` in place and append a
    boolean ``flag_col`` (True where the text actually changed). The
    Python round-trip runs only on marker-flagged rows."""
    col = batch.column(text_col)
    flagged = detect_mojibake(col)
    mask = flagged.to_numpy(zero_copy_only=False)
    changed = np.zeros(len(batch), dtype=bool)
    if mask.any():
        idx = np.nonzero(mask)[0]
        texts = col.take(pa.array(idx, pa.int64())).to_pylist()
        fixed = [fix_text(t) for t in texts]
        changed[idx] = [f != t for f, t in zip(fixed, texts)]
        if changed.any():
            # scatter only the repaired rows; unchanged rows stay in the
            # original Arrow buffer (if_else picks them, nulls ignored)
            sparse = np.full(len(batch), None, dtype=object)
            sparse[idx] = fixed
            col = pc.if_else(pa.array(changed),
                             pa.array(sparse.tolist(), pa.string()),
                             col.combine_chunks() if isinstance(
                                 col, pa.ChunkedArray) else col)
    batch = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, col)
    return batch.append_column(flag_col, pa.array(changed))


def repair_mojibake(ds, text_col: str = "text",
                    flag_col: str = "mojibake_fixed"):
    """Streaming repair over a corpus Dataset: stateless map, no
    shuffle; cost is O(flagged rows) Python with a vectorized scan over
    the rest, so a clean crawl pays only the Arrow substring match."""
    return ds.map_batches(
        lambda b: repair_stage(b, text_col=text_col, flag_col=flag_col),
        batch_format="pyarrow")
