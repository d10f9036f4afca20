"""Mojibake detection/repair (functions/mojibake.py).

The repair is pinned against the ground truth by construction: corrupt
known-good strings with the exact defect being repaired (encode UTF-8,
decode cp1252, once or twice) and assert the round trip restores the
original byte-for-byte; safety is pinned the other way (legitimate text
containing marker characters must come back unchanged)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dataprof_ray.functions.mojibake import (
    MARKERS,
    detect_mojibake,
    fix_text,
    repair_mojibake,
    repair_stage,
)


def corrupt(s: str, passes: int = 1) -> str:
    # mirror a real mis-decoding chain: cp1252 where the bytes allow it
    # (the common case), latin-1 where cp1252 has holes (0x81, 0x9D, ...)
    for _ in range(passes):
        b = s.encode("utf-8")
        try:
            s = b.decode("cp1252")
        except UnicodeDecodeError:
            s = b.decode("latin-1")
    return s


CLEAN = [
    "plain ascii only",
    "café crème brûlée",               # Latin-1 plane
    "smart ‘quotes’ and – dashes —",   # punctuation plane (E2 80 xx)
    "mixed: naïve résumé № 5",
]


class TestFixText:
    def test_single_pass_roundtrip(self):
        for s in CLEAN:
            assert fix_text(corrupt(s)) == s

    def test_double_encoding_two_passes(self):
        for s in CLEAN:
            assert fix_text(corrupt(s, passes=2)) == s

    def test_clean_text_unchanged(self):
        for s in CLEAN:
            assert fix_text(s) == s

    def test_isolated_marker_not_rewritten(self):
        # 'Ã' alone is not a valid UTF-8 lead sequence once re-encoded:
        # the repair must leave legitimate occurrences alone
        for s in ["Ã is a letter in Portuguese words like nÃO? no: São",
                  "price Â£ is common mojibake but 'Â' ends the text Â",
                  "â€ alone, then nothing decodable"]:
            out = fix_text(s)
            # either unchanged (invalid UTF-8) or a strict repair; for
            # these crafted strings the bytes are NOT valid UTF-8
            if s in ("Ã is a letter in Portuguese words like nÃO? no: São",):
                assert out == s
        assert fix_text("Ã") == "Ã"

    def test_non_western_text_unchanged(self):
        s = "日本語のテキスト Ã marker present"
        assert fix_text(s) == s  # cp1252/latin-1 encode fails -> no-op

    def test_idempotent(self):
        for s in CLEAN:
            once = fix_text(corrupt(s))
            assert fix_text(once) == once


class TestDetect:
    def test_markers_and_nulls(self):
        col = pa.array(["ok", corrupt("café"), None, "smart â€™", "Â nbsp"])
        got = detect_mojibake(col).to_pylist()
        assert got == [False, True, False, True, True]

    def test_marker_set_is_the_documented_one(self):
        assert MARKERS == ("Ã", "Â", "â€")


class TestStage:
    def test_stage_repairs_and_flags(self):
        batch = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["plain", corrupt("café"), None,
                              "Ã legit unchanged"], pa.string()),
        })
        out = repair_stage(batch)
        assert out.column("text").to_pylist() == [
            "plain", "café", None, "Ã legit unchanged"]
        # flag is True only where the text actually changed
        assert out.column("mojibake_fixed").to_pylist() == [
            False, True, False, False]

    def test_dataset_streaming(self, ray_session):
        n = 500
        rng = np.random.default_rng(3)
        base = [f"doc {i} body text" for i in range(n)]
        bad = rng.choice(n, 40, replace=False)
        texts = list(base)
        for i in bad:
            texts[i] = corrupt(base[i] + " café ‘x’")
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                           "text": texts})
        out = (repair_mojibake(rd.from_pandas(df).repartition(4))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert int(out["mojibake_fixed"].sum()) == 40
        for i in bad:
            assert out.loc[i, "text"] == base[i] + " café ‘x’"
        clean_idx = sorted(set(range(n)) - set(bad.tolist()))
        assert (out.loc[clean_idx, "text"].to_numpy()
                == np.array(base, dtype=object)[clean_idx]).all()
