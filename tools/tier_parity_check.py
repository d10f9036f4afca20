"""Force the keyed (large) tiers of the tiered dedup operators on real
data and pin exact parity against their broadcast tiers, with timings.

Usage: python tools/tier_parity_check.py [sf_dir]   (default /tmp/sf1;
generate it first with tools/make_scaled_testdata.py)

This is the scale-rehearsal companion to the unit tier-parity tests: the
unit tests prove both tiers agree on synthetic micro-corpora; this script
executes the keyed branches END-TO-END on a real multi-block corpus
(results recorded in BASELINE.md, round 5)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402


def main() -> None:
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data as rd

    from dataprof_ray.pipelines.dedup import (exact_jaccard_pairs,
                                              remove_duplicate_spans)
    from dataprof_ray.pipelines.linededup import line_dedup

    docs = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                           columns=["doc_id", "text"])

    def collect(ds, keys=("doc_id",)):
        df = ds if isinstance(ds, pd.DataFrame) else ds.to_pandas()
        return df.sort_values(list(keys)).reset_index(drop=True)

    t0 = time.perf_counter()
    a = collect(remove_duplicate_spans(docs, n=13))
    t1 = time.perf_counter()
    b = collect(remove_duplicate_spans(docs, n=13, broadcast_limit=0))
    t2 = time.perf_counter()
    pd.testing.assert_frame_equal(a, b)
    print(f"span_dedup {sf}: broadcast {t1-t0:.1f}s keyed {t2-t1:.1f}s "
          f"rows {len(a)} removed_tokens {int(a.n_removed.sum())} PARITY OK")

    t0 = time.perf_counter()
    a = collect(line_dedup(docs))
    t1 = time.perf_counter()
    b = collect(line_dedup(docs, broadcast_limit=0))
    t2 = time.perf_counter()
    pd.testing.assert_frame_equal(a, b)
    print(f"line_dedup {sf}: broadcast {t1-t0:.1f}s keyed {t2-t1:.1f}s "
          f"rows {len(a)} PARITY OK")

    t0 = time.perf_counter()
    a = collect(exact_jaccard_pairs(docs), keys=("id_a", "id_b"))
    t1 = time.perf_counter()
    b = collect(exact_jaccard_pairs(docs, size_broadcast_limit=0),
                keys=("id_a", "id_b"))
    t2 = time.perf_counter()
    pd.testing.assert_frame_equal(a, b)
    print(f"exact_jaccard {sf}: size-broadcast {t1-t0:.1f}s "
          f"size-join {t2-t1:.1f}s pairs {len(a)} PARITY OK")

    ray.shutdown()


if __name__ == "__main__":
    main()
