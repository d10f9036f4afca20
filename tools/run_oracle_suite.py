"""Replicate the driver's CORRECTNESS gate locally: run every `queries()`
entry from `__ray_entry__` against a testdata dir and, where an
`oracle_sql()` entry exists, compare to DuckDB with the same
sorted-columns / sorted-rows semantics the driver hashes.

Usage:
    python tools/run_oracle_suite.py [sf_dir] [--first N] [--only name,...]

Defaults to /root/testdata/sf0.01 (the driver's gate scale) and the full
query dict. `--first 50` replicates the driver's fixed window. Prints one
line per query and a summary; exit code 1 if anything failed.
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    import ray

    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    first = None
    only = None
    i = 0
    while i < len(args):
        if args[i] == "--first":
            first = int(args[i + 1]); i += 2
        elif args[i] == "--only":
            only = set(args[i + 1].split(",")); i += 2
        else:
            sf_dir = args[i]; i += 1

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as e
    from entry_parity import compare, oracle_connection, to_pandas

    qs = e.queries()
    oracles = e.oracle_sql()
    names = list(qs)
    if first is not None:
        names = names[:first]
    if only:
        names = [n for n in names if n in only]

    con = oracle_connection(sf_dir)
    passed, rows_only, failed = [], [], []
    for name in names:
        t0 = time.perf_counter()
        try:
            res = qs[name](sf_dir)
            if name in oracles:
                compare(res, con, oracles[name])
                status = "OK(oracle)"
                passed.append(name)
            else:
                n = len(to_pandas(res))
                status = f"OK(rows={n})"
                rows_only.append(name)
        except Exception as ex:
            status = f"FAIL {type(ex).__name__}: {str(ex)[:200]}"
            failed.append(name)
            traceback.print_exc()
        print(f"{time.perf_counter() - t0:7.2f}s  {name:40s} {status}",
              flush=True)

    print(f"\n{len(passed)} oracle-exact OK, {len(rows_only)} rows-only OK, "
          f"{len(failed)} FAILED over {len(names)} queries at {sf_dir}")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
