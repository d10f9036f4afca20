"""Deterministically synthesize a scaled copy of the driver testdata.

Usage: python tools/make_scaled_testdata.py [--factor 10] [--src
/root/testdata/sf0.1] [--out /tmp/sf1]

Purpose: the driver ships sf0.001/0.01/0.1 only; the scale rehearsal
(VERDICT r4 item #5) needs a 10x corpus to surface super-linear paths the
sf0.1 bench cannot see (posting-list growth in exact_jaccard_pairs,
broadcast->keyed tier crossings in span/line dedup). Everything is
seed-deterministic and derived from the source tables' own distributions —
no external data.

Design per table (factor F):
* region / nation — dimension tables, copied unchanged (TPC-H keeps them
  fixed across scale factors).
* customer / supplier / part / orders / lineitem / events — replicated F
  times with key-shifted ids (`key + k * N`) so foreign-key degree
  distributions, skew and per-user orderings survive exactly; monetary
  values get a +/-1% deterministic jitter and event timestamps a +/-30 s
  jitter so replicas are not byte-identical.
* documents — regenerated from the source corpus' own unigram model
  (token frequencies + resampled real token counts + lang/source
  marginals), NOT replicated: replication would plant F-1 near-dup copies
  of every doc and blow up every dedup operator unrealistically. Exact
  duplicates are planted at the source rate.
* embeddings — regenerated from per-label mean/std of the source vectors
  (labels keep their marginals), same reasoning as documents.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _jitter(rng: np.random.Generator, values: np.ndarray,
            rel: float = 0.01) -> np.ndarray:
    return np.round(values * (1 + rng.uniform(-rel, rel, len(values))), 2)


def replicate_keyed(tbl: pa.Table, factor: int, key_shifts: dict[str, int],
                    money_cols: tuple[str, ...] = (),
                    ts_jitter_col: str | None = None,
                    seed: int = 0) -> pa.Table:
    """Stack `factor` key-shifted copies of `tbl` (copy 0 is unchanged)."""
    import pandas as pd

    base = tbl.to_pandas()
    parts = [base]
    for k in range(1, factor):
        rng = np.random.default_rng(seed * 1000 + k)
        rep = base.copy()
        for col, n in key_shifts.items():
            rep[col] = rep[col] + k * n
        for col in money_cols:
            rep[col] = _jitter(rng, rep[col].to_numpy())
        if ts_jitter_col is not None:
            us = rng.integers(-30_000_000, 30_000_000, len(rep))
            rep[ts_jitter_col] = (rep[ts_jitter_col]
                                  + pd.to_timedelta(us, unit="us"))
        parts.append(rep)
    return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                schema=tbl.schema, preserve_index=False)


def scaled_documents(src_dir: str, factor: int, seed: int = 7) -> pa.Table:
    src = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    df = src.to_pandas()
    tokens: list[str] = []
    lengths: list[int] = []
    for t in df.text:
        toks = (t or "").split()
        tokens.extend(toks)
        lengths.append(len(toks))
    vocab, freq = np.unique(np.asarray(tokens, dtype=object),
                            return_counts=True)
    probs = freq / freq.sum()
    n_out = len(df) * factor
    rng = np.random.default_rng(seed)
    out_len = rng.choice(np.asarray(lengths), size=n_out)
    flat = rng.choice(vocab, size=int(out_len.sum()), p=probs)
    offs = np.concatenate(([0], np.cumsum(out_len)))
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_out)]
    # plant exact duplicates at the source rate: sample DISJOINT target
    # and source rows (targets copy a snapshot of the sources, so no
    # planted pair can be destroyed by a later overwrite)
    n_dups = int(round((len(df) - df.text.nunique()) * factor))
    picks = rng.choice(n_out, size=2 * n_dups, replace=False)
    targets, sources = picks[:n_dups], picks[n_dups:]
    originals = [texts[int(i)] for i in sources]
    for i, t in zip(targets, originals):
        texts[int(i)] = t
    langs = rng.choice(df.lang.to_numpy(), size=n_out)
    sources = [f"src{i % df.source.nunique()}" for i in range(n_out)]
    return pa.table({
        "doc_id": pa.array(range(n_out), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }).cast(src.schema)


def scaled_embeddings(src_dir: str, factor: int, seed: int = 11) -> pa.Table:
    src = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    df = src.to_pandas()
    mat = np.stack(df.embedding.to_numpy())
    labels = df.label.to_numpy()
    rng = np.random.default_rng(seed)
    n_out = len(df) * factor
    out_labels = rng.choice(labels, size=n_out)
    vecs = np.empty((n_out, mat.shape[1]), dtype=mat.dtype)
    for lab in np.unique(labels):
        mu = mat[labels == lab].mean(axis=0)
        sd = mat[labels == lab].std(axis=0)
        sel = out_labels == lab
        vecs[sel] = mu + rng.standard_normal((int(sel.sum()), mat.shape[1])) * sd
    return pa.table({
        "vec_id": pa.array(range(n_out), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              src.schema.field("embedding").type),
        "label": pa.array(out_labels, src.schema.field("label").type),
    }).cast(src.schema)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    f = args.factor

    for name in ("region", "nation"):
        pq.write_table(pq.read_table(os.path.join(args.src, f"{name}.parquet")),
                       os.path.join(args.out, f"{name}.parquet"))

    sizes = {}
    for name, key in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
                      ("part", "p_partkey"), ("orders", "o_orderkey")):
        sizes[name] = pq.ParquetFile(
            os.path.join(args.src, f"{name}.parquet")).metadata.num_rows

    specs = {
        "customer": ({"c_custkey": sizes["customer"]}, ("c_acctbal",), None),
        "supplier": ({"s_suppkey": sizes["supplier"]}, ("s_acctbal",), None),
        "part": ({"p_partkey": sizes["part"]}, ("p_retailprice",), None),
        "orders": ({"o_orderkey": sizes["orders"],
                    "o_custkey": sizes["customer"]}, ("o_totalprice",), None),
        "lineitem": ({"l_orderkey": sizes["orders"],
                      "l_partkey": sizes["part"],
                      "l_suppkey": sizes["supplier"]},
                     ("l_extendedprice",), None),
        "events": ({"event_id": None, "user_id": None}, ("value",), "ts"),
    }
    for i, (name, (shifts, money, ts_col)) in enumerate(specs.items()):
        tbl = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        if name == "events":
            df = tbl.to_pandas()
            shifts = {"event_id": len(df),
                      "user_id": int(df.user_id.max()) + 1}
        out = replicate_keyed(tbl, f, shifts, money, ts_col, seed=i)
        pq.write_table(out, os.path.join(args.out, f"{name}.parquet"))
        print(name, out.num_rows)

    docs = scaled_documents(args.src, f)
    pq.write_table(docs, os.path.join(args.out, "documents.parquet"))
    print("documents", docs.num_rows)
    emb = scaled_embeddings(args.src, f)
    pq.write_table(emb, os.path.join(args.out, "embeddings.parquet"))
    print("embeddings", emb.num_rows)


if __name__ == "__main__":
    main()
