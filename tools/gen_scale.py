"""Deterministic 10× scale-up of an sf dir — the input for the scaling
probe (bench.py --scaling): sfN × 10 with the SAME schema and join graph,
written under .scaledata/ (gitignored).

Scaling strategy per table (copy k = 0..9, copy 0 is the original):
  * fact/dim keys are offset by k × (max_key + 1), consistently across
    tables (orderkey in orders+lineitem, partkey in part+lineitem,
    suppkey in supplier+lineitem, custkey in customer+orders, user_id and
    event_id in events) — so join fan-outs and group counts grow ~10×
    like real data growth, instead of 10 rows piling onto every key.
  * documents: doc_id offset; a copy-specific token is interleaved every
    3 words, so EVERY 3-gram shingle of a copy contains a copy token and
    cross-copy Jaccard ≈ 0 — replication must not fabricate near-dup
    clusters that would distort dedup scaling (a 10-member duplicate
    cluster per doc is not what +10× organic data looks like).
  * embeddings: vec_id offset; each copy's vector is rotated k dims
    (norm-preserving, decorrelates LSH buckets across copies).

Run: python tools/gen_scale.py [src_sf_dir] [out_dir] [factor] [events_mode]
events_mode: "keys" (default, denser days) or "ts" (calendar grows too)
Defaults: /root/testdata/sf0.1 .scaledata/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, t: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(src, f"{t}.parquet")).to_pandas()


def _write(df: pd.DataFrame, out: str, t: str, schema: pa.Schema | None = None) -> None:
    tbl = pa.Table.from_pandas(df, preserve_index=False, schema=schema)
    pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))


def _offset(series: pd.Series, k: int) -> pd.Series:
    return series + k * (int(series.max()) + 1)


def scale_tpch(src: str, out: str, factor: int) -> None:
    orders = _read(src, "orders")
    lineitem = _read(src, "lineitem")
    customer = _read(src, "customer")
    part = _read(src, "part")
    supplier = _read(src, "supplier")

    max_ok = int(orders["o_orderkey"].max()) + 1
    max_pk = int(part["p_partkey"].max()) + 1
    max_sk = int(supplier["s_suppkey"].max()) + 1
    max_ck = int(customer["c_custkey"].max()) + 1

    def copy_orders(k):
        d = orders.copy()
        d["o_orderkey"] += k * max_ok
        d["o_custkey"] += k * max_ck
        return d

    def copy_lineitem(k):
        d = lineitem.copy()
        d["l_orderkey"] += k * max_ok
        d["l_partkey"] += k * max_pk
        d["l_suppkey"] += k * max_sk
        return d

    def copy_customer(k):
        d = customer.copy()
        d["c_custkey"] += k * max_ck
        return d

    def copy_part(k):
        d = part.copy()
        d["p_partkey"] += k * max_pk
        return d

    def copy_supplier(k):
        d = supplier.copy()
        d["s_suppkey"] += k * max_sk
        return d

    for name, fn in [
        ("orders", copy_orders),
        ("lineitem", copy_lineitem),
        ("customer", copy_customer),
        ("part", copy_part),
        ("supplier", copy_supplier),
    ]:
        sch = pq.read_schema(os.path.join(src, f"{name}.parquet"))
        _write(pd.concat([fn(k) for k in range(factor)], ignore_index=True), out, name, sch)

    for name in ("nation", "region"):
        sch = pq.read_schema(os.path.join(src, f"{name}.parquet"))
        _write(_read(src, name), out, name, sch)


def scale_events(src: str, out: str, factor: int, ts_offset: bool = False) -> None:
    """Key-offset copies by default (denser days — per-day volume grows
    with the factor, the ingest-burst regime). With ts_offset=True each
    copy is ALSO shifted forward by the full time range plus one day, so
    the CALENDAR grows linearly like organic history — the regime that
    actually stresses time-keyed state (attribution lookbacks, daily
    PSI state, dow baselines, OHLC day counts). Both regimes are real;
    the probe runner picks per question (PERF.md r9)."""
    ev = _read(src, "events")
    max_eid = int(ev["event_id"].max()) + 1
    max_uid = int(ev["user_id"].max()) + 1
    span = ev["ts"].max() - ev["ts"].min()
    import pandas as _pd

    day = _pd.Timedelta(days=1)
    parts = []
    for k in range(factor):
        d = ev.copy()
        d["event_id"] += k * max_eid
        d["user_id"] += k * max_uid
        if ts_offset:
            d["ts"] = d["ts"] + k * (span + day)
        parts.append(d)
    sch = pq.read_schema(os.path.join(src, "events.parquet"))
    _write(pd.concat(parts, ignore_index=True), out, "events", sch)


def scale_documents(src: str, out: str, factor: int) -> None:
    docs = _read(src, "documents")
    max_did = int(docs["doc_id"].max()) + 1
    parts = [docs]
    for k in range(1, factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * max_did
        tok = f"zq{k}x"  # copy token: letters+digit, no PII/lang collision

        def interleave(text: str, tok: str = tok) -> str:
            ws = text.split()
            outw = []
            for i, w in enumerate(ws):
                outw.append(w)
                if i % 3 == 2:
                    outw.append(f"{tok}{i}")
            return " ".join(outw)

        d["text"] = d["text"].map(interleave)
        d["n_chars"] = d["text"].str.len()
        parts.append(d)
    sch = pq.read_schema(os.path.join(src, "documents.parquet"))
    _write(pd.concat(parts, ignore_index=True), out, "documents", sch)


def gen_dup_heavy_documents(src: str, out: str, factor: int) -> None:
    """Duplicate-HEAVY documents variant (VERDICT r5 #5): every copy k ≥ 1
    is a NEAR-DUPLICATE of the original (one word in ~30 swapped for a
    copy token), so the corpus is (factor-1)/factor near-dups in clusters
    of size `factor`. This is the regime LSH exists for — candidate-pair
    volume grows ~C(factor, 2) per cluster, i.e. quadratically in dup
    density at fixed cluster count — and is exactly the distribution the
    uniform scale probe (scale_documents above) deliberately avoids.
    Only documents.parquet is written; the dup probe needs nothing else."""
    os.makedirs(out, exist_ok=True)
    docs = _read(src, "documents")
    max_did = int(docs["doc_id"].max()) + 1
    parts = [docs]
    for k in range(1, factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * max_did
        tok = f"dz{k}q"

        def mutate(text: str, tok: str = tok) -> str:
            ws = text.split()
            for i in range(14, len(ws), 30):
                ws[i] = tok
            return " ".join(ws)

        d["text"] = d["text"].map(mutate)
        d["n_chars"] = d["text"].str.len()
        parts.append(d)
    sch = pq.read_schema(os.path.join(src, "documents.parquet"))
    _write(pd.concat(parts, ignore_index=True), out, "documents", sch)


def gen_dup_heavy_embeddings(
    src: str, out: str, factor: int, base_n: int = 500
) -> None:
    """Duplicate-HEAVY embeddings twin of :func:`gen_dup_heavy_documents`:
    every copy k ≥ 1 is a NEAR-DUPLICATE of a base vector — the base
    vector plus a deterministic small perturbation, renormalized, so
    cosine(base, copy) ≈ 0.999 (far above any dedup threshold) and the
    corpus forms clusters of size `factor`.

    The base is the FIRST `base_n` vectors, not the whole table: at the
    fixed 64-bucket LSH geometry the probe exercises, candidate volume
    is ~n²/buckets, so a full-table f=16 copy would measure bucket
    saturation instead of the C(f,2) cluster model the probe pins.
    Cluster growth is the same either way; the subsample keeps f=16
    tractable inside the bench budget."""
    os.makedirs(out, exist_ok=True)
    emb = _read(src, "embeddings").head(base_n).reset_index(drop=True)
    max_vid = int(emb["vec_id"].max()) + 1
    dim = len(emb["embedding"].iloc[0])
    rng = np.random.default_rng(8151)  # frozen seed: probe must be stable
    parts = [emb]
    for k in range(1, factor):
        d = emb.copy()
        d["vec_id"] = d["vec_id"] + k * max_vid
        noise = rng.standard_normal((len(d), dim)).astype(np.float32) * 0.02
        vecs = np.stack(d["embedding"].to_numpy())  # (n, dim) float32
        vecs = vecs + noise
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        d["embedding"] = list(vecs)
        parts.append(d)
    sch = pq.read_schema(os.path.join(src, "embeddings.parquet"))
    _write(pd.concat(parts, ignore_index=True), out, "embeddings", sch)


def scale_embeddings(src: str, out: str, factor: int) -> None:
    emb = _read(src, "embeddings")
    max_vid = int(emb["vec_id"].max()) + 1
    parts = [emb]
    for k in range(1, factor):
        d = emb.copy()
        d["vec_id"] = d["vec_id"] + k * max_vid
        d["embedding"] = d["embedding"].map(lambda v, k=k: np.roll(np.asarray(v), k))
        parts.append(d)
    sch = pq.read_schema(os.path.join(src, "embeddings.parquet"))
    _write(pd.concat(parts, ignore_index=True), out, "embeddings", sch)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--dup-heavy"]
    dup_heavy = "--dup-heavy" in sys.argv[1:]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else ".scaledata/sf1"
    factor = int(argv[2]) if len(argv) > 2 else 10
    events_mode = argv[3] if len(argv) > 3 else "keys"
    if dup_heavy:
        gen_dup_heavy_documents(src, out, factor)
        gen_dup_heavy_embeddings(src, out, factor)
        for t in sorted(os.listdir(out)):
            print(t, pq.ParquetFile(os.path.join(out, t)).metadata.num_rows)
        return 0
    os.makedirs(out, exist_ok=True)
    scale_tpch(src, out, factor)
    scale_events(src, out, factor, ts_offset=(events_mode == "ts"))
    scale_documents(src, out, factor)
    scale_embeddings(src, out, factor)
    for t in sorted(os.listdir(out)):
        print(t, pq.ParquetFile(os.path.join(out, t)).metadata.num_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
