#!/usr/bin/env python3
"""Build the CLUSTERED 100x embeddings fixture for the d17 SURVEY §4
row. Dev tooling only (make_scale_corpus.py's sibling) — the engine
never depends on this.

The uniform 100x fixture (make_scale_corpus.py) is d17's documented
WORST case: near-orthogonal vectors admit every cell, so the §4 row
measured there (643 s) prices the bound's overhead, not its win. Real
corpora are clustered — this fixture reproduces PipelineScaleSpec's
d17 geometry at 100x scale so the whale path's PRUNING win is a
measured number:

  * G=128 tight clusters (center + 0.05·gaussian noise per dim, the
    spec's exact member recipe);
  * benchmark rows (vec_id % 13 == 7 — d16/d17's registered split)
    are steered into the FIRST G/2 clusters only, so half the corpus
    lives in benchmark-free clusters a correct admission bound must
    reject at the CELL level;
  * deterministic throughout (fixed seed, hash-assigned clusters).

Usage: python3 scripts/make_clustered_embeddings.py /tmp/scale100c [n=200000]
Then:  scripts/run_main.sh graft.D17Probe /tmp/scale100c
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(out: str, n: int = 200000) -> None:
    import os
    os.makedirs(out, exist_ok=True)
    G, dim = 128, 64
    rng = np.random.default_rng(2026)
    centers = rng.standard_normal((G, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    h = (ids * 2654435761) % (2 ** 32)
    is_bench = (ids % 13) == 7
    cl = np.where(is_bench, h % (G // 2), h % G).astype(np.int64)
    vecs = centers[cl] + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array((cl % 3).astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"wrote {out}/embeddings.parquet: n={n} G={G} dim={dim} "
          f"bench={int(is_bench.sum())} (clusters 0..{G // 2 - 1} only)")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 200000)
