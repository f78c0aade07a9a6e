#!/usr/bin/env python
"""Generate sf1-scale fixtures for the HEAVY query families (round-3
verdict #7: "scale evidence one decade up").

The driver ships sf0.001/0.01/0.1 only, so the 10× decade above bench
scale is synthesized here — deterministically — into .scratch/sf1/
(gitignored; regenerate with `python tools/gen_sf1.py`):

* documents ×10 (50k):  replica 0 is the original corpus; replicas 1-9
  apply cheap deterministic text perturbations, so the near-duplicate
  cluster structure the similarity family feeds on GROWS with the data
  instead of being diluted away.
* embeddings ×10 (20k): per-replica component jitter keyed on
  hash(vec_id, replica, i) — labels keep their cluster geometry, pair
  counts grow quadratically in block size exactly as a real corpus
  would.
* events ×10 (1M):      each replica shifts time by 31 days and maps to
  fresh user_ids — stream growth widens the key space and extends the
  timeline, keeping per-hour density constant (the realistic shape for
  watermark/state scaling).

The TPC-H-ish tables are NOT scaled (hardlinked/copied from sf0.1) —
they only appear as small side inputs in the heavy-family queries.
tools/scale_probe.py picks up .scratch/sf1 automatically when present.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scratch", "sf1")

UNSCALED = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    con.execute(f"""
        COPY (
          SELECT r * 5000 + doc_id AS doc_id,
                 CASE
                   WHEN r = 0 THEN text
                   WHEN r % 3 = 1 THEN text || ' variant mark ' || r
                   WHEN r % 3 = 2 THEN replace(text, 'e', '3')
                                       || ' rev' || r
                   ELSE substr(text, 1, greatest(1, len(text) - r))
                 END AS text,
                 lang, source,
                 len(CASE
                   WHEN r = 0 THEN text
                   WHEN r % 3 = 1 THEN text || ' variant mark ' || r
                   WHEN r % 3 = 2 THEN replace(text, 'e', '3')
                                       || ' rev' || r
                   ELSE substr(text, 1, greatest(1, len(text) - r))
                 END) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet'), range(10) t(r)
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT parquet)
    """)

    con.execute(f"""
        COPY (
          SELECT r * 2000 + vec_id AS vec_id,
                 CASE WHEN r = 0 THEN embedding
                      ELSE list_transform(
                        list_zip(embedding,
                                 range(1, len(embedding) + 1)),
                        z -> CAST(z[1] AS FLOAT)
                             + CAST(CAST(hash(vec_id, r, z[2]) % 100 AS BIGINT)
                                    - 50 AS FLOAT) / 2000.0)
                 END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), range(10) t(r)
          ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT parquet)
    """)

    con.execute(f"""
        COPY (
          SELECT r * 100000 + event_id AS event_id,
                 ts + to_days(31 * r::INT) AS ts,
                 r * 1500 + user_id AS user_id,
                 event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'), range(10) t(r)
          ORDER BY event_id
        ) TO '{DST}/events.parquet' (FORMAT parquet)
    """)

    for t in UNSCALED:
        dst = f"{DST}/{t}.parquet"
        if os.path.exists(dst):
            os.unlink(dst)
        try:
            os.link(f"{SRC}/{t}.parquet", dst)
        except OSError:
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)

    for t in ["documents", "embeddings", "events"] + UNSCALED:
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
